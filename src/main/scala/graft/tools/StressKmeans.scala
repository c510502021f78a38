package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.api.GraftOps
import graft.functions.Portable

/** Scale-stress harness for the k-means trainer: `nVecs` synthetic
  * 16-dim vectors (hash-derived around `k` planted anchor directions —
  * deterministic, no Random, no files) through `iters` Lloyd rounds at
  * `k` centroids, then one [[GraftOps.kmeansAssign]] inference pass.
  * The per-round shape under test is the 100 TB one: a narrow argmax-dot
  * projection against the baked k·dim model plus one map-side-combined
  * (cluster, dim) agg — wall-clock here must scale with input size ×
  * rounds, never with a corpus × k join. Prints one JSON line.
  *
  * Usage: sbt "runMain graft.tools.StressKmeans [nVecs] [k] [iters]"
  * (default 2,000,000 vectors, k=64, 3 rounds).
  */
object StressKmeans {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(2000000L)
    val k = args.lift(1).map(_.toInt).getOrElse(64)
    val iters = args.lift(2).map(_.toInt).getOrElse(3)
    val dim = 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.local(cpus, "graft-stress-km")
    spark.sparkContext.setLogLevel("WARN")

    // Each vector = anchor(id % k) + small hash jitter, all hash-derived
    // inside one transform() lambda: clustered enough that rounds move
    // centroids, deterministic enough that two runs are identical.
    val built = spark.range(nVecs).repartition(cpus * 2)
      .select(col("id"), transform(sequence(lit(0), lit(dim - 1)), d =>
        ((pmod(Portable.fastHash(pmod(col("id"), lit(k.toLong)), d), lit(2000L))
          .cast("double") / 1000.0 - 1.0) +
        (pmod(Portable.fastHash(col("id"), d, lit(7)), lit(200L))
          .cast("double") / 1000.0 - 0.1)).cast("float")).as("emb"))

    val t0 = System.nanoTime()
    val model = GraftOps.kmeansFit(built, col("id"), col("emb"), k, iters)
    val mRows = model.count()
    val tFit = System.nanoTime()
    val tagged = GraftOps.kmeansAssign(built, col("emb"), model)
    val out = tagged.agg(count(lit(1)).as("rows"),
      countDistinct(col("cluster")).as("clusters")).collect()(0)
    val tAsg = System.nanoTime()
    println(f"""{"metric":"stress_kmeans","n_vecs":$nVecs,"k":$k,"iters":$iters,"model_rows":$mRows,"assigned_rows":${out.getLong(0)},"clusters_used":${out.getLong(1)},"fit_sec":${(tFit - t0) / 1e9}%.1f,"assign_sec":${(tAsg - tFit) / 1e9}%.1f}""")
    spark.stop()
  }
}
