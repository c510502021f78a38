package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.api.GraftOps

/** Measures the baked-model assignment cliff that motivates
  * [[graft.api.GraftOps.kmeansAssignJoin]]: `kmeansAssign` bakes k·dim
  * doubles into the plan as codegen reference constants — ideal while the
  * model is a trained-model constant (k ≤ 64 coarse cells, 16/subspace PQ),
  * linear plan/task-binary bloat once k ≫ 10⁴. The join tier ships the
  * same model as ONE broadcast row instead. Both paths are spec-asserted
  * bit-equal (GraftOpsSpec); this harness shows WHERE each one wins.
  *
  * The corpus and the model are synthesized from `spark.range` (integer-
  * derived floats — deterministic, no storage, no Random), so the run
  * isolates assignment cost: per-row argmax over k cells × dim dims on
  * both paths, differing only in how the model reaches the executors.
  * The model is built directly as a (cluster, dim, centroid, n) table —
  * training cost is kmeansFit's business, not this harness's.
  *
  * Usage: sbt "runMain graft.tools.StressKmeans [nRows] [k,k,k...]"
  * (defaults 2,000,000 rows; k = 64,1024,10240). Prints one JSON line per
  * configuration with both wall times and the baked plan's constant size.
  */
object StressKmeans {
  private val DIM = 64

  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(2000000L)
    val ks = args.drop(1).headOption.map(_.split(',').toIndexedSeq.map(_.toInt))
      .getOrElse(IndexedSeq(64, 1024, 10240))
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, "graft-stress-km")
    spark.sparkContext.setLogLevel("WARN")

    val corpus = spark.range(nRows).repartition(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt * 2)
      .select(col("id"),
        transform(sequence(lit(0), lit(DIM - 1)),
          d => (pmod(col("id") * 31 + d, lit(97)).cast("double") / 97.0)
            .cast("float")).as("v"))
      .cache()
    corpus.count() // materialize: timings below are assignment-only

    ks.foreach { k =>
      // model as data: (cluster, dim, centroid, n), integer-derived
      val model = spark.range(k).select(col("id").cast("int").as("cluster"))
        .crossJoin(spark.range(DIM).select(col("id").cast("int").as("dim")))
        .select(col("cluster"), col("dim"),
          (pmod(col("cluster") * 17 + col("dim"), lit(101)).cast("double") / 101.0)
            .as("centroid"), lit(1L).as("n"))
        .cache()
      model.count()
      def time(f: => Long): (Long, Double) = {
        val t0 = System.nanoTime()
        val n = f
        (n, (System.nanoTime() - t0) / 1e9)
      }
      // count(cluster) forces full evaluation of the assignment column
      val (nb, baked) = time(
        GraftOps.kmeansAssign(corpus, col("v"), model).agg(count(col("cluster")))
          .collect()(0).getLong(0))
      val (nj, joined) = time(
        GraftOps.kmeansAssignJoin(corpus, col("v"), model).agg(count(col("cluster")))
          .collect()(0).getLong(0))
      require(nb == nRows && nj == nRows, s"assignment lost rows: $nb/$nj")
      // the baked path's plan constant: k*dim doubles (what bloats task
      // binaries — the join tier's broadcast carries the same bytes ONCE)
      val constBytes = k.toLong * DIM * 8
      println(s"""{"k":$k,"dim":$DIM,"rows":$nRows,"baked_sec":${f"$baked%.1f"},""" +
        s""""join_sec":${f"$joined%.1f"},"baked_plan_const_mb":${f"${constBytes / 1e6}%.2f"}}""")
      model.unpersist()
    }
    spark.stop()
  }
}
