package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.api.GraftOps

/** Scale-stress harness for [[graft.api.GraftOps.dedupClusters]]: resolves
  * connected components on synthetic graphs ~1000× the sf0.1 q40 pair
  * count, including the adversarial deep-chain shape. Exercises exactly
  * the three failure modes round 5 fixed — O(diameter) rounds (pointer
  * jumping), plan-tree growth (per-round localCheckpoint), and stats
  * blowup (StatsBridge) — at a size where any of them would hang or OOM.
  *
  * Usage: sbt "runMain graft.tools.StressClusters [nVertices] [nEdges]"
  * (defaults 2,000,000 vertices / 3,000,000 random edges + one
  * 100,000-vertex chain). Prints one JSON line with timings.
  */
object StressClusters {
  def main(args: Array[String]): Unit = {
    val nV = args.headOption.map(_.toLong).getOrElse(2000000L)
    val nE = args.drop(1).headOption.map(_.toLong).getOrElse(3000000L)
    val chain = 100000L
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, "graft-stress")
    spark.sparkContext.setLogLevel("WARN")

    // random graph: endpoints from a deterministic hash of the edge index
    // (no Random — reproducible); plus a long path graph appended in a
    // disjoint id range to force the O(log diameter) regime.
    val rand = spark.range(nE).select(
      pmod(graft.functions.Portable.phash(concat(lit("a|"), col("id"))), lit(nV)).as("a"),
      pmod(graft.functions.Portable.phash(concat(lit("b|"), col("id"))), lit(nV)).as("b"))
    val path = spark.range(chain - 1).select(
      (col("id") + nV).as("a"), (col("id") + nV + 1).as("b"))
    val edges = rand.union(path)

    val t0 = System.nanoTime()
    // driverLimit = 0 pins the distributed pointer-jumping loop — this
    // harness exists to stress it (the edge count exceeds the default
    // routing threshold anyway, but the pin keeps that true under any
    // future default).
    val clusters = GraftOps.dedupClusters(edges, col("a"), col("b"),
      driverLimit = 0)
    val resolved = System.nanoTime()
    val stats = clusters.agg(
      count(lit(1)).as("members"),
      countDistinct(col("survivor")).as("components")).collect()(0)
    // the appended chain must resolve to ONE component labeled nV
    val chainOk = clusters.filter(col("member") >= nV)
      .agg(countDistinct(col("survivor")).as("s"), min(col("survivor")).as("m"))
      .collect()(0)
    val done = System.nanoTime()
    println(f"""{"metric":"stress_clusters","vertices":${stats.getLong(0)},"components":${stats.getLong(1)},"chain_one_component":${chainOk.getLong(0) == 1 && chainOk.getLong(1) == nV},"resolve_sec":${(resolved - t0) / 1e9}%.1f,"total_sec":${(done - t0) / 1e9}%.1f,"edges":${nE + chain - 1}}""")
    spark.stop()
  }
}
