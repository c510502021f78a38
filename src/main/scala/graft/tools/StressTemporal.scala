package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.api.GraftOps

/** Scale-linearity harness for the round-16 temporal/recurrence family
  * — [[graft.api.GraftOps.ewma]], [[graft.api.GraftOps.cusum]],
  * [[graft.api.GraftOps.timeWeightedAvg]], and
  * [[graft.api.GraftOps.topPaths]] all share the ONE-shuffle-on-key +
  * per-key-fold shape whose scale contract is "rows/key stays bounded,
  * keys scale out": this harness grows BOTH axes a rung at a time
  * (rows ×4 with keys ×4, constant 100 events/key) so a superlinear
  * bend would expose any hidden all-history or all-pairs cost, the
  * StressSpans methodology applied to the recurrence operators.
  *
  * Events are synthesized from `spark.range` (integer-derived values
  * and timestamps — deterministic, no storage, no Random). Usage:
  * sbt "runMain graft.tools.StressTemporal [rows,rows,...]"
  * (default 1,4,16 million). One JSON line per rung.
  */
object StressTemporal {

  def main(args: Array[String]): Unit = {
    val rungs = args.headOption
      .map(_.split(',').toIndexedSeq.map(_.toLong))
      .getOrElse(IndexedSeq(1000000L, 4000000L, 16000000L))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.local(cpus, "graft-stress-temporal")
    spark.sparkContext.setLogLevel("WARN")

    rungs.foreach { n =>
      val keys = n / 100 // constant 100 events/key — keys scale out
      val ev = spark.range(n).repartition(cpus * 2)
        .select(
          pmod(col("id"), lit(keys)).as("k"),
          // distinct per-key micros: position * 1h + jitter
          timestamp_micros(expr(s"id div ${keys}L") * 3600000000L +
            pmod(col("id") * 131, lit(997))).as("ts"),
          col("id").as("tb"),
          pmod(col("id") * 31, lit(10007)).as("x"),
          concat(lit("s"), pmod(col("id") * 7, lit(5))).as("st"))
        .cache()
      ev.count() // materialize: timings below are operator-only

      def time(f: => Long): (Long, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      val (ne, te) = time(GraftOps.ewma(ev, col("k"), col("ts"),
        col("x"), col("tb"), 300000L).count())
      val (nc, tc) = time(GraftOps.cusum(ev, col("k"), col("ts"),
        col("x"), col("tb"), 5000L, 1000L, 15000L).count())
      val (nw, tw) = time(GraftOps.timeWeightedAvg(ev, col("k"),
        col("ts"), col("x"), col("tb")).count())
      val (np, tp) = time(GraftOps.topPaths(ev, col("k"), col("ts"),
        col("st"), col("tb"), maxSteps = 5, topK = 20).count())
      println(s"""{"rows":$n,"keys":$keys,"ewma_s":${f"$te%.1f"},""" +
        s""""cusum_s":${f"$tc%.1f"},"twap_s":${f"$tw%.1f"},""" +
        s""""paths_s":${f"$tp%.1f"},"out":[$ne,$nc,$nw,$np]}""")
      ev.unpersist()
    }
    spark.stop()
  }
}
