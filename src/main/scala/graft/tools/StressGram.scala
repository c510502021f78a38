package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.api.GraftOps

/** Scale harness for the round-19 Gram/PCA model-stat family —
  * [[graft.api.GraftOps.gramSummaryRows]] / [[graft.api.GraftOps.pcaFit]]
  * and the S31 merge law at VOLUME: the sf1 embeddings fixture is only
  * 8k rows, so this demonstrates the family's two scale contracts on
  * synthetic corpora a rung at a time (default 1M → 4M rows of 32-dim
  * vectors, the StressTemporal methodology):
  *
  *  1. ONE-pass cost: the typed-Aggregator summary is a single
  *     map-side-combined agg whose output is model-sized (1 + dim +
  *     dim(dim+1)/2 rows) regardless of corpus rows — wall-clock per
  *     rung should scale ~linearly with rows, never with dim² × rows
  *     shuffled.
  *  2. The S31 merge law at scale: summing per-shard summaries (the
  *     append-log read path, 8 shards here) is BIT-EQUAL to the
  *     single-pass summary, and `pcaFitFromSummary` over the merged
  *     rows is BIT-EQUAL to `pcaFit` over the raw corpus — the exact
  *     "shard-and-fold" posture the GramAgg scaladoc promises (unit-
  *     scale components keep every cell within the Long exactness
  *     bound to ~9M rows; rungs stay under it by design).
  *
  * Vectors are hash-derived (no RNG, no storage). Usage:
  * sbt "runMain graft.tools.StressGram [rows,rows,...] [dim]"
  * One JSON line per rung; nonzero exit on any law violation.
  */
object StressGram {

  def main(args: Array[String]): Unit = {
    val rungs = args.headOption
      .map(_.split(',').toIndexedSeq.map(_.toLong))
      .getOrElse(IndexedSeq(1000000L, 4000000L))
    val dim = args.lift(1).map(_.toInt).getOrElse(32)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.local(cpus, "graft-stress-gram")
    spark.sparkContext.setLogLevel("WARN")

    rungs.foreach { n =>
      // unit-scale components in [-0.5, 0.5): cells stay exact to ~9M rows
      val df = spark.range(n).repartition(cpus * 2)
        .select(col("id"),
          transform(sequence(lit(0), lit(dim - 1)),
            i => ((pmod(xxhash64(col("id"), i), lit(1000)) - lit(500))
              .cast("double") / 1000.0).cast("float")).as("vec"))
        .cache()
      df.count() // materialize: timings below are operator-only

      def time[A](f: => A): (A, Double) = {
        val t0 = System.nanoTime(); val r = f
        (r, (System.nanoTime() - t0) / 1e9)
      }
      // 1. one-pass summary cost at volume
      val (whole, tSum) = time(
        GraftOps.gramSummaryRows(df, col("vec"), dim).collect()
          .map(r => (r.getInt(0), r.getLong(1))).toMap)
      // 2a. S31 merge law: 8 hash shards, summaries summed idx-wise
      val shards = 8
      val (merged, tShard) = time {
        val per = (0 until shards).map(s =>
          GraftOps.gramSummaryRows(
            df.filter(pmod(col("id"), lit(shards)) === s), col("vec"), dim))
        per.reduce(_ union _)
          .groupBy(col("idx")).agg(sum(col("v")).as("v")).collect()
          .map(r => (r.getInt(0), r.getLong(1))).toMap
      }
      val lawOk = merged == whole
      // 2b. model face: fit from the merged summary == fit from raw rows
      import spark.implicits._
      val mergedDf = merged.toSeq.sortBy(_._1).toDF("idx", "v")
      val mFromSummary = GraftOps.pcaFitFromSummary(mergedDf, dim, 4)
        .collect().map(_.toSeq).toSeq
      val mFromRows = GraftOps.pcaFit(df, col("vec"), dim, 4)
        .collect().map(_.toSeq).toSeq
      val fitOk = mFromSummary == mFromRows
      println(f"""{"rows":$n,"dim":$dim,"summary_rows":${whole.size},"sum_s":$tSum%.2f,"shard8_s":$tShard%.2f,"merge_law_bit_equal":$lawOk,"fit_from_summary_bit_equal":$fitOk}""")
      df.unpersist()
      if (!lawOk || !fitOk) { spark.stop(); sys.exit(1) }
    }
    spark.stop()
  }
}
