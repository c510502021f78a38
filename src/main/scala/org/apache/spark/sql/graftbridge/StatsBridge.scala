package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.plans.logical.Statistics
import org.apache.spark.sql.classic.{Dataset, SparkSession}
import org.apache.spark.sql.execution.LogicalRDD

/** `Dataset.localCheckpoint` truncates the logical plan but PRESERVES the
  * origin plan's `Statistics` on the new `LogicalRDD` leaf. For iterative
  * algorithms that checkpoint every round (graft's `dedupClusters`), that
  * is a time bomb: size-only join estimation multiplies child sizes, so
  * the leaf's BigInt size estimate compounds ~4× in EXPONENT per round —
  * by round ~12 a single stats computation is minutes of
  * `BigInteger.multiply` on numbers with millions of digits, burning the
  * driver while executors idle.
  *
  * Dropping the stats entirely is no better: the leaf then defaults to
  * `defaultSizeInBytes` (Long.MaxValue), which disables every static
  * broadcast in the round joins and measurably slows convergence-sized
  * graphs. So [[withStats]] replaces the leaf's inherited statistics with
  * an HONEST caller-supplied estimate (row count × row width — the
  * iterating caller knows both), keeping stats O(1)-sized forever while
  * letting genuinely small label tables broadcast. No job, no row
  * conversion: the same checkpointed InternalRow RDD backs the new leaf.
  * Lives in the sql package tree because `LogicalRDD` /
  * `Dataset.ofRows` are `private[sql]` — same pattern as [[ColumnBridge]].
  */
object StatsBridge {
  def withStats(df: DataFrame, sizeInBytes: BigInt,
      rowCount: Option[BigInt]): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    val spark = ds.sparkSession.asInstanceOf[SparkSession]
    ds.queryExecution.analyzed match {
      case lr: LogicalRDD =>
        val stats = Statistics(sizeInBytes = sizeInBytes, rowCount = rowCount)
        Dataset.ofRows(spark,
          LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
            lr.outputOrdering, lr.isStreaming, lr.stream)(
            spark, Some(stats), None))
      case _ => df // not a checkpointed leaf; nothing to rewrite
    }
  }
}
