package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** `Dataset.localCheckpoint` truncates the logical plan but PRESERVES the
  * origin plan's `Statistics` on the new `LogicalRDD` leaf. For iterative
  * algorithms that checkpoint every round (graft's `dedupClusters`), that
  * is a time bomb: size-only join estimation multiplies child sizes, so
  * the leaf's BigInt size estimate compounds ~4× in EXPONENT per round —
  * by round ~12 a single stats computation is minutes of
  * `BigInteger.multiply` on numbers with millions of digits, burning the
  * driver while executors idle.
  *
  * This helper rebuilds a DataFrame on the SAME physical RDD (no job, no
  * row conversion — `queryExecution.toRdd` is the already-checkpointed
  * InternalRow RDD) with a fresh leaf carrying no inherited statistics,
  * so per-round plans always estimate from `defaultSizeInBytes` and stats
  * stay O(1)-sized forever. Lives in the sql package tree because
  * `internalCreateDataFrame` is `private[sql]` — same pattern as
  * [[ColumnBridge]].
  */
object StatsBridge {
  def dropInheritedStats(df: DataFrame): DataFrame = {
    val ds = df.asInstanceOf[Dataset[org.apache.spark.sql.Row]]
    val spark = ds.sparkSession.asInstanceOf[SparkSession]
    spark.internalCreateDataFrame(ds.queryExecution.toRdd, ds.schema)
  }
}
