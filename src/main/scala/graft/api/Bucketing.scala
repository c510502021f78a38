package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers — the shuffle-elimination half of the 100 TB
  * posture: a fact table written bucketed+sorted on its join key joins
  * any same-bucketed table with NO exchange on either side (the bucketed
  * scan already satisfies the join's required distribution), turning the
  * per-query shuffle of a hot join into a one-time layout cost at write
  * time. On a real cluster this is the difference between re-shuffling
  * 100 TB per query and never shuffling it again.
  *
  * Bucket counts must match on both sides (Spark joins bucketed tables
  * shuffle-free only for equal bucket counts; use a multiple otherwise
  * and Spark 3.1+ can still coalesce). Pick ~(total data / 128 MB)
  * buckets at the target scale.
  */
object Bucketing {

  /** Write `df` as a bucketed, in-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — produces the
    * exchange-free sort-merge plan when layouts line up. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
