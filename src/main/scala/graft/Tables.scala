package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Catalog of the TESTDATA tables (TESTDATA.md).
  *
  * One quirk: `events.parquet` stores `ts` as parquet TIMESTAMP(NANOS), which
  * Spark's type system doesn't have. With
  * `spark.sql.legacy.parquet.nanosAsLong=true` the column arrives as a raw
  * nanosecond count; we convert to a microsecond timestamp exactly the way
  * DuckDB does when it reads the same file (truncation toward zero — all our
  * data is post-epoch so integer division is truncation).
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" && df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      df.withColumn("ts", timestamp_micros(col("ts") / lit(1000L) cast "long"))
    else df
  }

  /** Register every table as a temp view (for the spark.sql surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
