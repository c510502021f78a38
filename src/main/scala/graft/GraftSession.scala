package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults chosen for the 100 TB posture (SURVEY.md §4): AQE on (runtime
  * partition coalescing, skew-join splitting, dynamic join-strategy switch),
  * UTC session time zone (deterministic timestamp semantics vs the DuckDB
  * oracle), and a shuffle-partition count sized for the local[32] test rig —
  * on a real cluster this is the one knob operators must re-size to
  * ~2-3× total executor cores.
  */
object GraftSession {

  /** Apply engine defaults to any builder (local tests, Verify, Bench). */
  def configure(b: SparkSession.Builder, shufflePartitions: Int = 32): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); Spark has no nanos type, so
      // read the physical int64 and convert explicitly (Tables.load).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // NOTE on dump timestamps: keep the default (INT96) writer type.
      // TIMESTAMP_MICROS annotates isAdjustedToUTC=true, which pandas
      // reads as tz-AWARE and the DuckDB side reads naive — every
      // timestamp column then fails value compare. INT96 round-trips
      // tz-naive, matching DuckDB (driver-verified green in round 2).

  def local(cores: Int = 32, appName: String = "graft"): SparkSession = {
    val s = configure(SparkSession.builder().master(s"local[$cores]").appName(appName))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
