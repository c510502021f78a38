package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Rebind a DataFrame's (analyzed) logical plan to a CLONED session
  * carrying query-scoped SQL conf overrides.
  *
  * `cloneSession()` (NOT `newSession()`: that resets to the INITIAL
  * conf, silently dropping every runtime override the caller has set —
  * e.g. a RocksDB state-store provider — which is exactly the bug this
  * comment exists to prevent) copies the origin's session state, then
  * the overrides are applied on the copy — the way to give ONE query a
  * different `spark.sql.shuffle.partitions` (or any conf) without
  * mutating the session every other query in the JVM plans against.
  * The rebind itself moves no data: the same analyzed plan is wrapped
  * in a new Dataset whose planning reads the cloned conf. Lives in the
  * sql package tree because `Dataset.ofRows` and `cloneSession` are
  * `private[sql]` — same pattern as [[ColumnBridge]]/[[StatsBridge]].
  *
  * The ANALYZED plan is carried (not the raw parsed one) so temp-view
  * references stay resolved against the origin session's state at
  * rebind time.
  */
object SessionBridge {
  def withConf(df: DataFrame, confs: Map[String, String]): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    val cloned = ds.sparkSession.asInstanceOf[SparkSession].cloneSession()
    confs.foreach { case (k, v) => cloned.conf.set(k, v) }
    Dataset.ofRows(cloned, ds.queryExecution.analyzed)
  }
}
