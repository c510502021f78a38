package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.classic.{Dataset, SparkSession}

/** Rebind a DataFrame's (analyzed) logical plan to a CLONED session
  * carrying query-scoped SQL conf overrides.
  *
  * `SparkSession.newSession()` shares the SparkContext and catalog but
  * gets its own `SQLConf` — the supported way to give ONE query a
  * different `spark.sql.shuffle.partitions` (or any conf) without
  * mutating the session every other query in the JVM plans against.
  * The rebind itself moves no data: the same analyzed plan is wrapped in
  * a new Dataset whose planning reads the cloned conf. Lives in the sql
  * package tree because `Dataset.ofRows` is `private[sql]` — same
  * pattern as [[ColumnBridge]]/[[StatsBridge]].
  *
  * The ANALYZED plan is carried (not the raw parsed one) so temp-view
  * references stay resolved against the origin session's catalog rather
  * than re-resolving in the clone (whose temp-view registry starts
  * empty).
  */
object SessionBridge {
  def withConf(df: DataFrame, confs: Map[String, String]): DataFrame = {
    val ds = df.asInstanceOf[Dataset[Row]]
    val cloned = ds.sparkSession.asInstanceOf[SparkSession].newSession()
    confs.foreach { case (k, v) => cloned.conf.set(k, v) }
    Dataset.ofRows(cloned, ds.queryExecution.analyzed)
  }
}
