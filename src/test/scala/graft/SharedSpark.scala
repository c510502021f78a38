package graft

import org.apache.spark.sql.SparkSession

/** One SparkSession per test JVM (suites share it via getOrCreate). */
trait SharedSpark {
  lazy val spark: SparkSession = GraftSession.local(4, "graft-test")
  val sf001 = "/root/testdata/sf0.001"
}
