package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator surfaces here as a named query with (where
  * SQL-expressible) a DuckDB oracle; the driver's correctness gate runs
  * both at sf0.01 and hash-compares.
  */
object SparkEntry {

  /** Full registry (operator families keep their own files). */
  val registry: Seq[QueryDef] =
    CoreQueries.all ++ DedupOps.all ++ TextOps.all ++
      SimilarityOps.all ++ MultimodalOps.all ++ TemporalOps.all ++
      CurationOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.q02.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o.stripMargin.trim)).toMap
}
