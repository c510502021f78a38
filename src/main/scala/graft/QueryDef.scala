package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One oracle-checkable unit of the engine's query surface.
  *
  * @param name   stable snake_case id (drives CORRECTNESS_r{N}.json keys)
  * @param run    the Spark-first implementation, given (session, sf dir)
  * @param oracle equivalent DuckDB SQL over the same parquet tables; None
  *               for operators whose semantics aren't SQL-expressible in
  *               DuckDB (driver then records a weaker rows-only check).
  *
  * Contract (SURVEY.md §5): column names match between `run` and `oracle`;
  * every float-bearing column is derived via engine-portable arithmetic
  * (decimal-exact sums cast to double, sequential folds for vector math,
  * md5-based hashing — see [[graft.functions.Portable]]); every query ends
  * in a total-order sort so row order is deterministic in both engines.
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])
