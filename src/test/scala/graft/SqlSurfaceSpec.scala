package graft

import org.scalatest.funsuite.AnyFunSuite

/** Direct parity with the reference's batch SQL entry point
  * (SparkSQLOperator.java:17-23): register catalog views, run the literal
  * WHERE-equi-join shape through `spark.sql`, read rows positionally
  * (R5), then CTAS the same query (R6). Catalyst must rewrite the
  * syntactic cross join + WHERE into an equi-join (no CartesianProduct).
  */
class SqlSurfaceSpec extends AnyFunSuite with SharedSpark {

  test("R4/R5: SQL join-with-WHERE runs as an equi-join and collects positionally") {
    Tables.registerAll(spark, sf001)
    // the reference's query shape: SELECT * FROM a JOIN b WHERE b.key = a.key
    val q = "select * from nation n join region r where r.r_regionkey = n.n_regionkey"
    val df = spark.sql(q)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "WHERE predicate must be pushed into the join (ref R4 semantics)")
    val rows = df.collect() // ref R5: collect + positional access
    assert(rows.length == 25)
    assert(rows.forall(r => r.getInt(2) == r.getInt(3)),
      "positional access: n_regionkey == r_regionkey")
  }

  test("R6: CTAS materializes the join into the session catalog") {
    Tables.registerAll(spark, sf001)
    spark.sql("DROP TABLE IF EXISTS nice")
    spark.sql(
      """CREATE TABLE nice AS
         select n_name, r_name from nation n join region r
         where r.r_regionkey = n.n_regionkey""")
    try {
      assert(spark.table("nice").count() == 25)
      assert(spark.table("nice").columns.toSeq == Seq("n_name", "r_name"))
    } finally spark.sql("DROP TABLE nice")
  }
}
