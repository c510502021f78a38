package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Scratch profiler for q09 — bisects the expression battery to find the
  * per-row cost driver at sf0.1. */
object ProfileQ09 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, "profile-q09")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val l = Tables.load(spark, dir, "lineitem")
    val p = Tables.load(spark, dir, "part")
    val j = l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
    time("warmup count")(j.count())
    time("join only noop")(j.write.format("noop").mode("overwrite").save())
    time("strings only") {
      j.select(upper(substring(col("p_name"), 1, 8)), length(col("p_name")),
        regexp_extract(col("p_name"), "([a-z]+)", 1), col("p_name").like("%re%"))
        .write.format("noop").mode("overwrite").save()
    }
    time("dates only") {
      j.select(year(col("l_shipdate")), month(col("l_shipdate")),
        dayofmonth(col("l_shipdate")), date_trunc("month", col("l_shipdate")),
        datediff(col("l_shipdate"), expr("TIMESTAMP '1995-01-01 00:00:00'")))
        .write.format("noop").mode("overwrite").save()
    }
    time("math only") {
      j.select(abs(col("p_size") - 25), sqrt(col("p_size").cast("double")),
        floor(col("l_quantity") / 7.0), ceil(col("l_quantity") / 7.0))
        .write.format("noop").mode("overwrite").save()
    }
    time("full select no sort") {
      graft.operators.CoreQueries.q09.run(spark, dir)
        .queryExecution // just build
      val df = graft.operators.CoreQueries.q09.run(spark, dir)
      // strip the final orderBy by re-selecting? approximate: run as-is minus sort
      df.limit(1).write.format("noop").mode("overwrite").save()
    }
    time("full q09 with sort") {
      graft.operators.CoreQueries.q09.run(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
