package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}

/** Scratch profiler for q10 (events JSON + window agg) at sf0.1. */
object ProfileQ10 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, "profile-q10")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val e = Tables.load(spark, dir, "events")
    time("count")(println("rows=" + e.count()))
    time("scan noop")(e.write.format("noop").mode("overwrite").save())
    time("scan again")(e.write.format("noop").mode("overwrite").save())
    time("json extract") {
      e.select(get_json_object(col("props"), "$.k")).write.format("noop").mode("overwrite").save()
    }
    time("from_json variant") {
      e.select(from_json(col("props"),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,int>")).getItem("k"))
        .write.format("noop").mode("overwrite").save()
    }
    time("window groupby") {
      e.groupBy(col("event_type"), window(col("ts"), "1 hour"))
        .agg(count(lit(1))).write.format("noop").mode("overwrite").save()
    }
    time("full q10") {
      graft.operators.CoreQueries.q10.run(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("full q10 again") {
      graft.operators.CoreQueries.q10.run(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
