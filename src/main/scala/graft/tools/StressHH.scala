package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.Text

/** Heavy-hitter tier equivalence at scale — the q70/q70b contract
  * exercised where it matters: the sf0.01 oracle gates 316 hitters at
  * 1200 ppm, but at sf1 that threshold correctly crosses zero
  * (CORRECTNESS_SF1.md note), so this stress run drops the threshold to
  * a scale-appropriate value and proves on the 100×-vocabulary corpus:
  *
  *   1. exact tier == sketch tier BIT-FOR-BIT (the MG superset guard +
  *      exact recount makes the sketch tier exact at any scale), and
  *   2. the wall-clock of each tier, for the record.
  *
  * Usage: SPARK_GRAFT_SF_DIR=<sf1 fixtures> sbt "runMain graft.tools.StressHH"
  */
object StressHH {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val thrPpm = sys.env.getOrElse("SPARK_GRAFT_HH_THR", "120").toLong
    val spark = GraftSession.configure(
        SparkSession.builder().master("local[32]").appName("stress-hh"),
        shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tk = Tables.load(spark, dir, "documents")
      .select(Text.tokens(col("text")).as("tk"))
    val bg = tk.select(explode(
      when(size(col("tk")) >= 2,
        filter(
          transform(sequence(lit(1), size(col("tk")) - 1),
            i => when(element_at(col("tk"), i) =!= "" &&
                element_at(col("tk"), i + 1) =!= "",
              concat(element_at(col("tk"), i), lit(" "),
                element_at(col("tk"), i + 1)))),
          x => x.isNotNull))
        .otherwise(array().cast("array<string>"))).as("bg"))
    val total = bg.count()
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val (exact, tEx) = timed {
      graft.api.GraftOps.heavyHitters(bg, col("bg"), thrPpm)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    val (sketch, tSk) = timed {
      graft.api.GraftOps.heavyHittersSketch(bg, col("bg"), thrPpm,
          capacity = 16384)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    }
    require(exact == sketch,
      s"TIER DIVERGENCE: exact ${exact.size} vs sketch ${sketch.size} rows")
    println(f"[stress-hh] $dir thr=${thrPpm}ppm bigrams=$total " +
      f"hitters=${exact.size} exact=${tEx}%.1fs sketch=${tSk}%.1fs BIT-EQUAL")
    spark.stop()
  }
}
