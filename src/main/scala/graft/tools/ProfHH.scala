package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.Text

/** Scratch profiler for the q70 heavy-hitter family (not part of the
  * shipped surface; kept out of SparkEntry). */
object ProfHH {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(
        SparkSession.builder().master("local[32]").appName("prof-hh"),
        shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }

    val docs = Tables.load(spark, dir, "documents")

    // current shape: tk referenced repeatedly inside the HOF lambda
    def bigramsInline(text: org.apache.spark.sql.Column) = {
      val tk = Text.tokens(text)
      when(size(tk) >= 2,
        filter(
          transform(sequence(lit(1), size(tk) - 1),
            i => when(element_at(tk, i) =!= "" && element_at(tk, i + 1) =!= "",
              concat(element_at(tk, i), lit(" "), element_at(tk, i + 1)))),
          x => x.isNotNull))
        .otherwise(array().cast("array<string>"))
    }

    // candidate: materialize tokens once in its own projection
    def bigramsFromTk(tk: org.apache.spark.sql.Column) =
      when(size(tk) >= 2,
        filter(
          transform(sequence(lit(1), size(tk) - 1),
            i => when(element_at(tk, i) =!= "" && element_at(tk, i + 1) =!= "",
              concat(element_at(tk, i), lit(" "), element_at(tk, i + 1)))),
          x => x.isNotNull))
        .otherwise(array().cast("array<string>"))

    t("tokens only")(docs.select(Text.tokens(col("text")).as("tk")))
    t("bigrams inline (current)")(
      docs.select(explode(bigramsInline(col("text"))).as("bg")))
    t("bigrams two-step")(
      docs.select(Text.tokens(col("text")).as("tk"))
        .select(explode(bigramsFromTk(col("tk"))).as("bg")))
    t("two-step + exact agg")(
      docs.select(Text.tokens(col("text")).as("tk"))
        .select(explode(bigramsFromTk(col("tk"))).as("bg"))
        .groupBy("bg").count())
    spark.stop()
  }
}
