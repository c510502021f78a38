package graft.tools

import org.apache.spark.sql.functions._
import graft.{GraftSession, Tables}
import graft.functions.Text

/** Bisect q16 minhash-LSH stages at sf0.1. */
object ProfileQ16 {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = GraftSession.local(32, "profile-q16")
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    val d = Tables.load(spark, dir, "documents")
    time("scan")(d.write.format("noop").mode("overwrite").save())
    val toks = d.select(col("doc_id"), Text.tokens(col("text")).as("toks"))
    time("tokens")(toks.write.format("noop").mode("overwrite").save())
    val sh = toks.withColumn("sh", Text.shingles(col("toks"), 3))
    time("shingles")(sh.write.format("noop").mode("overwrite").save())
    val sig = sh.filter(size(col("sh")) > 0)
      .withColumn("sig", Text.minhashSignature(col("sh"), 16))
      .select(col("doc_id"), col("sig"))
    time("signatures")(sig.write.format("noop").mode("overwrite").save())
    time("signatures again")(sig.write.format("noop").mode("overwrite").save())
    val bands = sig.select(col("doc_id"),
      posexplode(Text.lshBands(col("sig"), 4, 4)).as(Seq("b", "band_key")))
    time("bands")(bands.write.format("noop").mode("overwrite").save())
    val cand = bands.as("x").join(bands.as("y"),
        col("x.b") === col("y.b") && col("x.band_key") === col("y.band_key") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    time("cand pairs")(cand.write.format("noop").mode("overwrite").save())
    println("[prof] cand count = " + cand.count())
    time("full q16")(graft.operators.DedupOps.q16.run(spark, dir)
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
