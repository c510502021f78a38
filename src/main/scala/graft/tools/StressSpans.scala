package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.api.GraftOps

/** Scale-stress harness for span-level exact-substring dedup (q85): run
  * `maskRepeatedSpans` over a synthetic corpus at a ladder of sizes and
  * print one JSON line with timings, so the wall-clock curve documents
  * HOW the op scales — the plan is an inverted index (occurrences
  * shuffled on the window hash) plus two doc-keyed shuffles, so cost
  * should grow ~linearly in total tokens, never in document pairs.
  *
  * The corpus is adversarially repeat-heavy: every doc carries a shared
  * 8-token boilerplate header from a pool of 32 (so ~n/32 docs share
  * each header — hot posting lists, the worst realistic case), followed
  * by a unique hash-derived body. All text derives from the doc id —
  * no storage, deterministic, reproducible.
  *
  * Usage: sbt "runMain graft.tools.StressSpans [nDocs[,nDocs...]]"
  * (default ladder 100000,400000,1600000).
  */
object StressSpans {
  def main(args: Array[String]): Unit = {
    val ladder = args.headOption.map(_.split(",").map(_.trim.toLong).toSeq)
      .getOrElse(Seq(100000L, 400000L, 1600000L))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.local(cpus, "graft-stress-spans")
    spark.sparkContext.setLogLevel("WARN")

    def corpus(n: Long) = {
      // header h = id%32: 8 repeated tokens; body: 24 unique-ish tokens
      // derived from the doc id (hash suffixes make bodies non-repeating)
      val h = pmod(col("id"), lit(32))
      spark.range(n).repartition(cpus * 2)
        .select(col("id").as("doc_id"),
          concat_ws(" ",
            (0 until 8).map(i => concat(lit(s"hdr${i}_"), h)) ++
              (0 until 24).map(i => concat(lit(s"b${i}_"),
                graft.functions.Portable.fastHash(col("id"), lit(i)))): _*)
            .as("text"))
    }

    val results = ladder.map { n =>
      val t0 = System.nanoTime()
      val out = GraftOps.maskRepeatedSpans(corpus(n), col("doc_id"),
        col("text"), width = 5, minDf = 2)
      // force full materialization including the rebuilt text
      val agg = out.agg(count(lit(1)), sum("n_masked"), sum("n_tokens"),
        sum(length(col("masked_text")))).collect()(0)
      val sec = (System.nanoTime() - t0) / 1e9
      val line = (n, agg.getLong(0), agg.getLong(1), agg.getLong(2), sec)
      System.err.println(
        f"[stress-spans] n=$n%9d docs=${line._2}%9d masked=${line._3}%10d " +
          f"of ${line._4}%10d tokens  $sec%7.1f s")
      line
    }
    val json = results.map { case (n, d, m, t, s) =>
      f"""{"n":$n,"docs":$d,"masked_tokens":$m,"total_tokens":$t,"sec":$s%.1f}"""
    }.mkString("[", ",", "]")
    println(s"""{"metric":"stress_spans","ladder":$json}""")
    spark.stop()
  }
}
