package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraftSession

/** Scale curve for the changelog family (q96/q97/S20): synthetic
  * changelogs of N rows over N/50 keys (hash-derived — reproducible, no
  * RNG state; ~2% deletes, version = row id so every key has a dense
  * 50-change history), timing:
  *
  *   1. `applyChanges` — the one-agg max_by reduction (the q96 shape);
  *   2. `scd2` — the key-shuffle + lead-window history build;
  *   3. the S20 log lifecycle at 10 chunk-appends: per-chunk
  *      `latestByKey` + append, then `upsertState` (reduce-on-read)
  *      and `compactUpsertLog`, with the stream-equals-batch law
  *      re-checked at stress scale (row counts + exceptAll empty).
  *
  * Three rungs ×4 apart show the shape: wall-clock should stay ~linear
  * in rows (hash agg + one shuffle); a superlinear bend here is spill.
  *
  * Usage: sbt "runMain graft.tools.StressChangelog [maxRows]"
  */
object StressChangelog {
  def main(args: Array[String]): Unit = {
    val maxRows = args.headOption.map(_.toLong).getOrElse(8000000L)
    val spark = GraftSession.configure(
        SparkSession.builder().master("local[32]").appName("stress-changelog"),
        shufflePartitions = 32)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.DataFrame

    def changelog(n: Long): DataFrame =
      spark.range(n).select(
        pmod(xxhash64(lit("ck"), col("id")), lit(math.max(n / 50, 1L))).as("k"),
        col("id").as("v"),
        col("id").as("seq"),
        when(pmod(xxhash64(lit("cd"), col("id")), lit(50)) === 0, "d")
          .otherwise("u").as("op"),
        md5(col("id").cast("string")).as("payload"))

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    var rows = math.max(1L, maxRows / 16) // floor: maxRows<16 must not loop at 0 forever
    while (rows <= maxRows) {
      val log = changelog(rows)
      val (nApplied, tApply) = timed {
        graft.api.GraftOps.applyChanges(log, Seq(col("k")), col("v"),
          col("seq"), col("op") === "d").count()
      }
      val (nHist, tScd) = timed {
        graft.api.GraftOps.scd2(log, Seq(col("k")), col("v"), col("seq"),
          col("op") === "d").count()
      }
      // S20 lifecycle: 10 chunk appends of per-chunk winners, then read
      val dir = java.nio.file.Files.createTempDirectory("stress-ups").toString
      val cdir = java.nio.file.Files.createTempDirectory("stress-ups-c").toString
      try {
        val (_, tAppend) = timed {
          (0 until 10).foreach { c =>
            graft.api.GraftOps.latestByKey(
                log.filter(pmod(col("seq"), lit(10)) === c),
                Seq(col("k")), col("v"), col("seq"))
              .write.mode("append").parquet(dir)
          }
        }
        val (nState, tRead) = timed {
          graft.streaming.StreamingOps.upsertState(spark, dir,
            Seq("k"), "v", "seq", isDelete = col("op") === "d").count()
        }
        val (_, tCompact) = timed {
          graft.api.GraftOps.compactUpsertLog(spark, dir, cdir,
            Seq("k"), "v", "seq")
        }
        require(nState == nApplied,
          s"LAW BREAK at $rows rows: stream-log state $nState != batch $nApplied")
        val diff = graft.streaming.StreamingOps.upsertState(spark, cdir,
            Seq("k"), "v", "seq", isDelete = col("op") === "d")
          .exceptAll(graft.api.GraftOps.applyChanges(log, Seq(col("k")),
            col("v"), col("seq"), col("op") === "d")).count()
        require(diff == 0, s"LAW BREAK at $rows rows: compacted state diverges")
        println(f"[stress-changelog] rows=$rows%,d keys=${rows / 50}%,d " +
          f"applied=$nApplied%,d hist=$nHist%,d | apply=$tApply%.1fs " +
          f"scd2=$tScd%.1fs append10=$tAppend%.1fs read=$tRead%.1fs " +
          f"compact=$tCompact%.1fs LAWS-OK")
      } finally {
        import scala.reflect.io.Directory
        Seq(dir, cdir).foreach(d =>
          new Directory(new java.io.File(d)).deleteRecursively())
      }
      rows *= 4
    }
    spark.stop()
  }
}
