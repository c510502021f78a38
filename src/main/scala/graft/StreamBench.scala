package graft

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.streaming.StreamingOps

/** Streaming replay benchmark (BASELINE.md streaming row): replays the
  * `events` table through the windowed-agg pipeline as a file stream in
  * micro-batches and reports sustained rows/sec. Deterministic input,
  * wall-clock measured over processAllAvailable.
  *
  * Usage: sbt "runMain graft.StreamBench [sfDir] [nChunks]"
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val nChunks = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]").appName("graft-stream-bench"),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tmp = Files.createTempDirectory("graft-sbench").toFile
    val srcDir = new java.io.File(tmp, "src"); srcDir.mkdirs()
    // chunk the events table into nChunks files -> nChunks micro-batches
    val e = Tables.load(spark, sfDir, "events")
    val total = e.count()
    e.withColumn("__chunk", pmod(col("event_id"), lit(nChunks)))
      .repartition(nChunks, col("__chunk"))
      .drop("__chunk")
      .write.mode("overwrite").parquet(srcDir.getAbsolutePath)

    val stream = spark.readStream
      .schema(e.schema)
      .option("maxFilesPerTrigger", "1")
      .parquet(srcDir.getAbsolutePath)
    // mode "window" (default): watermarked tumbling agg.
    // mode "stateful": transformWithState sessionization (RocksDB store).
    val mode = args.lift(2).getOrElse("window")
    val out = mode match {
      case "stateful" =>
        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        import spark.implicits._
        graft.streaming.SessionizeTws(
          stream.select(col("user_id"), col("ts"), col("value"))
            .as[graft.streaming.Sessionize.Event]).toDF()
      case _ =>
        StreamingOps.tumblingAgg(stream, "ts", "1 hour", "1 hour", col("event_type"))
    }
    // Auto-size shuffle partitions to the micro-batch volume (the
    // BASELINE.md footnote turned operator feature): ~total/nChunks rows
    // per batch, clamped by cores. SPARK_GRAFT_STREAM_PARTS overrides
    // (e.g. =32 reproduces the old fixed-partition behavior for A/B).
    val parts = sys.env.get("SPARK_GRAFT_STREAM_PARTS").map(_.toInt)
      .getOrElse(StreamingOps.sizedShufflePartitions(
        math.max(1L, total / nChunks), cpus.toInt))
    val sizedOut = StreamingOps.withShufflePartitions(out, parts)
    val ckpt = new java.io.File(tmp, "ckpt").getAbsolutePath
    val t0 = System.nanoTime()
    val q = sizedOut.writeStream.format("memory").queryName("sb_out")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    q.processAllAvailable()
    val sec = (System.nanoTime() - t0) / 1e9
    q.stop()
    val batches = q.recentProgress.length
    println(f"""{"metric":"stream_rows_per_sec","value":${total / sec}%.0f,"unit":"rows/sec","mode":"$mode","rows":$total,"sec":$sec%.2f,"batches":$batches,"partitions":$parts,"sf":"$sfDir"}""")
    spark.stop()
  }
}
