package graft
import org.apache.spark.sql.SparkSession
/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  * Results are fully materialized via the `noop` sink (forces every
  * operator — joins, sorts, writes — without driver collect). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
        SparkSession.builder().master(s"local[$cpus]").appName("graft-bench"),
        shufflePartitions = cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen path once on the smallest SF so measured times
    // reflect steady-state execution, not first-query classloading.
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // Warm the OS page cache on the MEASURED SF too: without this the first
    // measured query (q01, alphabetically) absorbs the entire cold read of
    // the sf0.1 parquet files and records 2-3x its steady-state time
    // (round-6 adjudication: q01 runs [3.05, 3.06, 0.92]).
    // try/catch sits INSIDE the loop: one unloadable table must not leave
    // every table after it cold (that silently reintroduces the skew).
    Tables.names.foreach { n =>
      try Tables.load(spark, sfDir, n).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warm-up skipped table $n: ${e.getMessage}")
      }
    }
    // optional args: restrict to named queries (profiling aid)
    val wanted = args.toSet
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.isEmpty || wanted(n) }
    // Per-query MEDIAN of `runs` timings (default 3). A single-shot timing
    // can't distinguish a plan regression from transient host contention —
    // the median of three back-to-back runs is robust to one contended run,
    // so the recorded artifact defends itself without re-adjudication.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val failed = scala.collection.mutable.ArrayBuffer.empty[String]
    // Per-run environment counters, captured AFTER each run: when a runs
    // array disagrees with a clean re-run (r6-r8 drivers vs builder on
    // q41), the artifact itself should say what accumulated — driver heap
    // in use, storage memory in use across block managers, live
    // persistent RDDs, live broadcast blocks. All best-effort: a counter
    // that can't be read records -1 rather than failing the bench.
    def diag(): (Long, Long, Int, Int) = {
      val heapMb = {
        val rt = Runtime.getRuntime
        (rt.totalMemory() - rt.freeMemory()) / (1024 * 1024)
      }
      val (storeMb, nBcast) =
        try {
          val statuses = org.apache.spark.SparkEnv.get.blockManager.master
            .getStorageStatus
          val used = statuses.map(s => s.maxMem - s.memRemaining).sum / (1024 * 1024)
          val bcast = statuses.iterator.flatMap(_.blocks.keys)
            .count(_.isInstanceOf[org.apache.spark.storage.BroadcastBlockId])
          (used, bcast)
        } catch { case scala.util.control.NonFatal(_) => (-1L, -1) }
      val nRdds =
        try spark.sparkContext.getPersistentRDDs.size
        catch { case scala.util.control.NonFatal(_) => -1 }
      (heapMb, storeMb, nRdds, nBcast)
    }
    val results = selected.map { case (name, fn) =>
      val timed = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        val res = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some(((System.nanoTime() - t0) / 1e9, diag()))
        } catch { case e: Throwable =>
          if (!failed.contains(name)) failed += name
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
        // PER-RUN hygiene (untimed — runs after the clock stops): drop
        // any DataFrame caches the run pinned and nudge GC so the
        // ContextCleaner can reclaim the run's broadcast/RDD blocks.
        // This was per-QUERY until round 9; the r8 driver bench showed
        // q41 growing monotonically across its own 3 back-to-back runs
        // ([1.28, 3.64, 6.21]) while its diag counters (captured ABOVE,
        // before this hygiene, so accumulation stays observable) show
        // exactly what accumulates: each run of a query whose plan
        // EXECUTES a BroadcastExchange leaves TorrentBroadcast blocks +
        // driver garbage pinned until the next GC lets the cleaner run.
        // q40 builds the same cluster table but is immune because its
        // result IS the broadcast-hinted frame — no downstream join ever
        // consumes the hint, so no broadcast is materialized per run.
        spark.catalog.clearCache()
        System.gc()
        res
      }
      val times = timed.map(_._1)
      val diags = timed.map(_._2)
      val sec =
        if (times.isEmpty) 0.0
        else times.sorted.apply((times.size - 1) / 2) // lower median
      System.err.println(
        f"[bench] $name%-28s $sec%8.2f s  (runs: ${times.map(t => f"$t%.2f").mkString(" ")})")
      (name, sec, times, diags)
    }
    // a failed query must not masquerade as a fast one in the JSON record
    val ok = results.filterNot(r => failed.contains(r._1))
    val qs = ok.map { case (k, v, _, _) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    // Every per-query number lives in BENCH_RUNS.json, NOT on stdout: the
    // driver keeps only the last ~2000 bytes of stdout, and at 88+ queries
    // even a medians-only map (~3 KB) overflows that window, truncating
    // the line start and making it unparseable (this nulled BENCH_r05,
    // _r11 and _r12's parse). The stdout line carries only the totals —
    // metric/value/n/failed/sf, a few hundred bytes at any registry size.
    val runsJson = ok.map { case (k, _, ts, _) =>
        "\"" + k + "\":" + ts.map(t => f"$t%.3f").mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    // one diag object per run: [heapMB, storageUsedMB, persistentRdds,
    // broadcastBlocks] — see diag() above
    val diagJson = ok.map { case (k, _, _, ds) =>
        "\"" + k + "\":" + ds.map { case (h, st, r, b) => s"[$h,$st,$r,$b]" }
          .mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    // total sums the SAME filtered set as `queries` — a failed query's
    // partial/zero time must not silently skew the headline number
    val total = ok.map(_._2).sum
    val line = f"""{"metric":"total","value":$total%.3f,"unit":"sec","n":${ok.size},"failed":$failedJson,"sf":"$sfDir"}"""
    val full = f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"runs":$runsJson,"diag":$diagJson,"failed":$failedJson,"sf":"$sfDir"}"""
    try {
      val w = new java.io.PrintWriter("BENCH_RUNS.json", "UTF-8")
      try w.println(full) finally w.close()
      System.err.println(s"[bench] per-run times -> BENCH_RUNS.json")
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH_RUNS.json: ${e.getMessage}")
    }
    println(line)
    spark.stop()
  }
}
