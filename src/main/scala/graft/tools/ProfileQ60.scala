package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.api.GraftOps

/** Stage-level cost split of q60's two-stage ANN search at a given SF —
  * the round-13 VERDICT adjudication: q60 runs 44 s at sf1 while its q66
  * sibling runs 2.9 s, and the suspicion is the EAGER in-query
  * coarse+PQ double-train at 100×, not the search. This tool times each
  * stage in isolation (forcing with a count/collect), plus the
  * STORED-model lifecycle (encode once → `ivfPqTopKCoded` +
  * `rerankTopK`), which is the documented build-once/search-many path a
  * production index actually runs.
  *
  * Usage: sbt "runMain graft.tools.ProfileQ60 [sfDir]"
  */
object ProfileQ60 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sf1_final")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = GraftSession.local(cpus, "graft-profile-q60")
    spark.sparkContext.setLogLevel("WARN")
    val DIM = 64; val K = 4; val M = 4; val KSUB = 4; val NPROBE = 2
    val e = graft.Tables.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")).persist()
    println(s"[profile-q60] corpus rows = ${e.count()}")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile-q60] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    // the in-query q60 stages, forced one at a time
    val coarse = timed("kmeansFit (train+collect)") {
      val m = GraftOps.kmeansFit(e, col("vec_id"), col("embedding"), K, iters = 1)
      m.persist(); m.count(); m
    }
    val pq = timed("pqFit (train+collect)") {
      val m = GraftOps.pqFit(e, col("vec_id"), col("embedding"), DIM, M, KSUB, iters = 1)
      m.persist(); m.count(); m
    }
    timed("ivfPqTopK (given models)") {
      GraftOps.ivfPqTopK(e, col("vec_id"), col("embedding"),
        col("vec_id") < 10, coarse, pq, dim = DIM, k = 3,
        nprobe = NPROBE, rerank = 6).count()
    }
    timed("q60 end-to-end (as shipped)") {
      GraftOps.ivfPqTopK(e, col("vec_id"), col("embedding"),
        col("vec_id") < 10,
        GraftOps.kmeansFit(e, col("vec_id"), col("embedding"), K, iters = 1),
        GraftOps.pqFit(e, col("vec_id"), col("embedding"), DIM, M, KSUB, iters = 1),
        dim = DIM, k = 3, nprobe = NPROBE, rerank = 6).count()
    }
    // the stored-model lifecycle: encode once, search the code table
    val codedPath = java.nio.file.Files.createTempDirectory("q60-coded").toString
    timed("ivfPqEncode + write (once)") {
      GraftOps.ivfPqEncode(e, col("vec_id"), col("embedding"), coarse, pq, DIM)
        .write.mode("overwrite").parquet(codedPath)
    }
    val coded = spark.read.parquet(codedPath)
    val probes = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("probe_id"), col("embedding").as("pv")).persist()
    probes.count()
    val shortlist = timed("ivfPqTopKCoded (stored)") {
      val sl = GraftOps.ivfPqTopKCoded(coded, col("id"), col("cell"), col("codes"),
        probes, col("probe_id"), col("pv"), coarse, pq, k = 6, nprobe = NPROBE)
      sl.persist(); sl.count(); sl
    }
    timed("rerankTopK (stored)") {
      GraftOps.rerankTopK(shortlist, col("probe_id"), col("id"),
        probes, col("probe_id"), col("pv"),
        e, col("vec_id"), col("embedding"), k = 3).count()
    }
    spark.stop()
  }
}
