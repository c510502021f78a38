package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.api.GraftOps
import graft.functions.Portable

/** Scale-stress harness for the COMPOSED IVF×PQ index: `nVecs` synthetic
  * 16-dim vectors (same deterministic hash-derived anchor+jitter corpus
  * as [[StressKmeans]]) through the full build-once/search-many path:
  * coarse kmeansFit (k cells) + pqFit (m subspaces) → [[GraftOps
  * .ivfPqEncode]] (the persistable (id, cell, codes) table) →
  * [[GraftOps.ivfPqTopKCoded]] with `nProbes` probe vectors at nprobe=2.
  * The shapes under test are the 100 TB ones: both trainers are
  * broadcast-model-out/agg-back rounds, the encode is a narrow
  * zero-shuffle projection, and the search touches ~corpus·nprobe/k rows
  * carrying only m ints each — wall-clock must scale with corpus size,
  * never corpus × probes. Prints one JSON line.
  *
  * Usage: sbt "runMain graft.tools.StressIvfPq [nVecs] [k] [m] [nProbes]"
  * (default 2,000,000 vectors, 64 cells, 4 subspaces, 32 probes).
  */
object StressIvfPq {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(2000000L)
    val k = args.lift(1).map(_.toInt).getOrElse(64)
    val m = args.lift(2).map(_.toInt).getOrElse(4)
    val nProbes = args.lift(3).map(_.toInt).getOrElse(32)
    val dim = 16
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = GraftSession.local(cpus, "graft-stress-ivfpq")
    spark.sparkContext.setLogLevel("WARN")

    val built = spark.range(nVecs).repartition(cpus * 2)
      .select(col("id"), transform(sequence(lit(0), lit(dim - 1)), d =>
        ((pmod(Portable.fastHash(pmod(col("id"), lit(k.toLong)), d), lit(2000L))
          .cast("double") / 1000.0 - 1.0) +
        (pmod(Portable.fastHash(col("id"), d, lit(7)), lit(200L))
          .cast("double") / 1000.0 - 0.1)).cast("float")).as("emb"))
      .localCheckpoint() // build inputs once; stress the index, not the generator

    val t0 = System.nanoTime()
    val coarse = GraftOps.kmeansFit(built, col("id"), col("emb"), k, iters = 1)
    val pq = GraftOps.pqFit(built, col("id"), col("emb"), dim, m,
      ksub = 16, iters = 1)
    val tTrain = System.nanoTime()
    val index = GraftOps.ivfPqEncode(built, col("id"), col("emb"), coarse, pq, dim)
      .localCheckpoint() // materialized: the persisted-index stand-in
    val nIndexed = index.count()
    val tEncode = System.nanoTime()
    val probes = built.filter(col("id") < nProbes)
    val hits = GraftOps.ivfPqTopKCoded(index, col("id"), col("cell"),
      col("codes"), probes, col("id"), col("emb"), coarse, pq,
      k = 10, nprobe = 2).count()
    val tSearch = System.nanoTime()
    // the two-stage search: ADC shortlist (3x over-fetch) off the stored
    // index, then exact cosine against the full vector table — the extra
    // cost over raw ADC is the refinement's whole price at scale
    val shortlist = GraftOps.ivfPqTopKCoded(index, col("id"), col("cell"),
      col("codes"), probes, col("id"), col("emb"), coarse, pq,
      k = 30, nprobe = 2)
    val rrHits = GraftOps.rerankTopK(shortlist, col("probe_id"), col("id"),
      probes, col("id"), col("emb"), built, col("id"), col("emb"),
      k = 10).count()
    val tRerank = System.nanoTime()
    println(f"""{"metric":"stress_ivfpq","n_vecs":$nVecs,"cells":$k,"m":$m,"n_probes":$nProbes,"indexed_rows":$nIndexed,"hit_rows":$hits,"rerank_rows":$rrHits,"train_sec":${(tTrain - t0) / 1e9}%.1f,"encode_sec":${(tEncode - tTrain) / 1e9}%.1f,"search_sec":${(tSearch - tEncode) / 1e9}%.1f,"rerank_sec":${(tRerank - tSearch) / 1e9}%.1f}""")
    spark.stop()
  }
}
