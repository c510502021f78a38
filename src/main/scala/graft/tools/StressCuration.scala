package graft.tools

import org.apache.spark.sql.functions._
import graft.GraftSession
import graft.api.GraftOps

/** Scale-stress harness for the corpus-curation chain at ~2000× the sf0.1
  * documents row count: stratified sample → epoch mixing → shard-shuffle
  * → token packing over a synthetic 10M-doc corpus. All four ops are
  * designed to be narrow (sample/mix/shard) or one-shuffle (pack), so
  * wall-clock here should scale with input size, not pair counts — this
  * harness is the evidence. The synthetic corpus comes from spark.range
  * (deterministic hash-derived strata and token counts — no Random, no
  * files), so the run is reproducible and touches no test data.
  *
  * Usage: sbt "runMain graft.tools.StressCuration [nDocs]"
  * (default 10,000,000). Prints one JSON line with row counts + timings.
  */
object StressCuration {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt, "graft-stress-cur")
    spark.sparkContext.setLogLevel("WARN")

    // 10M docs, 8 sources, 5 langs, 50-2050 tokens each — all derived
    // from the doc id so the corpus needs no storage and no shuffle.
    val docs = spark.range(nDocs).repartition(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt * 2)
      .select(col("id").as("doc_id"),
        concat(lit("src"), pmod(col("id"), lit(8))).as("source"),
        element_at(array(lit("en"), lit("zh"), lit("es"), lit("de"), lit("fr")),
          (pmod(col("id"), lit(5)) + 1).cast("int")).as("lang"),
        (pmod(graft.functions.Portable.fastHash(col("id")), lit(2000)) + 50)
          .as("n_tokens"))

    val t0 = System.nanoTime()
    // round 9: split assignment joins the measured chain — another pure
    // narrow stage riding the same scan. Its md5-per-row cost is NOT free
    // (it is the 4th portable hash in the chain); SPARK_GRAFT_STRESS_SPLIT=off
    // reruns the round-6 chain for a same-host A/B of exactly that stage.
    val withSplit = !sys.env.get("SPARK_GRAFT_STRESS_SPLIT").contains("off")
    val split =
      if (withSplit)
        GraftOps.assignSplits(docs, col("doc_id"),
          Seq("train" -> 900000, "valid" -> 50000, "test" -> 50000))
      else docs.withColumn("split", lit("all"))
    val sampled = GraftOps.stratifiedSample(split, col("source"), col("doc_id"),
      Map("src0" -> 200000, "src1" -> 200000), defaultPpm = 800000)
    val mixed = GraftOps.mixCorpus(sampled, col("lang"), col("doc_id"),
      Map("en" -> 500000L, "zh" -> 2250000L), defaultPpm = 1000000L)
    // shard on doc_id + copy_idx: epoch copies share doc_id, and sharding
    // on it alone would give every copy an identical (shard, shuffle_key)
    // — adjacent in the layout, defeating the shuffle (see shardCorpus doc)
    val sharded = GraftOps.shardCorpus(mixed,
      concat(col("doc_id").cast("string"), lit("|"), col("copy_idx")),
      seed = 7, nShards = 256)
    // pack per shard: 256 bounded strata → 256-way parallel window
    val packed = GraftOps.packByTokenBudget(sharded, col("shard"),
      col("shuffle_key"), col("n_tokens"), budget = 4096L)
    // split presence probed with min/max (cheap) rather than a second
    // countDistinct — two countDistincts in one agg plan an EXPAND that
    // roughly doubles the final pass and would pollute the timing record
    val out = packed.agg(
      count(lit(1)).as("rows"),
      countDistinct(col("shard")).as("shards"),
      min(col("split")).as("split_min"),
      max(col("split")).as("split_max"),
      max(col("bin")).as("max_bin")).collect()(0)
    val done = System.nanoTime()
    println(f"""{"metric":"stress_curation","in_docs":$nDocs,"out_rows":${out.getLong(0)},"shards":${out.getLong(1)},"split_range":"${out.getString(2)}..${out.getString(3)}","max_bin":${out.getLong(4)},"total_sec":${(done - t0) / 1e9}%.1f}""")
    spark.stop()
  }
}
