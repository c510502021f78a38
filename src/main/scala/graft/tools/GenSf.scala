package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic-fixture generator for SCALE-STRESS runs above
  * the driver-provided SFs (TESTDATA.md tops out at sf0.1; VERDICT r9 #2
  * asks for oracle parity at sf1 = 100× the gated scale).
  *
  * Emits the same ten tables with the same schemas and FK structure as
  * FIXTURES.md, with distributions mirroring the measured originals:
  * hash-derived values (no RNG state — every cell is a pure function of
  * its key, so generation is reproducible and embarrassingly parallel),
  * planted document near-dups (~20%) and exact dups (~5%) for the dedup
  * family, labels 0..9 on near-orthogonal 64-dim embeddings, monotone
  * event times over 30 days. region/nation are copied verbatim from the
  * source SF dir (dims don't scale).
  *
  * Usage: GenSf <srcSfDir> <outDir> <scale> [vocab]  — scale multiplies
  * the sf0.01 row counts (scale=100 → sf1: 6M lineitem, 1M events, 50k
  * docs). `vocab` selects the documents vocabulary tier:
  *  - `degenerate` (default) — the original ~30-word soup. ADVERSARIAL
  *    STRESS: every text query's candidate/result grain is maximally
  *    dense (any two docs share most shingles), so costs here are upper
  *    bounds driven by pathological density, not representative ones
  *    (the q156 first draft died on exactly this).
  *  - `zipf` — a deterministic ~10k-word Zipf(s≈1) vocabulary: word
  *    rank = floor(V^u) for a hash-uniform u (log-uniform ranks ⇒
  *    P(rank r) ∝ 1/r, the natural-text law), surface form = 'w' +
  *    digits-to-letters of the rank (short common words, long rare
  *    ones). REPRESENTATIVE COST tier for the text family: shingle/
  *    posting densities mirror real corpora. Same doc-length, near-dup
  *    (~20%) and exact-dup (~5%) structure as the degenerate tier, and
  *    equally seed-stable — every cell is still a pure hash of its key,
  *    and both engines read the identical parquet.
  *
  * `events.ts` is written as µs TIMESTAMP rather than the originals'
  * TIMESTAMP(NANOS): Tables.load normalizes NANOS to µs on read anyway,
  * and DuckDB sees the identical µs instants either way, so oracle
  * parity semantics are unchanged.
  */
object GenSf {

  def main(args: Array[String]): Unit = {
    require(args.length == 3 || args.length == 4,
      "usage: GenSf <srcSfDir> <outDir> <scale> [degenerate|zipf]")
    val Array(src, out, scaleS) = args.take(3)
    val scale = scaleS.toInt
    val vocabMode = args.lift(3).getOrElse("degenerate")
    require(vocabMode == "degenerate" || vocabMode == "zipf",
      s"vocab must be 'degenerate' or 'zipf'; got $vocabMode")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master(
        s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
        .appName("graft-gensf"),
      shufflePartitions = 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, src, out, scale, vocabMode)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String, scale: Int,
      vocabMode: String = "degenerate"): Unit = {
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(s"[gensf] $name: ${spark.read.parquet(s"$out/$name.parquet").count()} rows")
    }
    // dims don't scale — carry the source content verbatim
    write("region", spark.read.parquet(s"$src/region.parquet"))
    write("nation", spark.read.parquet(s"$src/nation.parquet"))

    val nCust = 1500L * scale
    val nSupp = 100L * scale
    val nPart = 2000L * scale
    val nOrders = 15000L * scale
    val nEvents = 10000L * scale
    val nDocs = 500L * scale
    val nVecs = 80L * scale // 500@0.01 → 2000@0.1 kept q19's quadratic path; 8000@sf1 keeps its oracle feasible

    // every value = pure function of (table-tag, key) via xxhash64
    def h(tag: String, ks: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
      abs(xxhash64(lit(tag) +: ks: _*))

    write("supplier", spark.range(nSupp).select(
      col("id").as("s_suppkey"),
      format_string("Supplier#%09d", col("id")).as("s_name"),
      pmod(h("sn", col("id")), lit(25)).cast("int").as("s_nationkey"),
      (pmod(h("sb", col("id")), lit(1000000)).cast("double") / 100.0).as("s_acctbal")))

    write("customer", spark.range(nCust).select(
      col("id").as("c_custkey"),
      format_string("Customer#%09d", col("id")).as("c_name"),
      pmod(h("cn", col("id")), lit(25)).cast("int").as("c_nationkey"),
      (pmod(h("cb", col("id")), lit(1000000)).cast("double") / 100.0).as("c_acctbal"),
      element_at(array(Seq("AUTOMOBILE", "HOUSEHOLD", "BUILDING", "FURNITURE",
        "MACHINERY").map(lit): _*), (pmod(h("cm", col("id")), lit(5)) + 1).cast("int"))
        .as("c_mktsegment")))

    val colors = Seq("small", "red", "blue", "hot", "green", "dark", "pale", "light")
    val nouns = Seq("ring", "widget", "bolt", "gear", "gizmo", "spring", "cog", "plate")
    val types = Seq("ECONOMY", "SMALL", "STANDARD", "LARGE", "PROMO")
    write("part", spark.range(nPart).select(
      col("id").as("p_partkey"),
      concat(
        element_at(array(colors.map(lit): _*), (pmod(h("pc", col("id")), lit(colors.size)) + 1).cast("int")),
        lit(" "),
        element_at(array(nouns.map(lit): _*), (pmod(h("pn", col("id")), lit(nouns.size)) + 1).cast("int")))
        .as("p_name"),
      format_string("Brand#%d", (pmod(h("pb", col("id")), lit(25)) + 1).cast("int")).as("p_brand"),
      element_at(array(types.map(lit): _*), (pmod(h("pt", col("id")), lit(types.size)) + 1).cast("int")).as("p_type"),
      (pmod(h("ps", col("id")), lit(50)) + 1).cast("int").as("p_size"),
      (lit(900.0) + col("id").cast("double") * 0.1).as("p_retailprice")))

    val orders = spark.range(nOrders).select(
      col("id").as("o_orderkey"),
      pmod(h("oc", col("id")), lit(nCust)).as("o_custkey"),
      element_at(array(Seq("P", "O", "F").map(lit): _*),
        (pmod(h("os", col("id")), lit(3)) + 1).cast("int")).as("o_orderstatus"),
      (lit(1000.0) + pmod(h("op", col("id")), lit(49900000)).cast("double") / 100.0).as("o_totalprice"),
      timestamp_seconds(lit(java.time.LocalDate.of(1995, 1, 1).toEpochDay * 86400L)
        + pmod(h("od", col("id")), lit(2404L)) * 86400L).as("o_orderdate"),
      element_at(array(Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW").map(lit): _*), (pmod(h("opr", col("id")), lit(5)) + 1).cast("int"))
        .as("o_orderpriority"))
    write("orders", orders)

    // 1..7 lines per order (avg 4 → lineitem ≈ 4 × orders)
    val li = orders.select(col("o_orderkey"), col("o_orderdate"))
      .withColumn("l_linenumber",
        explode(sequence(lit(1), (pmod(h("ln", col("o_orderkey")), lit(7)) + 1).cast("int"))))
    write("lineitem", li.select(
      col("o_orderkey").as("l_orderkey"),
      pmod(h("lp", col("o_orderkey"), col("l_linenumber")), lit(nPart)).as("l_partkey"),
      pmod(h("ls", col("o_orderkey"), col("l_linenumber")), lit(nSupp)).as("l_suppkey"),
      col("l_linenumber"),
      (pmod(h("lq", col("o_orderkey"), col("l_linenumber")), lit(50)) + 1).cast("double").as("l_quantity"),
      (lit(900.0) + pmod(h("le", col("o_orderkey"), col("l_linenumber")), lit(10410000)).cast("double") / 100.0)
        .as("l_extendedprice"),
      (pmod(h("ld", col("o_orderkey"), col("l_linenumber")), lit(11)).cast("double") / 100.0).as("l_discount"),
      (pmod(h("lt", col("o_orderkey"), col("l_linenumber")), lit(9)).cast("double") / 100.0).as("l_tax"),
      element_at(array(Seq("A", "N", "R").map(lit): _*),
        (pmod(h("lr", col("o_orderkey"), col("l_linenumber")), lit(3)) + 1).cast("int")).as("l_returnflag"),
      element_at(array(Seq("F", "O").map(lit): _*),
        (pmod(h("ll", col("o_orderkey"), col("l_linenumber")), lit(2)) + 1).cast("int")).as("l_linestatus"),
      (col("o_orderdate") + make_dt_interval(
        (pmod(h("lsd", col("o_orderkey"), col("l_linenumber")), lit(95)) + 1).cast("int")))
        .cast("timestamp").as("l_shipdate")))

    // events: monotone-with-jitter µs instants over 30 days, 150 users per
    // sf0.01-unit (15k at sf1), 5 types, 2dp values, {"k": n} props
    val nUsers = 150L * scale
    val spanUs = 30L * 86400L * 1000000L
    val stepUs = spanUs / nEvents
    val t0us = java.time.LocalDate.of(2024, 1, 1).toEpochDay * 86400L * 1000000L
    write("events", spark.range(nEvents).select(
      col("id").as("event_id"),
      timestamp_micros(lit(t0us) + col("id") * stepUs
        + pmod(h("ej", col("id")), lit(stepUs.max(2L)))).as("ts"),
      pmod(h("eu", col("id")), lit(nUsers)).as("user_id"),
      element_at(array(Seq("click", "view", "purchase", "signup", "error").map(lit): _*),
        (pmod(h("et", col("id")), lit(5)) + 1).cast("int")).as("event_type"),
      ((pmod(h("ev", col("id")), lit(49000)) + 1).cast("double") / 100.0).as("value"),
      format_string("{\"k\": %d}", pmod(h("ek", col("id")), lit(100)).cast("int")).as("props")))

    // documents: 40–80-token bag-of-words texts; ~20% near-dups (tail token
    // mutated from a canonical doc 100 back) + ~5% exact dups, matching the
    // originals' dedup-family density; langs weighted like the source
    val vocab = Seq("key", "agg", "row", "scan", "slow", "fast", "table", "value",
      "part", "hash", "batch", "window", "spark", "order", "data", "column",
      "join", "small", "line", "customer", "query", "big", "merge", "stream",
      "filter", "sort", "vector", "the", "a", "shuffle")
    // the word at draw-hash `hc`: degenerate tier picks uniformly from
    // the 30-word soup; zipf tier maps a uniform u ∈ [0,1) to rank
    // floor(V^u) ∈ [1, V] (log-uniform ranks ⇒ Zipf s≈1) and renders
    // the rank's digits as letters — deterministic, engine-free, and
    // short words are exactly the frequent ones
    val zipfV = 10000
    def wordOf(hc: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      if (vocabMode == "zipf") {
        val u = pmod(hc, lit(1000000)).cast("double") / 1000000.0
        val rank = floor(pow(lit(zipfV.toDouble), u)).cast("long")
        concat(lit("w"), translate(rank.cast("string"),
          "0123456789", "aeioubkmtz"))
      } else
        element_at(array(vocab.map(lit): _*),
          (pmod(hc, lit(vocab.size)) + 1).cast("int"))
    val docs = spark.range(nDocs)
      .withColumn("__mode", pmod(h("dm", col("id")), lit(100)))
      // canonical source of this doc's base text: itself, or (near/exact
      // dup) the doc 100 earlier
      .withColumn("__canon",
        when(col("id") >= 100 && col("__mode") < 25, col("id") - 100)
          .otherwise(col("id")))
      .withColumn("__ntok", (pmod(h("dn", col("__canon")), lit(41)) + 40).cast("int"))
      .withColumn("__base", array_join(transform(sequence(lit(1), col("__ntok")),
        i => wordOf(h("dw", col("__canon"), i))), " "))
      // near-dup (mode<20): one extra tail token → high-but-not-1 jaccard;
      // exact dup (20<=mode<25): byte-identical text
      .withColumn("text",
        when(col("id") >= 100 && col("__mode") < 20,
          concat(col("__base"), lit(" "), wordOf(h("dx", col("id")))))
          .otherwise(col("__base")))
    write("documents", docs.select(
      col("id").as("doc_id"),
      col("text"),
      element_at(array(Seq("en", "en", "de", "fr", "es", "zh", "en").map(lit): _*),
        (pmod(h("dl", col("id")), lit(7)) + 1).cast("int")).as("lang"),
      format_string("src%d", pmod(h("ds", col("id")), lit(20)).cast("int")).as("source"),
      length(col("text")).cast("long").as("n_chars")))

    // embeddings: near-orthogonal uniform [-0.2, 0.2] 64-dim floats,
    // labels 0..9 — the q13/q19/q21 regime of the originals
    write("embeddings", spark.range(nVecs).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(63)),
        i => ((pmod(h("em", col("id"), i), lit(4001)) - lit(2000)).cast("double") / 10000.0)
          .cast("float")).as("embedding"),
      pmod(h("el", col("id")), lit(10)).cast("int").as("label")))
  }
}
