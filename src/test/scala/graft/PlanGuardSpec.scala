package graft

import org.apache.spark.sql.execution.SparkPlan
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guard over the ENTIRE query registry: a query can
  * stay hash-green while its physical plan silently degrades (a join
  * condition stops being equi, a broadcast hint is lost, a cartesian
  * sneaks in). This spec pins the nested-loop/cartesian surface to the
  * declared set so rounds can't regress a plan unnoticed.
  */
class PlanGuardSpec extends AnyFunSuite with SharedSpark {

  /** Queries whose plans legitimately contain a nested-loop or cartesian
    * join — each deliberate and bounded:
    *  - q13: exact kNN broadcasts the tiny probe set with a non-equi
    *    self-exclusion predicate (id != probe_id) — BNLJ over k probes.
    *  - q19: at test SF the corpus is under quadraticLimit, so the exact
    *    broadcast block product runs (the guarded LSH path is equi-join).
    *  - q32: the cross-join query — cartesian IS the semantics.
    *  - q35: tf-idf joins the 1-row corpus-count via broadcast cross join.
    *  - q50: PQ ADC scan — same broadcast-probes non-equi shape as q13,
    *    but the scanned side carries only the m-int code column.
    *  - q70/q70b: heavy hitters join the 1-row total-count via broadcast
    *    cross join (the q35 shape; the sketch tier adds a second 1-row
    *    broadcast for the candidate summary's recount).
    *  - q71: SQ8 ADC scan — the q50 shape with byte codes.
    *  - q77: collocations join the 1-row bigram-total via broadcast
    *    cross join (the q35/q70 shape).
    *  - q81: the contribution report joins the 1-row grand total via
    *    broadcast cross join (same shape).
    *  - q112: BM25 joins the 1-row (N, total-tokens) corpus stats via
    *    broadcast cross join (the q35/q70/q81 shape).
    *  - q115: the fusion fixture replicates the 20-row static prior to
    *    every query id via a broadcast cross join (bounded: queries ×
    *    top-20), and embeds q112's 1-row stats cross.
    *  - q128: the MMR candidate stage IS q13's knn — the same broadcast
    *    non-equi probe scan; the MMR walk itself adds no join at all.
    *  - q130: the r×c contingency grid is a catalog² broadcast cross of
    *    the two marginal tables plus the 1-row totals cross (the q35
    *    shape) — bounded by category cardinalities, never the corpus.
    *  - q131: the 1-row baseline stats broadcast-cross onto the
    *    variant-grain table (the q35/q70 shape).
    *  - q133: the 1-row grand-token-total broadcast-cross onto the
    *    (class, term) table (the q35/q70 shape).
    *  - q134: the 1-row journey-total broadcast-cross onto the
    *    path-catalog table (the q35/q70 shape).
    *  - q141: the 1-row max-ts reference-instant broadcast-cross onto
    *    the observation stream (the q35/q70 shape).
    *  - q145/q146: the 1-row totals broadcast-cross onto the key-count
    *    table (the q35/q70 shape, both audits).
    *  - q151: the KMV pairwise stage crosses the per-group THETA table
    *    with itself (|groups|² rows, group-cardinality scale — the
    *    sketch algebra never touches corpus rows; the corpus-scale
    *    stage is the equi-shaped distinct inside kmvSketch).
    *  - q158: inherits q115's two declared crosses verbatim — q112's
    *    1-row bm25 stats broadcast and the 20-row length prior
    *    replicated per query (bounded: queries × top-20); the RBO fold
    *    itself adds one equi-join on query id.
    */
  private val allowNestedLoop = Set(
    "q13_similarity_knn", "q19_embedding_neardup", "q32_cross_join",
    "q35_tfidf_topk", "q50_ann_pq", "q70_heavy_hitters",
    "q70b_heavy_hitters_sketch", "q71_ann_sq8", "q77_collocations",
    "q81_contribution", "q112_bm25_topk", "q115_rrf_fusion",
    "q128_mmr_rerank", "q130_cat_association", "q131_proportion_lift",
    "q133_class_key_terms", "q134_top_paths", "q141_trending",
    "q145_key_skew", "q146_join_cardinality", "q151_kmv_source_overlap",
    "q158_rbo_rankings")

  private def nodes(p: SparkPlan): Seq[SparkPlan] =
    p +: p.children.flatMap(nodes)

  private lazy val plans: Map[String, SparkPlan] =
    SparkEntry.registry.map { q =>
      q.name -> q.run(spark, sf001).queryExecution.sparkPlan
    }.toMap

  test("nested-loop/cartesian joins appear ONLY in the declared queries") {
    val offenders = plans.collect {
      case (name, plan) if nodes(plan).exists(n =>
          n.nodeName.contains("BroadcastNestedLoopJoin") ||
            n.nodeName.contains("CartesianProduct")) && !allowNestedLoop(name) =>
        name
    }
    assert(offenders.isEmpty,
      s"undeclared nested-loop/cartesian join in: ${offenders.toSeq.sorted.mkString(", ")}")
  }

  test("the declared nested-loop set is not stale") {
    val stale = allowNestedLoop.filter { name =>
      !nodes(plans(name)).exists(n =>
        n.nodeName.contains("BroadcastNestedLoopJoin") ||
          n.nodeName.contains("CartesianProduct"))
    }
    assert(stale.isEmpty,
      s"allowlisted queries no longer plan a nested loop (shrink the list): $stale")
  }

  test("sample/mix/shard ops plan zero exchanges (scan-speed at any scale)") {
    // The defining property of the narrow curation ops: no Exchange node
    // anywhere in the raw operator's plan (the registry queries add an
    // ORDER BY only for oracle determinism). A regression that sneaks a
    // shuffle in would still hash-match while costing a full repartition
    // of the corpus at 100 TB.
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf001, "documents")
    val narrow = Map(
      "stratifiedSample" -> graft.api.GraftOps.stratifiedSample(
        docs, col("source"), col("doc_id"), Map("src0" -> 200000), 500000),
      "mixCorpus" -> graft.api.GraftOps.mixCorpus(
        docs, col("lang"), col("doc_id"), Map("en" -> 500000L), 1000000L),
      "shardCorpus" -> graft.api.GraftOps.shardCorpus(
        docs, col("doc_id"), seed = 7, nShards = 8))
    narrow.foreach { case (name, df) =>
      val ex = nodes(df.queryExecution.sparkPlan)
        .filter(_.nodeName.contains("Exchange"))
      assert(ex.isEmpty, s"$name plans an exchange:\n${ex.mkString("\n")}")
    }
  }

  test("round-12 op plan shapes: single-shuffle asof, broadcast outlier stats, one-exchange samplers") {
    import org.apache.spark.sql.functions._
    // Exchanges are inserted by EnsureRequirements, so they only appear
    // in the EXECUTED plan (sparkPlan is pre-preparation); AQE wraps it,
    // so count shapes on the plan string.
    def planStr(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    def countOf(s: String, needle: String): Int =
      s.sliding(needle.length).count(_ == needle)
    val e = Tables.load(spark, sf001, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    // asofJoin promises ONE hash exchange (the union-marker window) in
    // either direction — a second would mean the forward path reverses
    // the data instead of the sort.
    Seq(false, true).foreach { fwd =>
      val s = planStr(graft.api.GraftOps.asofJoin(
        e.filter(col("event_type") === "purchase").drop("event_type"),
        e.filter(col("event_type") === "click").drop("event_type"),
        "user_id", "ts", forward = fwd, toleranceUs = 1000000L))
      val n = countOf(s, "Exchange hashpartitioning")
      assert(n == 1,
        s"asofJoin(forward=$fwd) must plan exactly one hash exchange, got $n")
    }
    // robustOutliers: both stat joins broadcast — the corpus must never
    // sort-merge (shuffle) against catalog-sized group stats.
    val docs = Tables.load(spark, sf001, "documents")
    val ro = planStr(graft.api.GraftOps.robustOutliers(docs, col("lang"),
      col("n_chars")))
    // 3, not 2: the med-join subtree feeds both the mad aggregate and
    // the final join, so it plans twice — every instance must broadcast.
    assert(countOf(ro, "BroadcastHashJoin") == 3,
      "robustOutliers must broadcast med and mad back at every join site")
    assert(!ro.contains("SortMergeJoin"),
      "robustOutliers must never shuffle the corpus on the group key")
    // weightedSample is a pure narrow filter: zero exchanges.
    val ws = planStr(graft.api.GraftOps.weightedSample(docs, col("doc_id"),
      col("n_chars") / 1000.0, 500000L))
    assert(!ws.contains("Exchange"), "weightedSample must plan zero exchanges")
    // weightedFixedSample: exactly the one per-stratum window exchange.
    val wf = planStr(graft.api.GraftOps.weightedFixedSample(docs,
      col("source"), col("doc_id"), col("n_chars"), 10))
    assert(countOf(wf, "Exchange hashpartitioning") == 1,
      "weightedFixedSample is one window shuffle on strata")
  }

  test("semanticDedupPairs is a cell equi-join, never an all-pairs product") {
    import org.apache.spark.sql.functions._
    def planStr(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val e = Tables.load(spark, sf001, "embeddings")
    val s = planStr(graft.api.GraftOps.semanticDedupPairs(e,
      col("vec_id"), col("embedding"), k = 4, threshold = 0.5))
    // The defining scale property (SemDeDup shape): candidates come from
    // an equi-join keyed on the learned cell id — the id_a < id_b and
    // cosine predicates ride the SAME join as post-conditions. A
    // cartesian or nested-loop here would be the O(n^2) plan this
    // operator exists to avoid.
    assert(!s.contains("CartesianProduct") &&
      !s.contains("BroadcastNestedLoopJoin"),
      "semantic pair generation must never plan an all-pairs product")
    assert(s.contains("__ca"),
      "pair join must key on the cell id (__ca = __cb)")
    // the nprobe=2 recall tier widens routing, not the join shape: still
    // a cell equi-join, still no all-pairs product
    val s2 = planStr(graft.api.GraftOps.semanticDedupPairs(e,
      col("vec_id"), col("embedding"), k = 4, threshold = 0.5, nprobe = 2))
    assert(!s2.contains("CartesianProduct") &&
      !s2.contains("BroadcastNestedLoopJoin"),
      "nprobe=2 must stay an equi-join, never an all-pairs product")
    assert(s2.contains("__ca"), "nprobe=2 pair join still keys on the cell id")
  }

  test("applyMixture stays broadcast-only on the corpus side") {
    // The defining property of the mixture apply: the |sources|-row plan
    // reaches the corpus via a broadcast hash join — never a sort-merge
    // join, whose shuffle would repartition the full corpus at 100 TB.
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf001, "documents")
      .withColumn("n_tokens", size(graft.functions.Text.tokens(col("text"))))
    val rates = graft.api.GraftOps.mixtureRates(docs, col("source"),
      col("n_tokens"), Map("src0" -> 300000), 50000, 20000L)
    val applied = graft.api.GraftOps.applyMixture(
      docs.select("doc_id", "source"), col("source"), col("doc_id"), rates)
    val plan = nodes(applied.queryExecution.sparkPlan)
    assert(plan.exists(_.nodeName.contains("BroadcastHashJoin")),
      "the rate plan must broadcast")
    assert(!plan.exists(_.nodeName.contains("SortMergeJoin")),
      "applyMixture must never sort-merge the corpus against the tiny plan")
  }

  test("rerank's vector-table fetch is broadcast-only (never shuffles the corpus)") {
    // The defining property of the two-stage search: the exact stage reads
    // the at-rest vector table ONCE with the |probes|·k' shortlist
    // broadcast in. A sort-merge regression would repartition the 100 TB
    // vector table to refund quantization error on a few thousand rows.
    import org.apache.spark.sql.functions._
    val emb = Tables.load(spark, sf001, "embeddings")
    val coarse = graft.api.GraftOps.kmeansFit(emb, col("vec_id"),
      col("embedding"), k = 4, iters = 1)
    val pq = graft.api.GraftOps.pqFit(emb, col("vec_id"), col("embedding"),
      dim = 64, m = 4, ksub = 4, iters = 1)
    val plan = nodes(graft.api.GraftOps.ivfPqTopK(emb, col("vec_id"),
      col("embedding"), col("vec_id") < 10, coarse, pq, dim = 64, k = 3,
      nprobe = 2, rerank = 6).queryExecution.sparkPlan)
    assert(plan.exists(_.nodeName.contains("BroadcastHashJoin")),
      "rerank must broadcast the shortlist into the vector scan")
    assert(!plan.exists(_.nodeName.contains("SortMergeJoin")),
      "rerank must never sort-merge the vector table against the shortlist")
  }

  test("q14's range join keeps both sides pre-aggregated (scale-safe band join)") {
    // The defining property of the banded range join: BOTH join inputs
    // collapse to their tiny key domains BEFORE the band explode, so join
    // work is O(|domain|) regardless of row count. A regression to raw-side
    // banding would still hash-match while shuffle-amplifying at scale.
    val joins = nodes(plans("q14_theta_band_join"))
      .filter(n => n.nodeName.contains("Join"))
    assert(joins.nonEmpty, "q14 must contain the band join")
    joins.foreach { j =>
      j.children.foreach { side =>
        assert(nodes(side).exists(_.nodeName.contains("Aggregate")),
          s"q14 join side lost its pre-aggregation:\n$side")
      }
    }
  }
}
