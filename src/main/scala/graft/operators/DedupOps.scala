package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.{CosineSim, Text}

/** SQL fragments shared by the DuckDB oracles of the text/dedup queries.
  * Each mirrors a builder in [[graft.functions.Text]] — keep in lockstep. */
private[operators] object Duck {
  /** Whitespace tokens of normalized text (DuckDB needs the 'g' flag). */
  val toks = "string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')"
  /** 3-token shingles over a `toks` column. */
  val shingles3 =
    """CASE WHEN len(toks) >= 3
      THEN list_transform(range(1, len(toks)-1), i -> array_to_string(list_slice(toks, i, i+2), ' '))
      ELSE CAST([] AS VARCHAR[]) END"""
  /** Portable 60-bit hash of a SQL string expression (see Portable.phashDuck). */
  def ph(s: String): String = s"CAST('0x' || substring(md5($s), 1, 15) AS BIGINT)"
  /** Bit-exact cosine similarity between two FLOAT[dim] list expressions:
    * sequential left-to-right double folds, matching CosineSim's codegen. */
  def cosine(a: String, b: String, dim: Int = 64): String = {
    def dot(x: String, y: String) =
      s"list_reduce(list_transform(range(1, ${dim + 1}), i -> CAST($x[i] AS DOUBLE) * CAST($y[i] AS DOUBLE)), (p, q) -> p + q)"
    s"(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})))"
  }
  /** DuckDB sequential-fold dot of an embedding against a DOUBLE[] list
    * column — same op order as NearestCells' JVM loop (q34/q48-proven). */
  private def dotCol(e: String, c: String, dim: Int = 64): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), i -> CAST($e[i] AS DOUBLE) * list_extract($c, i)), (p, q) -> p + q)"

  /** One k-means Lloyd step as CTE text: assignment of every embedding
    * against `cvecIn` (argmax sequential-dot, cluster-asc ties) into
    * `asg$r`, then integer-micros means into `cent$r`/`cvec$r`. The q48
    * chain's repeating unit, shared so q83's oracle can run the EXTRA
    * assignment round kmeansAssign performs after training. */
  private def kmeansRound(r: Int, cvecIn: String): String = s"""
      scored$r AS (
        SELECT e.vec_id, e.embedding, c.cluster,
          ${dotCol("e.embedding", "c.cvec")} AS score
        FROM embeddings e, $cvecIn c),
      asg$r AS (
        SELECT vec_id, embedding, cluster FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cluster) AS rn
          FROM scored$r) WHERE rn = 1),
      cent$r AS (
        SELECT cluster, CAST(i - 1 AS INTEGER) AS dim,
          CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
            / 1000000.0 / COUNT(*) AS centroid
        FROM asg$r, (SELECT unnest(range(1, 65)) AS i) idx
        GROUP BY cluster, dim),
      cvec$r AS (
        SELECT cluster,
          list_transform(list_sort(list({'dim': dim, 'cv': centroid})), p -> p.cv) AS cvec
        FROM cent$r GROUP BY cluster)"""

  /** k-means train-then-assign CTE chain for the embeddings table —
    * k = 5 hash-min seeds, 2 Lloyd rounds (bit-identical to q48's
    * proven chain), plus the POST-TRAINING assignment of every row
    * against the final model (what [[graft.api.GraftOps.kmeansAssign]]
    * computes). Ends in `sd_asg(vec_id, embedding, cluster)`. */
  val kmeansAsgCtes: String = s"""
      hashed AS (
        SELECT vec_id, embedding,
          ${ph("'km|' || CAST(vec_id AS VARCHAR)")} AS h
        FROM embeddings),
      seeds AS (
        SELECT embedding,
          CAST(row_number() OVER (ORDER BY h, vec_id) AS INTEGER) - 1 AS cluster
        FROM hashed ORDER BY h, vec_id LIMIT 5),
      cvec0 AS (
        SELECT cluster,
          list_transform(range(1, 65),
            i -> floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) / 1000000.0) AS cvec
        FROM seeds),
      ${kmeansRound(1, "cvec0")},
      ${kmeansRound(2, "cvec1")},
      scored3 AS (
        SELECT e.vec_id, e.embedding, c.cluster,
          ${dotCol("e.embedding", "c.cvec")} AS score
        FROM embeddings e, cvec2 c),
      sd_asg AS (
        SELECT vec_id, embedding, cluster FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cluster) AS rn
          FROM scored3) WHERE rn = 1)"""

  /** The q16 MinHash+LSH candidate-pair CTE chain (ending in `mh_pairs`
    * with doc_a < doc_b). Shared verbatim between q16 and q40 so the
    * cluster-resolution oracle consumes the exact pairs q16 checks. */
  val minhashCtes: String = s"""
      t AS (SELECT doc_id, $toks AS toks FROM documents),
      shs AS (SELECT doc_id, $shingles3 AS sh FROM t),
      hm AS (SELECT doc_id, list_transform(sh, s -> md5('mh|' || s)) AS hm
             FROM shs WHERE len(sh) > 0),
      sig AS (
        SELECT doc_id,
          list_transform(range(0, 16), j ->
            list_min(list_transform(hm, m ->
              CAST('0x' || substring(m, 1, 15) AS BIGINT)
                + j * (CAST('0x' || substring(m, 16, 15) AS BIGINT) % 1000000007)))) AS sig
        FROM hm),
      bands AS (
        SELECT doc_id, sig, b,
          md5(array_to_string(list_transform(list_slice(sig, b*4+1, b*4+4), x -> CAST(x AS VARCHAR)), ',')) AS band_key
        FROM sig, (SELECT unnest(range(0, 4)) AS b)),
      cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b, x.sig AS sa, y.sig AS sb
        FROM bands x JOIN bands y
          ON x.b = y.b AND x.band_key = y.band_key AND x.doc_id < y.doc_id),
      mh_pairs AS (
        SELECT doc_a, doc_b,
          CAST(len(list_filter(range(1, 17), i -> sa[i] = sb[i])) AS DOUBLE) / 16.0 AS est_jaccard
        FROM cand
        WHERE len(list_filter(range(1, 17), i -> sa[i] = sb[i])) >= 8)"""
}

/** Deduplication operator family (SURVEY.md §2.2 "dedup" rows; BASELINE
  * north-star extensions): exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine. All signatures are computed with array higher-order
  * functions (no explode until the candidate join), so signature cost is a
  * narrow map over documents — the 100 TB-safe shape: only candidate PAIRS
  * shuffle, never the corpus cross product.
  */
object DedupOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // ---------------------------------------------------------------- q11
  /** Exact dedup on normalized text. Keeps the smallest doc_id per group
    * (explicit deterministic survivor — `dropDuplicates` keeps an arbitrary
    * row, which can't be oracle-checked). */
  val q11 = QueryDef("q11_dedup_exact",
    (s, dir) => {
      docs(s, dir)
        .withColumn("norm", Text.normText(col("text")))
        .groupBy(col("norm"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("n_copies"))
        .orderBy("doc_id")
    },
    Some("""
      SELECT min(doc_id) AS doc_id, COUNT(*) AS n_copies
      FROM (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents)
      GROUP BY norm
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q16
  /** MinHash + LSH near-dup: 3-token shingles → 16 portable minhashes →
    * 4 bands × 4 rows → band-bucket self-join → estimated Jaccard ≥ 0.5.
    * Signature step is a narrow map; only band-bucket pairs shuffle. */
  val q16 = QueryDef("q16_minhash_lsh_dedup",
    (s, dir) =>
      graft.api.GraftOps.minhashNearDup(docs(s, dir), col("doc_id"), col("text"),
          shingleWidth = 3, numHashes = 16, bands = 4, minMatches = 8)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("est_jaccard"))
        .orderBy("doc_a", "doc_b"),
    Some(s"""
      WITH ${Duck.minhashCtes}
      SELECT doc_a, doc_b, est_jaccard
      FROM mh_pairs
      ORDER BY doc_a, doc_b"""))

  // ---------------------------------------------------------------- q17
  /** SimHash near-dup: 60-bit majority-vote fingerprint, then a BANDED
    * hamming join — 4 × 15-bit chunks; hamming ≤ 3 guarantees ≥ 1 equal
    * chunk (pigeonhole), so the equi-join on (chunk_idx, chunk) finds every
    * qualifying pair without the O(n²) cross join the oracle uses. */
  val q17 = QueryDef("q17_simhash_dedup",
    (s, dir) =>
      graft.api.GraftOps.simhashNearDup(docs(s, dir), col("doc_id"), col("text"),
          maxHamming = 3)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("hamming"))
        .orderBy("doc_a", "doc_b"),
    Some(s"""
      WITH t AS (SELECT doc_id, ${Duck.toks} AS toks FROM documents),
      hs AS (SELECT doc_id, list_transform(toks, tk -> ${Duck.ph("'0|' || tk")}) AS hs FROM t),
      sig AS (
        SELECT doc_id,
          CAST(list_sum(list_transform(range(0, 60), b ->
            CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END)) > 0
            THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS sh
        FROM hs)
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
        CAST(bit_count(xor(x.sh, y.sh)) AS INTEGER) AS hamming
      FROM sig x JOIN sig y ON x.doc_id < y.doc_id
      WHERE bit_count(xor(x.sh, y.sh)) <= 3
      ORDER BY doc_a, doc_b"""))

  // ---------------------------------------------------------------- q18
  /** Exact n-gram Jaccard via inverted-index join: explode distinct
    * 3-shingles (as portable 60-bit hashes — int64 join keys shuffle ~3×
    * cheaper than the shingle strings and both engines hash identically,
    * so any collision merges the same way), drop shingles hitting > 100
    * docs (df cap — bounds the join fanout at scale; applied identically
    * in the oracle), count intersections pairwise, Jaccard ≥ 0.6. Never
    * materializes the document cross product. */
  val q18 = QueryDef("q18_ngram_jaccard_dedup",
    (s, dir) =>
      graft.api.GraftOps.ngramJaccard(docs(s, dir), col("doc_id"), col("text"),
          shingleWidth = 3, dfCap = 100, threshold = 0.6)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("jaccard"))
        .orderBy("doc_a", "doc_b"),
    Some(s"""
      WITH t AS (SELECT doc_id, ${Duck.toks} AS toks FROM documents),
      sr AS (SELECT doc_id, unnest(list_distinct(${Duck.shingles3})) AS sh_raw FROM t),
      s0 AS (SELECT doc_id, ${Duck.ph("sh_raw")} AS sh FROM sr),
      rare AS (SELECT sh FROM s0 GROUP BY sh HAVING COUNT(*) <= 100),
      sf AS (SELECT s0.doc_id, s0.sh FROM s0 JOIN rare USING (sh)),
      sz AS (SELECT doc_id, COUNT(*) AS sz FROM sf GROUP BY doc_id),
      iv AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
        FROM sf a JOIN sf b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b,
        CAST(inter AS DOUBLE) / CAST(za.sz + zb.sz - inter AS DOUBLE) AS jaccard
      FROM iv JOIN sz za ON doc_a = za.doc_id JOIN sz zb ON doc_b = zb.doc_id
      WHERE CAST(inter AS DOUBLE) / CAST(za.sz + zb.sz - inter AS DOUBLE) >= 0.6
      ORDER BY doc_a, doc_b"""))

  // ---------------------------------------------------------------- q19
  /** Embedding-cosine near-dup: all pairs with cosine ≥ 0.95. Correctness
    * form is the broadcast block product (fine at test SF); the scale path
    * is q20's hyperplane-LSH bucketing. Cosine is the custom codegen'd
    * Catalyst expression — bit-identical to the oracle's fold. */
  val q19 = QueryDef("q19_embedding_neardup",
    (s, dir) =>
      graft.api.GraftOps.embeddingNearDup(Tables.load(s, dir, "embeddings"),
          col("vec_id"), col("embedding"), threshold = 0.95)
        .select(col("id_a").as("vec_a"), col("id_b").as("vec_b"), col("sim"))
        .orderBy("vec_a", "vec_b"),
    Some(s"""
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
        ${Duck.cosine("a.embedding", "b.embedding")} AS sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE ${Duck.cosine("a.embedding", "b.embedding")} >= 0.95
      ORDER BY vec_a, vec_b"""))

  // ---------------------------------------------------------------- q40
  /** Near-dup CLUSTER resolution — the stage every real dedup pipeline
    * needs after candidate pairs: q16's MinHash pairs → connected
    * components → one deterministic survivor (min doc_id) per cluster.
    * Spark side is min-label propagation with pointer jumping (O(log
    * diameter) rounds, join+agg per round, no driver state — see
    * [[graft.api.GraftOps.dedupClusters]]); the oracle
    * resolves the same components with a recursive reachability CTE over
    * the identical pair SQL (Duck.minhashCtes, shared with q16). */
  val q40 = QueryDef("q40_dedup_clusters",
    (s, dir) =>
      graft.api.GraftOps.dedupClusters(
          graft.api.GraftOps.minhashNearDup(docs(s, dir), col("doc_id"),
            col("text"), shingleWidth = 3, numHashes = 16, bands = 4,
            minMatches = 8),
          col("id_a"), col("id_b"))
        .orderBy("survivor", "member"),
    Some(s"""
      WITH RECURSIVE ${Duck.minhashCtes},
      edges AS (
        SELECT doc_a AS a, doc_b AS b FROM mh_pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM mh_pairs),
      reach AS (
        SELECT a AS src, b AS dst FROM edges
        UNION
        SELECT r.src, e.b AS dst FROM reach r JOIN edges e ON e.a = r.dst)
      SELECT LEAST(MIN(dst), src) AS survivor, src AS member
      FROM reach
      GROUP BY src
      ORDER BY survivor, member"""))

  // ---------------------------------------------------------------- q41
  /** End-to-end dedup APPLY: the corpus with every non-survivor near-dup
    * cluster member removed (q16 pairs → q40 components → left-anti join)
    * — what a training-data pipeline actually ships. Emits the surviving
    * doc ids + metadata (not text — keeps the checked rows narrow). */
  val q41 = QueryDef("q41_dedup_apply",
    (s, dir) => {
      val d = docs(s, dir)
      graft.api.GraftOps.applyDedup(d, col("doc_id"),
          graft.api.GraftOps.minhashNearDup(d, col("doc_id"), col("text"),
            shingleWidth = 3, numHashes = 16, bands = 4, minMatches = 8),
          col("id_a"), col("id_b"))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH RECURSIVE ${Duck.minhashCtes},
      edges AS (
        SELECT doc_a AS a, doc_b AS b FROM mh_pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM mh_pairs),
      reach AS (
        SELECT a AS src, b AS dst FROM edges
        UNION
        SELECT r.src, e.b AS dst FROM reach r JOIN edges e ON e.a = r.dst),
      assign AS (
        SELECT LEAST(MIN(dst), src) AS survivor, src AS member
        FROM reach GROUP BY src)
      SELECT doc_id, lang, source FROM documents
      WHERE doc_id NOT IN (SELECT member FROM assign WHERE member <> survivor)
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q82
  /** Asymmetric containment dedup: ordered (contained, container) pairs
    * with shingle containment ≥ 0.9 — catches documents embedded inside
    * larger ones, where Jaccard (q18) stays low because the union is
    * dominated by the container. Exercises
    * [[graft.api.GraftOps.ngramContainment]]. */
  val q82 = QueryDef("q82_ngram_containment",
    (s, dir) =>
      graft.api.GraftOps.ngramContainment(docs(s, dir), col("doc_id"),
          col("text"), shingleWidth = 3, dfCap = 100, threshold = 0.9)
        .orderBy("contained_id", "container_id"),
    Some(s"""
      WITH t AS (SELECT doc_id, ${Duck.toks} AS toks FROM documents),
      sr AS (SELECT doc_id, unnest(list_distinct(${Duck.shingles3})) AS sh_raw FROM t),
      s0 AS (SELECT doc_id, ${Duck.ph("sh_raw")} AS sh FROM sr),
      rare AS (SELECT sh FROM s0 GROUP BY sh HAVING COUNT(*) <= 100),
      sf AS (SELECT s0.doc_id, s0.sh FROM s0 JOIN rare USING (sh)),
      sz AS (SELECT doc_id, COUNT(*) AS sz FROM sf GROUP BY doc_id),
      iv AS (
        SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS inter
        FROM sf a JOIN sf b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      dirs AS (
        SELECT ia AS contained_id, ib AS container_id,
          CAST(inter AS DOUBLE) / CAST(za.sz AS DOUBLE) AS containment
        FROM iv JOIN sz za ON ia = za.doc_id
        UNION ALL
        SELECT ib AS contained_id, ia AS container_id,
          CAST(inter AS DOUBLE) / CAST(zb.sz AS DOUBLE) AS containment
        FROM iv JOIN sz zb ON ib = zb.doc_id)
      SELECT contained_id, container_id, containment
      FROM dirs WHERE containment >= 0.9
      ORDER BY contained_id, container_id"""))

  // ---------------------------------------------------------------- q76
  /** Dedup apply with the QUALITY survivor policy: q41's pipeline but
    * each near-dup cluster keeps its highest-[[GraftOps.textQuality]]
    * member (ties → smallest id) instead of the smallest id — what a
    * curation pipeline actually wants when near-dups differ in quality.
    * Exercises [[graft.api.GraftOps.applyDedupBest]]. */
  val q76 = QueryDef("q76_dedup_keep_best",
    (s, dir) => {
      val d = docs(s, dir)
      graft.api.GraftOps.applyDedupBest(
          graft.api.GraftOps.textQuality(d, col("text")),
          col("doc_id"), col("quality_score"),
          graft.api.GraftOps.minhashNearDup(d, col("doc_id"), col("text"),
            shingleWidth = 3, numHashes = 16, bands = 4, minMatches = 8),
          col("id_a"), col("id_b"))
        .select(col("doc_id"), col("lang"), col("source"), col("quality_score"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH RECURSIVE ${Duck.minhashCtes},
      edges AS (
        SELECT doc_a AS a, doc_b AS b FROM mh_pairs
        UNION
        SELECT doc_b AS a, doc_a AS b FROM mh_pairs),
      reach AS (
        SELECT a AS src, b AS dst FROM edges
        UNION
        SELECT r.src, e.b AS dst FROM reach r JOIN edges e ON e.a = r.dst),
      comp AS (
        SELECT LEAST(MIN(dst), src) AS survivor, src AS member
        FROM reach GROUP BY src),
      f AS (
        SELECT doc_id,
          CAST(len(toks) AS INTEGER) AS n_tokens,
          list_sum(list_transform(toks, tk -> length(tk))) AS sum_len,
          len(list_filter(toks, tk -> tk IN ('the', 'a', 'of', 'and'))) AS n_stop,
          len(list_distinct(toks)) AS n_distinct
        FROM t),
      q AS (
        SELECT doc_id,
          (CAST(sum_len AS DOUBLE) / n_tokens) * 0.2
            + (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.5
            - (CAST(n_stop AS DOUBLE) / n_tokens) * 0.3 AS quality_score
        FROM f),
      mem AS (
        SELECT c.survivor, c.member, q.quality_score
        FROM comp c JOIN q ON q.doc_id = c.member),
      rk AS (
        SELECT member, row_number() OVER (
          PARTITION BY survivor ORDER BY quality_score DESC, member) AS rk
        FROM mem),
      dropped AS (SELECT member FROM rk WHERE rk > 1)
      SELECT d.doc_id, d.lang, d.source, q.quality_score
      FROM documents d JOIN q USING (doc_id)
      WHERE d.doc_id NOT IN (SELECT member FROM dropped)
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q83
  /** SEMANTIC dedup end-to-end: k-means cell routing (k=5, 2 Lloyd
    * rounds — q48's trained model) → within-cell exact-cosine pairs
    * ≥ 0.95 → connected components → keep each cluster's best member by
    * first-embedding-component score (a deterministic stand-in for a
    * model quality score; float→double cast is exact in both engines).
    * The SemDeDup-shaped complement of q19's LSH routing: candidates
    * come from a LEARNED cell equi-join, never an all-pairs product.
    * Exercises [[graft.api.GraftOps.semanticDedup]] =
    * semanticDedupPairs → dedupClusters → applyDedupBest. */
  val q83 = QueryDef("q83_semantic_dedup",
    (s, dir) =>
      graft.api.GraftOps.semanticDedup(Tables.load(s, dir, "embeddings"),
          col("vec_id"), element_at(col("embedding"), 1).cast("double"),
          col("embedding"), k = 5, threshold = 0.4)
        .select(col("vec_id"), col("label"))
        .orderBy("vec_id"),
    Some(s"""
      WITH RECURSIVE ${Duck.kmeansAsgCtes},
      sd_pairs AS (
        SELECT a.vec_id AS ia, b.vec_id AS ib
        FROM sd_asg a JOIN sd_asg b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE ${Duck.cosine("a.embedding", "b.embedding")} >= 0.4),
      edges AS (
        SELECT ia AS a, ib AS b FROM sd_pairs
        UNION
        SELECT ib AS a, ia AS b FROM sd_pairs),
      reach AS (
        SELECT a AS src, b AS dst FROM edges
        UNION
        SELECT r.src, e.b AS dst FROM reach r JOIN edges e ON e.a = r.dst),
      comp AS (
        SELECT LEAST(MIN(dst), src) AS survivor, src AS member
        FROM reach GROUP BY src),
      mem AS (
        SELECT c.survivor, c.member, CAST(e.embedding[1] AS DOUBLE) AS sc
        FROM comp c JOIN embeddings e ON e.vec_id = c.member),
      rk AS (
        SELECT member, row_number() OVER (
          PARTITION BY survivor ORDER BY sc DESC, member) AS rk
        FROM mem),
      dropped AS (SELECT member FROM rk WHERE rk > 1)
      SELECT vec_id, label FROM embeddings
      WHERE vec_id NOT IN (SELECT member FROM dropped)
      ORDER BY vec_id"""))

  // ---------------------------------------------------------------- q85
  private val SPAN_W = 5
  private val SPAN_MINDF = 2

  /** Span-level exact-substring dedup (ExactSubstr, Lee et al. 2022,
    * re-expressed over a token inverted index): any `SPAN_W`-token window
    * whose hash appears in ≥ `SPAN_MINDF` distinct documents is masked out
    * of EVERY document containing it; the surrounding unique text
    * survives. The passage-granular family the document-level dedups
    * (q11/q16–q18/q82) cannot express — boilerplate and license headers
    * die, the documents live. Every step (portable window hashes, distinct-
    * doc counts, position coverage, ordered rebuild) is stated identically
    * on both sides, so the masked TEXT itself hash-matches DuckDB. */
  val q85 = QueryDef("q85_mask_repeated_spans",
    (s, dir) =>
      graft.api.GraftOps.maskRepeatedSpans(docs(s, dir), col("doc_id"),
          col("text"), width = SPAN_W, minDf = SPAN_MINDF)
        .orderBy("doc_id"),
    Some(s"""
      WITH t AS (SELECT doc_id, ${Duck.toks} AS toks FROM documents),
      occ AS (
        SELECT doc_id, toks, unnest(range(1, len(toks) - $SPAN_W + 2)) AS i
        FROM t WHERE len(toks) >= $SPAN_W),
      och AS (
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
          ${Duck.ph(s"array_to_string(list_slice(toks, i, i + ${SPAN_W - 1}), ' ')")} AS h
        FROM occ),
      rep AS (SELECT h FROM och GROUP BY h HAVING COUNT(DISTINCT doc_id) >= $SPAN_MINDF),
      hot AS (SELECT doc_id, pos FROM och JOIN rep USING (h)),
      cov AS (
        SELECT DISTINCT doc_id, pos + j AS tpos
        FROM hot, (SELECT unnest(range(0, $SPAN_W)) AS j) widx),
      tokrows AS (
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS tpos, toks[i] AS tok
        FROM (SELECT doc_id, toks, unnest(range(1, len(toks) + 1)) AS i FROM t) u),
      kept AS (
        SELECT k.doc_id, k.tpos, k.tok
        FROM tokrows k LEFT JOIN cov c ON c.doc_id = k.doc_id AND c.tpos = k.tpos
        WHERE c.doc_id IS NULL),
      agg AS (
        SELECT doc_id, COUNT(*) AS nkept,
          string_agg(tok, ' ' ORDER BY tpos) AS kept_text
        FROM kept GROUP BY doc_id)
      SELECT t.doc_id, CAST(len(t.toks) AS INTEGER) AS n_tokens,
        CAST(len(t.toks) AS INTEGER) - CAST(COALESCE(a.nkept, 0) AS INTEGER) AS n_masked,
        COALESCE(a.kept_text, '') AS masked_text
      FROM t LEFT JOIN agg a USING (doc_id)
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q92
  /** The audit report over q85's repeated-span machinery: the top-20
    * repeated spans BY TEXT with document reach and occurrence counts —
    * what boilerplate dominates the corpus, shown before masking removes
    * it. Representative text comes from the deterministic min (doc, pos)
    * occurrence, so the report hash-matches DuckDB verbatim. The oracle
    * computes that representative as a TRUE lexicographic first via
    * `row_number() OVER (PARTITION BY h ORDER BY doc_id, pos)` — the
    * round-13 `doc_id·10⁶ + pos` encoding (and its silent <10⁶
    * tokens/doc cliff) is gone as of round 14; both sides now state the
    * identical unbounded struct-min. */
  val q92 = QueryDef("q92_top_repeated_spans",
    (s, dir) =>
      graft.api.GraftOps.topRepeatedSpans(docs(s, dir), col("doc_id"),
        col("text"), width = SPAN_W, minDf = SPAN_MINDF, k = 20),
    Some(s"""
      WITH t AS (SELECT doc_id, ${Duck.toks} AS toks FROM documents),
      occ AS (
        SELECT doc_id, toks, unnest(range(1, len(toks) - $SPAN_W + 2)) AS i
        FROM t WHERE len(toks) >= $SPAN_W),
      och AS (
        SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos,
          ${Duck.ph(s"array_to_string(list_slice(toks, i, i + ${SPAN_W - 1}), ' ')")} AS h
        FROM occ),
      counts AS (
        SELECT h, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
        FROM och GROUP BY h
        HAVING COUNT(DISTINCT doc_id) >= $SPAN_MINDF),
      first AS (
        SELECT h, doc_id AS fdoc, pos AS fpos
        FROM (
          SELECT h, doc_id, pos,
            row_number() OVER (PARTITION BY h ORDER BY doc_id, pos) AS rn
          FROM och)
        WHERE rn = 1),
      rep AS (
        SELECT c.h, c.n_docs, c.n_occurrences, f.fdoc, f.fpos
        FROM counts c JOIN first f USING (h))
      SELECT array_to_string(list_slice(t.toks, r.fpos + 1, r.fpos + $SPAN_W), ' ')
          AS span_text,
        r.n_docs, r.n_occurrences
      FROM rep r JOIN t ON t.doc_id = r.fdoc
      ORDER BY n_docs DESC, n_occurrences DESC, span_text
      LIMIT 20"""))

  // ---------------------------------------------------------------- q99
  /** Unicode-fold dedup: canonical fold (lower → NFD → strip marks →
    * NFC — [[graft.functions.UnicodeFold]], codegen'd) as the exact-dedup
    * key, so `Café`/`café`/`CAFE` collapse. The fixture plants the noise
    * deterministically ON BOTH SIDES (docs ≡0 mod 3 get accented vowels
    * via translate, ≡0 mod 5 get upper-cased) and the oracle states the
    * identical fold as `strip_accents(nfc_normalize(lower(x)))` — the
    * fold itself is hash-gated, not just spec'd. Zero-shuffle fold +
    * one group-by on the folded key. */
  val q99 = QueryDef("q99_unicode_fold_dedup",
    (s, dir) => {
      val base = docs(s, dir).select(col("doc_id"), col("text"))
      // plant accent/case VARIANT copies of every 10th doc (both engines
      // state the same injection): the fold must collapse each planted
      // pair back to one group — the collapse path is hash-gated, not
      // just the fold's identity on clean text
      val variants = base.filter(pmod(col("doc_id"), lit(10)) === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          upper(translate(col("text"), "aeiou", "áéíóü")).as("text"))
      base.unionByName(variants)
        .withColumn("folded", graft.functions.UnicodeFold(col("text")))
        .groupBy(col("folded"))
        .agg(min(col("doc_id")).as("keeper_id"), count(lit(1)).as("n_variants"))
        .select(col("keeper_id"), col("n_variants"), col("folded"))
        .orderBy("keeper_id")
    },
    Some("""
      WITH corpus AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 1000000 AS doc_id,
          upper(translate(text, 'aeiou', 'áéíóü')) AS text
        FROM documents WHERE doc_id % 10 = 0),
      f AS (
        SELECT doc_id, strip_accents(nfc_normalize(lower(text))) AS folded
        FROM corpus)
      SELECT min(doc_id) AS keeper_id, count(*) AS n_variants, folded
      FROM f GROUP BY folded ORDER BY keeper_id"""))

  // --------------------------------------------------------------- q102
  /** Edit-distance near-key join: every doc pair (2k, 2k+1) shares a
    * high-entropy synthetic key (`item-` + 12 md5 hex chars of k) with
    * the odd twin's chars 8–9 overwritten — levenshtein ≤ 2 by
    * construction. The trigram-blocked join
    * ([[graft.api.GraftOps.editDistanceJoin]]) must recover exactly the
    * planted pairs; the oracle states the SAME blocking + verify (an
    * all-pairs oracle would be 1.5B levenshteins at sf1). High-entropy
    * keys keep every gram's df far under the cap — gramWidth=4 +
    * dfCap=100 keep blocking selective AT SCALE: 3-gram hex classes
    * saturate df≈73 at sf1 (df grows linearly with corpus — measured:
    * 31 s and 1.1% recall loss), while 4-gram hex classes sit at df≈5
    * and the low-entropy prefix classes get capped; the q-gram lemma
    * still guarantees ≥6 shared tail grams per planted pair. */
  val q102 = QueryDef("q102_edit_distance_join",
    (s, dir) => {
      val base = docs(s, dir).select(col("doc_id"),
        concat(lit("item-"),
          substring(md5(expr("cast(doc_id div 2 as string)")), 1, 12))
          .as("__b"))
      val keyed = base.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(2)) === 1,
          concat(substring(col("__b"), 1, 7), lit("zz"),
            substring(col("__b"), 10, 8)))
          .otherwise(col("__b")).as("key"))
      graft.api.GraftOps.editDistanceJoin(keyed, col("doc_id"), col("key"),
          maxDist = 2, gramWidth = 4, dfCap = 100)
        .orderBy("id_a", "id_b")
    },
    Some("""
      WITH b AS (
        SELECT doc_id,
          concat('item-', substr(md5(CAST(doc_id // 2 AS VARCHAR)), 1, 12)) AS bk
        FROM documents),
      k AS (
        SELECT doc_id,
          CASE WHEN doc_id % 2 = 1
            THEN concat(substr(bk, 1, 7), 'zz', substr(bk, 10, 8))
            ELSE bk END AS key
        FROM b),
      g AS (
        SELECT DISTINCT doc_id, unnest(list_transform(
          range(1, len(key) - 3 + 1),
          i -> substr(key, CAST(i AS INTEGER), 4))) AS gram
        FROM k WHERE len(key) >= 12),
      good AS (
        SELECT gram FROM g GROUP BY gram HAVING count(*) <= 100),
      gf AS (
        SELECT doc_id, gram FROM g SEMI JOIN good USING (gram)),
      cand AS (
        SELECT DISTINCT a.doc_id AS id_a, bb.doc_id AS id_b
        FROM gf a JOIN gf bb ON a.gram = bb.gram AND a.doc_id < bb.doc_id),
      -- sub-lemma-length keys: exact-equality distance-0 pairs (the
      -- operator's short-key tier; zero rows on this all-length-17
      -- fixture, stated for contract fidelity)
      shortp AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(0 AS BIGINT) AS dist
        FROM k a JOIN k b ON a.key = b.key AND a.doc_id < b.doc_id
        WHERE len(a.key) < 12)
      SELECT id_a, id_b, dist FROM (
        SELECT c.id_a, c.id_b,
          CAST(levenshtein(ka.key, kb.key) AS BIGINT) AS dist
        FROM cand c
        JOIN k ka ON ka.doc_id = c.id_a
        JOIN k kb ON kb.doc_id = c.id_b
        WHERE levenshtein(ka.key, kb.key) <= 2
        UNION ALL SELECT id_a, id_b, dist FROM shortp)
      ORDER BY id_a, id_b"""))

  // --------------------------------------------------------------- q114
  /** Lossless prefix-filter Jaccard join at the q18 parameters (w=3,
    * t=0.6) but with NO df-cap: the oracle restates the same global
    * (df, hash) ordering, per-set prefix, prefix equi-join, and exact
    * intersection verify. Because the filter is lossless, the output is
    * exactly "all pairs with true Jaccard ≥ 0.6" — a brute-force oracle
    * would state the same rows, but the blocked restatement keeps the
    * DuckDB side feasible at sf1 (the q102 precedent). Exercises
    * [[graft.api.GraftOps.jaccardJoinPrefix]]. */
  val q114 = QueryDef("q114_prefix_jaccard_join",
    (s, dir) =>
      graft.api.GraftOps.jaccardJoinPrefix(docs(s, dir), col("doc_id"),
          col("text"), shingleWidth = 3, threshold = 0.6)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"), col("jaccard"))
        .orderBy("doc_a", "doc_b"),
    Some(s"""
      WITH t AS (SELECT doc_id, ${Duck.toks} AS toks FROM documents),
      sr AS (SELECT doc_id, unnest(list_distinct(${Duck.shingles3})) AS sh_raw FROM t),
      s0 AS (SELECT doc_id, ${Duck.ph("sh_raw")} AS sh FROM sr),
      dfr AS (SELECT sh, CAST(COUNT(*) AS BIGINT) AS df FROM s0 GROUP BY 1),
      d AS (SELECT doc_id,
              list_transform(list_sort(list(struct_pack(df := df, sh := sh))),
                x -> x.sh) AS st
            FROM s0 JOIN dfr USING (sh) GROUP BY doc_id),
      dz AS (SELECT doc_id, st, len(st) AS sz,
               len(st) - CAST(ceil(len(st) * 0.6) AS INTEGER) + 1 AS plen
             FROM d),
      p AS (SELECT doc_id, unnest(list_slice(st, 1, plen)) AS sh FROM dz),
      cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
               FROM p a JOIN p b ON a.sh = b.sh AND a.doc_id < b.doc_id),
      v AS (SELECT doc_a, doc_b,
              len(list_intersect(da.st, db.st)) AS inter,
              da.sz AS za, db.sz AS zb
            FROM cand
            JOIN dz da ON da.doc_id = doc_a
            JOIN dz db ON db.doc_id = doc_b)
      SELECT doc_a, doc_b,
        CAST(inter AS DOUBLE) / CAST(za + zb - inter AS DOUBLE) AS jaccard
      FROM v
      WHERE CAST(inter AS DOUBLE) / CAST(za + zb - inter AS DOUBLE) >= 0.6
      ORDER BY doc_a, doc_b"""))

  // --------------------------------------------------------------- q118
  /** End-to-end ENTITY RESOLUTION — the composed chain a master-data
    * pipeline actually ships, all from existing operators: two synthetic
    * "source systems" (A: every doc, v=1, name = the q102 item key; B:
    * every even doc, v=2, the key typo'd at chars 8–9, each with
    * deterministically-missing emails) → [[graft.api.GraftOps.editDistanceJoin]]
    * blocking on the messy name → [[graft.api.GraftOps.dedupClusters]]
    * components → [[graft.api.GraftOps.goldenRecord]] field-wise
    * survivorship per entity (latest non-NULL wins: B's fresher typo
    * name wins the name, but A's email survives wherever B's is
    * missing — the field-level merge the row-level winner would lose).
    * One oracle states the whole chain (q102 blocking + q40 reach CTE +
    * q106 per-field idiom); hash-gated end to end. */
  val q118 = QueryDef("q118_entity_resolution",
    (s, dir) => {
      val d = docs(s, dir).select(col("doc_id"))
      val bk = concat(lit("item-"),
        substring(md5(expr("cast(doc_id as string)")), 1, 12))
      val a = d.select((col("doc_id") * 2).as("rec_id"), bk.as("name"),
        when(pmod(col("doc_id"), lit(5)) === 0, lit(null).cast("string"))
          .otherwise(concat(bk, lit("@a.example"))).as("email"),
        lit(1L).as("v"))
      val b = d.filter(pmod(col("doc_id"), lit(2)) === 0)
        .select((col("doc_id") * 2 + 1).as("rec_id"),
          concat(substring(bk, 1, 7), lit("zz"), substring(bk, 10, 8))
            .as("name"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit(null).cast("string"))
            .otherwise(concat(bk, lit("@b.example"))).as("email"),
          lit(2L).as("v"))
      val recs = a.unionAll(b)
      val pairs = graft.api.GraftOps.editDistanceJoin(recs, col("rec_id"),
        col("name"), maxDist = 2, gramWidth = 4, dfCap = 100)
      val clusters = graft.api.GraftOps.dedupClusters(pairs,
        col("id_a"), col("id_b"))
      val withEntity = recs
        .join(clusters, col("rec_id") === col("member"), "left_outer")
        .withColumn("entity_id", coalesce(col("survivor"), col("rec_id")))
      val golden = graft.api.GraftOps.goldenRecord(
        withEntity.select(col("entity_id"), col("v"), col("rec_id"),
          col("name"), col("email")),
        Seq(col("entity_id")), version = "v", tiebreak = "rec_id",
        fields = Seq("name", "email"))
      val sizes = withEntity.groupBy(col("entity_id"))
        .agg(count(lit(1)).as("n_records"))
      golden.join(sizes, "entity_id")
        .select(col("entity_id"), col("n_records"), col("name"),
          col("email"), col("last_v"))
        .orderBy("entity_id")
    },
    Some("""
      WITH RECURSIVE b0 AS (
        SELECT doc_id,
          concat('item-', substr(md5(CAST(doc_id AS VARCHAR)), 1, 12)) AS bk
        FROM documents),
      recs AS (
        SELECT doc_id*2 AS rec_id, bk AS name,
          CASE WHEN doc_id % 5 = 0 THEN NULL
               ELSE bk || '@a.example' END AS email,
          CAST(1 AS BIGINT) AS v
        FROM b0
        UNION ALL
        SELECT doc_id*2 + 1,
          concat(substr(bk, 1, 7), 'zz', substr(bk, 10, 8)),
          CASE WHEN doc_id % 3 = 0 THEN NULL
               ELSE bk || '@b.example' END,
          CAST(2 AS BIGINT)
        FROM b0 WHERE doc_id % 2 = 0),
      -- the full editDistanceJoin contract: gram blocking for names at
      -- or above the lemma length (12 = (2+1)*4), exact-equality
      -- distance-0 pairs below it (zero short names on this 17-char
      -- fixture — stated for operator fidelity, review r16)
      g AS (
        SELECT DISTINCT rec_id, unnest(list_transform(
          range(1, len(name) - 3 + 1),
          i -> substr(name, CAST(i AS INTEGER), 4))) AS gram
        FROM recs WHERE len(name) >= 12),
      good AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= 100),
      gf AS (SELECT rec_id, gram FROM g SEMI JOIN good USING (gram)),
      cand AS (
        SELECT DISTINCT x.rec_id AS id_a, y.rec_id AS id_b
        FROM gf x JOIN gf y ON x.gram = y.gram AND x.rec_id < y.rec_id),
      pairs AS (
        SELECT id_a, id_b FROM cand
        JOIN recs ka ON ka.rec_id = id_a
        JOIN recs kb ON kb.rec_id = id_b
        WHERE levenshtein(ka.name, kb.name) <= 2
        UNION ALL
        SELECT x.rec_id, y.rec_id
        FROM recs x JOIN recs y
          ON x.name = y.name AND x.rec_id < y.rec_id
        WHERE len(x.name) < 12),
      edges AS (
        SELECT id_a AS ea, id_b AS eb FROM pairs
        UNION SELECT id_b, id_a FROM pairs),
      reach AS (
        SELECT ea AS src, eb AS dst FROM edges
        UNION
        SELECT r.src, e.eb AS dst FROM reach r JOIN edges e ON e.ea = r.dst),
      clus AS (
        SELECT src AS member, LEAST(MIN(dst), src) AS survivor
        FROM reach GROUP BY src),
      we AS (
        SELECT recs.rec_id, recs.name, recs.email, recs.v,
          COALESCE(clus.survivor, recs.rec_id) AS entity_id
        FROM recs LEFT JOIN clus ON recs.rec_id = clus.member),
      fn AS (
        SELECT entity_id, name FROM (
          SELECT entity_id, name, row_number() OVER
            (PARTITION BY entity_id ORDER BY v DESC, rec_id DESC) AS rn
          FROM we WHERE name IS NOT NULL) WHERE rn = 1),
      fe AS (
        SELECT entity_id, email FROM (
          SELECT entity_id, email, row_number() OVER
            (PARTITION BY entity_id ORDER BY v DESC, rec_id DESC) AS rn
          FROM we WHERE email IS NOT NULL) WHERE rn = 1),
      lv AS (
        SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_records,
          max(v) AS last_v
        FROM we GROUP BY entity_id)
      SELECT lv.entity_id, lv.n_records, fn.name, fe.email, lv.last_v
      FROM lv
      LEFT JOIN fn USING (entity_id)
      LEFT JOIN fe USING (entity_id)
      ORDER BY lv.entity_id"""))

  // --------------------------------------------------------------- q144
  /** Cross-source duplication matrix over the q16 near-dup pair stream:
    * every unordered source-pair cell with exact pair counts, source
    * sizes, possible-pair mass, and integer pairs-ppm — the
    * dedup-before-mixing statistic. Exercises
    * [[graft.api.GraftOps.sourceOverlapReport]]; the oracle is the q16
    * minhash chain plus two label joins and the identical integer
    * possibility arithmetic. */
  val q144 = QueryDef("q144_source_overlap",
    (s, dir) =>
      graft.api.GraftOps.sourceOverlapReport(docs(s, dir), col("doc_id"),
          col("text"), col("source"), shingleWidth = 3, numHashes = 16,
          bands = 4, minMatches = 8)
        .orderBy("src_a", "src_b"),
    Some(s"""
      WITH ${Duck.minhashCtes},
      lab AS (SELECT doc_id, source FROM documents
              WHERE doc_id IS NOT NULL AND source IS NOT NULL),
      tg AS (
        SELECT least(x.source, y.source) AS src_a,
          greatest(x.source, y.source) AS src_b
        FROM mh_pairs p
        JOIN lab x ON p.doc_a = x.doc_id
        JOIN lab y ON p.doc_b = y.doc_id),
      sz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM lab GROUP BY 1),
      agg AS (SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
              FROM tg GROUP BY 1, 2)
      SELECT agg.src_a, agg.src_b, n_pairs,
        a.n AS n_docs_a, b.n AS n_docs_b,
        CASE WHEN agg.src_a = agg.src_b THEN (a.n * (a.n - 1)) // 2
             ELSE a.n * b.n END AS n_possible,
        (n_pairs * 1000000) // (CASE WHEN agg.src_a = agg.src_b
             THEN (a.n * (a.n - 1)) // 2 ELSE a.n * b.n END) AS pairs_ppm
      FROM agg JOIN sz a ON a.source = agg.src_a
               JOIN sz b ON b.source = agg.src_b
      ORDER BY src_a, src_b"""))

  // --------------------------------------------------------------- q151
  /** KMV distinct-sketch set algebra between sources: per source pair,
    * estimated distinct-3-shingle cardinalities of each side, the
    * estimated shingle-vocabulary intersection/union, and an integer
    * Jaccard — "how much PHRASE vocabulary do two ingestion sources
    * share", the curation complement of q144's document-pair overlap
    * (two sources can share zero near-dup documents yet heavy
    * vocabulary). The whole sketch algebra is exact BIGINT arithmetic
    * over md5-derived bottom-k hash sets, so the APPROXIMATE estimates
    * themselves hash-gate against DuckDB (the portable counterpart of
    * rows-only HLL q15b). Exercises [[graft.api.GraftOps.kmvSketch]] /
    * kmvOverlapReport. */
  val q151 = QueryDef("q151_kmv_source_overlap",
    (s, dir) => {
      val sh = docs(s, dir).select(col("source"),
        explode(Text.shingles(Text.tokens(col("text")), 3)).as("sh"))
      graft.api.GraftOps.kmvOverlapReport(sh, col("source"), col("sh"),
          k = 128)
        .orderBy("grp_a", "grp_b")
    },
    Some(s"""
      WITH t AS (SELECT source, ${Duck.toks} AS toks FROM documents),
      sr AS (SELECT source AS grp, unnest(${Duck.shingles3}) AS sh
             FROM t WHERE source IS NOT NULL),
      hs AS (SELECT DISTINCT grp, (${Duck.ph("'kmv|' || sh")} >> 20) AS h
             FROM sr),
      r AS (SELECT grp, h,
              row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
            FROM hs),
      sk AS (SELECT grp, h FROM r WHERE rn <= 128),
      th0 AS (SELECT grp, COUNT(*) AS sz, MAX(h) AS hmax FROM sk GROUP BY grp),
      th AS (SELECT grp,
               CASE WHEN sz < 128 THEN 1099511627776 ELSE hmax END AS theta,
               CASE WHEN sz < 128 THEN sz ELSE 127 END AS cnt
             FROM th0),
      t3 AS (SELECT grp, theta,
               CAST((cnt * 1099511627776) // greatest(theta, 1) AS BIGINT) AS est
             FROM th),
      p AS (SELECT a.grp AS grp_a, b.grp AS grp_b,
              least(a.theta, b.theta) AS th_min,
              a.est AS est_a, b.est AS est_b
            FROM t3 a JOIN t3 b ON a.grp < b.grp),
      na AS (SELECT grp_a, grp_b, COUNT(*) AS n_a FROM p
             JOIN sk ON sk.grp = p.grp_a AND sk.h < p.th_min GROUP BY 1, 2),
      nb AS (SELECT grp_a, grp_b, COUNT(*) AS n_b FROM p
             JOIN sk ON sk.grp = p.grp_b AND sk.h < p.th_min GROUP BY 1, 2),
      nc AS (SELECT grp_a, grp_b, COUNT(*) AS n_c FROM p
             JOIN sk x ON x.grp = p.grp_a AND x.h < p.th_min
             JOIN sk y ON y.grp = p.grp_b AND y.h = x.h GROUP BY 1, 2),
      f AS (SELECT p.grp_a, p.grp_b, p.est_a, p.est_b, p.th_min,
              COALESCE(na.n_a, 0) AS n_a, COALESCE(nb.n_b, 0) AS n_b,
              COALESCE(nc.n_c, 0) AS n_common
            FROM p LEFT JOIN na ON p.grp_a = na.grp_a AND p.grp_b = na.grp_b
                   LEFT JOIN nb ON p.grp_a = nb.grp_a AND p.grp_b = nb.grp_b
                   LEFT JOIN nc ON p.grp_a = nc.grp_a AND p.grp_b = nc.grp_b)
      SELECT grp_a, grp_b, est_a, est_b, n_common,
        CAST((n_common * 1099511627776) // greatest(th_min, 1) AS BIGINT) AS est_inter,
        CAST(((n_a + n_b - n_common) * 1099511627776) // greatest(th_min, 1) AS BIGINT) AS est_union,
        CAST((n_common * 1000000) // greatest(n_a + n_b - n_common, 1) AS BIGINT) AS jaccard_ppm
      FROM f
      ORDER BY grp_a, grp_b"""))

  // --------------------------------------------------------------- q152
  /** Winnowing fingerprint overlap (the MOSS plagiarism grain): pairs
    * of documents sharing ≥ 2 winnowed 4-gram fingerprints with set
    * sizes and integer containment — DETERMINISTIC recall (any shared
    * run of ≥ window+kgram−1 = 8 tokens is caught; MinHash q16 only
    * catches it probabilistically) at winnowed cost (~2/(window+1) of
    * positions indexed; q85's span index keeps every window).
    * Exercises [[graft.api.GraftOps.winnowFingerprints]] /
    * winnowOverlapReport (codegen'd WinnowSelect over the q85
    * positional hash). */
  val q152 = QueryDef("q152_winnow_overlap",
    (s, dir) =>
      graft.api.GraftOps.winnowOverlapReport(docs(s, dir), col("doc_id"),
          col("text"), kgram = 4, window = 5, dfCap = 100, minShared = 2)
        .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
          col("n_shared"), col("fp_a"), col("fp_b"), col("containment_ppm"))
        .orderBy("doc_a", "doc_b"),
    Some(s"""
      WITH t AS (SELECT doc_id, ${Duck.toks} AS toks FROM documents),
      sh AS (SELECT doc_id,
        CASE WHEN len(toks) >= 4
          THEN list_transform(range(1, len(toks) - 2),
            i -> array_to_string(list_slice(toks, i, i + 3), ' '))
          ELSE CAST([] AS VARCHAR[]) END AS shs FROM t),
      hs AS (SELECT doc_id,
        list_transform(shs, s -> ${Duck.ph("s")}) AS hs FROM sh),
      fp0 AS (SELECT doc_id,
        CASE WHEN len(hs) >= 1
          THEN list_distinct(list_transform(
            range(0, greatest(len(hs) - 4, 1)),
            i -> list_min(list_slice(hs, i + 1, i + 5))))
          ELSE CAST([] AS BIGINT[]) END AS fps FROM hs),
      fpr AS (SELECT doc_id, unnest(fps) AS fp FROM fp0),
      rare AS (SELECT fp FROM fpr GROUP BY fp HAVING COUNT(*) <= 100),
      ff AS (SELECT fpr.doc_id, fpr.fp FROM fpr JOIN rare USING (fp)),
      sz AS (SELECT doc_id, COUNT(*) AS nf FROM ff GROUP BY doc_id),
      pr AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               COUNT(*) AS n_shared
             FROM ff a JOIN ff b ON a.fp = b.fp AND a.doc_id < b.doc_id
             GROUP BY 1, 2 HAVING COUNT(*) >= 2)
      SELECT doc_a, doc_b, n_shared, za.nf AS fp_a, zb.nf AS fp_b,
        (n_shared * 1000000) // least(za.nf, zb.nf) AS containment_ppm
      FROM pr JOIN sz za ON doc_a = za.doc_id
              JOIN sz zb ON doc_b = zb.doc_id
      ORDER BY doc_a, doc_b"""))

  val all: Seq[QueryDef] =
    Seq(q11, q16, q17, q18, q19, q40, q41, q76, q82, q83, q85, q92, q99,
      q102, q114, q118, q144, q151, q152)
}
