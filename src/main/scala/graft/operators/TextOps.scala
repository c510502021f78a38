package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.Text

/** Text-analysis operator family (SURVEY.md §2.2 ext rows): token
  * statistics, top-k tokens, language-ID heuristic, quality scoring,
  * rolling-hash fingerprinting. All per-document features are array
  * higher-order functions (narrow, codegen'd, no shuffle); only the
  * explicit aggregations shuffle.
  */
object TextOps {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // Stopword profiles for the language-ID heuristic. The synthetic corpus
  // is English word-soup for every lang label, so this checks the MECHANISM
  // (profile scoring + deterministic argmax), not label recovery.
  private val prof: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "de" -> Seq("der", "die", "das"),
    "es" -> Seq("el", "los", "que"),
    "fr" -> Seq("le", "la", "de"))
  private def inList(xs: Seq[String]) = xs.map(x => s"'$x'").mkString("(", ", ", ")")

  // ---------------------------------------------------------------- q12
  /** Top-20 tokens per language: explode → count → ranked window top-k. */
  val q12 = QueryDef("q12_text_topk_tokens",
    (s, dir) => {
      val w = Window.partitionBy(col("lang")).orderBy(desc("n"), col("token"))
      docs(s, dir)
        .select(col("lang"), explode(Text.tokens(col("text"))).as("token"))
        .filter(col("token") =!= "")
        .groupBy(col("lang"), col("token")).agg(count(lit(1)).as("n"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select(col("lang"), col("token"), col("n"), col("rn"))
        .orderBy("lang", "rn")
    },
    Some(s"""
      SELECT lang, token, n, rn FROM (
        SELECT lang, token, n,
          CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS INTEGER) AS rn
        FROM (
          SELECT lang, token, COUNT(*) AS n
          FROM (SELECT lang, unnest(${Duck.toks}) AS token FROM documents) u
          WHERE token <> ''
          GROUP BY lang, token
        ) c
      ) ranked
      WHERE rn <= 20
      ORDER BY lang, rn"""))

  // ---------------------------------------------------------------- q22
  /** Language-ID heuristic: stopword-profile hit counts + deterministic
    * argmax (fixed precedence en > de > es > fr, 'und' when all zero). */
  val q22 = QueryDef("q22_text_langid",
    (s, dir) => {
      val base = docs(s, dir)
        .withColumn("toks", Text.tokens(col("text")))
        // all four profile counts in one codegen'd pass (ProfileCounts);
        // the per-profile size(filter(isin)) HOFs ran interpreted ×4
        .withColumn("__pc",
          graft.functions.ProfileCounts.asColumn(col("toks"), prof.map(_._2)))
      val scored = prof.zipWithIndex.foldLeft(base) { case (df, ((l, _), i)) =>
        df.withColumn(s"s_$l", element_at(col("__pc"), i + 1))
      }
      scored
        .withColumn("pred_lang",
          when(col("s_en") >= col("s_de") && col("s_en") >= col("s_es") &&
               col("s_en") >= col("s_fr") && col("s_en") > 0, "en")
          .when(col("s_de") >= col("s_es") && col("s_de") >= col("s_fr") &&
                col("s_de") > 0, "de")
          .when(col("s_es") >= col("s_fr") && col("s_es") > 0, "es")
          .when(col("s_fr") > 0, "fr")
          .otherwise("und"))
        .select(col("doc_id"), col("lang"), col("pred_lang"),
          col("s_en"), col("s_de"), col("s_es"), col("s_fr"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH t AS (SELECT doc_id, lang, ${Duck.toks} AS toks FROM documents),
      sc AS (
        SELECT doc_id, lang,
          ${prof.map { case (l, ws) =>
            s"CAST(len(list_filter(toks, tk -> tk IN ${inList(ws)})) AS INTEGER) AS s_$l"
          }.mkString(",\n          ")}
        FROM t)
      SELECT doc_id, lang,
        CASE
          WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
          WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
          WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
          WHEN s_fr > 0 THEN 'fr'
          ELSE 'und'
        END AS pred_lang,
        s_en, s_de, s_es, s_fr
      FROM sc
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q23
  /** Quality scoring: token counts, mean token length, stopword ratio,
    * type/token ratio, composite score. All ratios derive from integer
    * counts (exact), so the doubles are portable. */
  val q23 = QueryDef("q23_text_quality",
    (s, dir) =>
      graft.api.GraftOps.textQuality(docs(s, dir), col("text"))
        .select(col("doc_id"), col("n_tokens"), col("avg_token_len"),
          col("stop_ratio"), col("ttr"), col("quality_score"))
        .orderBy("doc_id"),
    Some(s"""
      WITH t AS (SELECT doc_id, ${Duck.toks} AS toks FROM documents),
      f AS (
        SELECT doc_id,
          CAST(len(toks) AS INTEGER) AS n_tokens,
          list_sum(list_transform(toks, tk -> length(tk))) AS sum_len,
          len(list_filter(toks, tk -> tk IN ('the', 'a', 'of', 'and'))) AS n_stop,
          len(list_distinct(toks)) AS n_distinct
        FROM t)
      SELECT doc_id, n_tokens,
        CAST(sum_len AS DOUBLE) / n_tokens AS avg_token_len,
        CAST(n_stop AS DOUBLE) / n_tokens AS stop_ratio,
        CAST(n_distinct AS DOUBLE) / n_tokens AS ttr,
        (CAST(sum_len AS DOUBLE) / n_tokens) * 0.2
          + (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.5
          - (CAST(n_stop AS DOUBLE) / n_tokens) * 0.3 AS quality_score
      FROM f
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q24
  /** Token counting two ways: whitespace tokens and a BPE-ish regex
    * tokenizer (letter runs capped at 4 chars, digits, punctuation) —
    * the regex subset is RE2/Java-portable. */
  val q24 = QueryDef("q24_token_stats",
    (s, dir) => {
      val pat = "[a-z]{1,4}|[0-9]|[^a-z0-9 ]"
      docs(s, dir)
        .withColumn("norm", Text.normText(col("text")))
        .withColumn("n_ws_tokens", size(split(col("norm"), " ")))
        .withColumn("n_bpe_tokens",
          size(expr(s"regexp_extract_all(norm, '$pat', 0)")))
        .withColumn("n_chars", length(col("norm")))
        .withColumn("chars_per_token",
          col("n_chars").cast("double") / col("n_ws_tokens"))
        .select(col("doc_id"), col("n_ws_tokens"), col("n_bpe_tokens"),
          col("n_chars"), col("chars_per_token"))
        .orderBy("doc_id")
    },
    Some("""
      WITH t AS (SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS norm FROM documents)
      SELECT doc_id,
        CAST(len(string_split(norm, ' ')) AS INTEGER) AS n_ws_tokens,
        CAST(len(regexp_extract_all(norm, '[a-z]{1,4}|[0-9]|[^a-z0-9 ]', 0)) AS INTEGER) AS n_bpe_tokens,
        CAST(length(norm) AS INTEGER) AS n_chars,
        CAST(length(norm) AS DOUBLE) / len(string_split(norm, ' ')) AS chars_per_token
      FROM t
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q25
  /** Document fingerprint: left-to-right rolling polynomial hash over the
    * token-hash stream, mod 1e9+7 — order-sensitive by design (detects
    * reordering that bag-of-words hashes miss). */
  val q25 = QueryDef("q25_doc_fingerprint",
    (s, dir) =>
      graft.api.GraftOps.fingerprint(docs(s, dir), col("text"))
        .select(col("doc_id"), col("fingerprint"))
        .orderBy("doc_id"),
    Some(s"""
      WITH t AS (SELECT doc_id, ${Duck.toks} AS toks FROM documents)
      SELECT doc_id,
        list_reduce(
          [CAST(0 AS BIGINT)] || list_transform(toks, tk -> ${Duck.ph("'0|' || tk")} % 1000000007),
          (acc, h) -> (acc * 31 + h) % 1000000007) AS fingerprint
      FROM t
      ORDER BY doc_id"""))

  // ---------------------------------------------------------- q70/q70b
  /** Adjacent token bigrams (1-based positions i, i+1; pairs with an
    * empty side dropped) — the high-cardinality key space the heavy-
    * hitter tiers aggregate. Mirrors the oracle's list_transform over
    * range(1, len) exactly.
    *
    * Takes the TOKEN ARRAY, not the raw text: the caller must
    * materialize `Text.tokens` in its own projection first. Inlining
    * the tokenizer here repeats the full regex split for every
    * element_at reference inside the HOF lambda (Spark does not
    * common-subexpression-eliminate across lambda bodies) — measured
    * 27x slower at sf0.1 (15.8 s vs 0.6 s for the explode). */
  private def bigrams(tk: Column): Column =
    when(size(tk) >= 2,
      filter(
        transform(sequence(lit(1), size(tk) - 1),
          i => when(element_at(tk, i) =!= "" && element_at(tk, i + 1) =!= "",
            concat(element_at(tk, i), lit(" "), element_at(tk, i + 1)))),
        x => x.isNotNull))
      .otherwise(array().cast("array<string>"))

  /** One bigram per row, tokens materialized in their own projection
    * (see [[bigrams]]). */
  private def bigramRows(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(Text.tokens(col("text")).as("__tk"))
      .select(explode(bigrams(col("__tk"))).as("bg"))

  private val HH_THR_PPM = 1200L
  private val hhOracle = s"""
      WITH t AS (SELECT ${Duck.toks} AS tk FROM documents),
      b AS (SELECT unnest(list_filter(list_transform(range(1, len(tk)),
          i -> CASE WHEN tk[i] <> '' AND tk[i+1] <> '' THEN tk[i] || ' ' || tk[i+1] ELSE NULL END),
          x -> x IS NOT NULL)) AS bg FROM t),
      c AS (SELECT bg, COUNT(*) AS n FROM b GROUP BY bg),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
      SELECT bg, n, (n * 1000000) // total AS ppm
      FROM c, tot
      WHERE n * 1000000 >= $HH_THR_PPM * total
      ORDER BY n DESC, bg"""

  /** Exact heavy hitters over token bigrams: every bigram holding at
    * least 1200 ppm of all bigram instances, with exact count and
    * integer-ppm share (all-integer arithmetic — portable). One full
    * hash agg over the bigram vocabulary: the correctness baseline. */
  val q70 = QueryDef("q70_heavy_hitters",
    (s, dir) =>
      graft.api.GraftOps.heavyHitters(bigramRows(s, dir), col("bg"),
          thrPpm = HH_THR_PPM)
        .withColumnRenamed("key", "bg")
        .orderBy(desc("n"), col("bg")),
    Some(hhOracle))

  /** Sketch-tier heavy hitters: Misra–Gries summary (capacity 1024 —
    * per-task state is 1024 pairs, never the vocabulary) finds the
    * candidate superset, one exact recount pass makes the answer EXACT —
    * bit-equal to q70, so the SAME oracle gates both tiers. */
  val q70b = QueryDef("q70b_heavy_hitters_sketch",
    (s, dir) =>
      graft.api.GraftOps.heavyHittersSketch(bigramRows(s, dir), col("bg"),
          thrPpm = HH_THR_PPM, capacity = 1024)
        .withColumnRenamed("key", "bg")
        .orderBy(desc("n"), col("bg")),
    Some(hhOracle))

  // --------------------------------------------------------------- q150
  /** Count-min sketch adjudication over the SAME bigram stream as q70:
    * the exact top-20 bigrams with true count, the CMS (depth 4 ×
    * width 256, md5 hash family) estimate, and the overcount. Every
    * counter is deterministic in both engines, so — uniquely among the
    * approximate tiers — the sketch path itself hash-gates (HLL q15b /
    * GK q29b stay rows-only by register opacity). Exercises
    * [[graft.api.GraftOps.cmsSketch]] / cmsQuery / cmsFrequencyReport. */
  val q150 = QueryDef("q150_cms_frequency",
    (s, dir) =>
      graft.api.GraftOps.cmsFrequencyReport(bigramRows(s, dir), col("bg"),
          depth = 4, width = 256, topN = 20)
        .withColumnRenamed("key", "bg")
        .orderBy(desc("n"), col("bg")),
    Some(s"""
      WITH t AS (SELECT ${Duck.toks} AS tk FROM documents),
      b AS (SELECT unnest(list_filter(list_transform(range(1, len(tk)),
          i -> CASE WHEN tk[i] <> '' AND tk[i+1] <> '' THEN tk[i] || ' ' || tk[i+1] ELSE NULL END),
          x -> x IS NOT NULL)) AS bg FROM t),
      cnt AS (SELECT bg, COUNT(*) AS n FROM b GROUP BY bg),
      top AS (SELECT bg, n FROM cnt ORDER BY n DESC, bg LIMIT 20),
      cells AS (
        SELECT d.j, ${Duck.ph("'cms' || CAST(d.j AS VARCHAR) || '|' || bg")} % 256 AS bucket,
          COUNT(*) AS c
        FROM b, (SELECT unnest(range(0, 4)) AS j) d
        GROUP BY 1, 2),
      est AS (
        SELECT tp.bg, MIN(COALESCE(c.c, 0)) AS est
        FROM top tp CROSS JOIN (SELECT unnest(range(0, 4)) AS j) d
        LEFT JOIN cells c ON c.j = d.j
          AND c.bucket = ${Duck.ph("'cms' || CAST(d.j AS VARCHAR) || '|' || tp.bg")} % 256
        GROUP BY tp.bg)
      SELECT tp.bg, tp.n, e.est, e.est - tp.n AS overcount
      FROM top tp JOIN est e ON tp.bg = e.bg
      ORDER BY tp.n DESC, tp.bg"""))

  // --------------------------------------------------------------- q156
  /** Proximity-scored retrieval over the q112 query set: top-5 docs per
    * query by the number of distinct query-term PAIRS co-occurring
    * within 6 token positions (then matched-term count, then doc id) —
    * the relevance grain between position-blind BM25 (q112) and
    * adjacency-strict phrase match (q142). The doc-side co-occurrence
    * set is query-independent and O(n·window) by construction (each
    * position equi-joins its next 6 — never a per-(query, doc)
    * position self-join, which ground to a halt on this fixture's
    * degenerate ~150-word vocabulary at sf1). All integers. Exercises
    * [[graft.api.GraftOps.proximityTopK]]. */
  val q156 = QueryDef("q156_proximity_topk",
    (s, dir) => {
      val d = docs(s, dir)
      graft.api.GraftOps.proximityTopK(d, col("doc_id"), col("text"),
          bmQueries(d), col("qid"), col("qtext"), window = 6, k = 5)
        .orderBy("query_id", "rank")
    },
    Some(s"""
      WITH t AS (SELECT doc_id, ${Duck.toks} AS toks FROM documents),
      qt AS (SELECT doc_id // 50 AS qid,
               unnest(list_distinct(list_slice(
                 list_filter(toks, x -> x <> ''), 1, 4))) AS t
             FROM t WHERE doc_id % 50 = 0),
      vocab AS (SELECT DISTINCT t FROM qt),
      post AS (SELECT doc_id, toks[i] AS t, i AS pos
               FROM t, unnest(range(1, len(toks) + 1)) AS u(i)
               WHERE toks[i] <> ''
                 AND toks[i] IN (SELECT t FROM vocab)),
      dp AS (SELECT DISTINCT a.doc_id,
               least(a.t, b.t) AS ta, greatest(a.t, b.t) AS tb
             FROM post a JOIN post b
               ON b.doc_id = a.doc_id
              AND b.pos > a.pos AND b.pos <= a.pos + 6
              AND a.t <> b.t),
      qp AS (SELECT x.qid, x.t AS ta, y.t AS tb
             FROM qt x JOIN qt y ON x.qid = y.qid AND x.t < y.t),
      prox AS (SELECT qp.qid, dp.doc_id,
                 CAST(COUNT(*) AS BIGINT) AS n_prox_pairs
               FROM dp JOIN qp ON dp.ta = qp.ta AND dp.tb = qp.tb
               GROUP BY 1, 2),
      terms AS (SELECT q.qid, p.doc_id,
                  CAST(COUNT(*) AS BIGINT) AS n_terms
                FROM (SELECT DISTINCT doc_id, t FROM post) p
                JOIN qt q ON p.t = q.t
                GROUP BY 1, 2),
      r AS (SELECT t2.qid, t2.doc_id,
              COALESCE(p2.n_prox_pairs, 0) AS n_prox_pairs, t2.n_terms,
              CAST(row_number() OVER (PARTITION BY t2.qid
                ORDER BY COALESCE(p2.n_prox_pairs, 0) DESC,
                         t2.n_terms DESC, t2.doc_id) AS INTEGER) AS rank
            FROM terms t2 LEFT JOIN prox p2
              ON t2.qid = p2.qid AND t2.doc_id = p2.doc_id)
      SELECT qid AS query_id, doc_id, rank, n_prox_pairs, n_terms
      FROM r WHERE rank <= 5
      ORDER BY query_id, rank"""))

  // ---------------------------------------------------------------- q73
  /** Robust per-language length outliers: |len − median| / MAD > 2.0 —
    * the quality screen for truncated/concatenated documents that a
    * mean/stddev z-score would miss once the outliers drag the mean.
    * Exercises [[graft.api.GraftOps.robustOutliers]] (exact interpolated
    * medians, q29's portable aggregate; per-group stats broadcast). */
  val q73 = QueryDef("q73_group_outliers",
    (s, dir) =>
      graft.api.GraftOps.robustOutliers(
          docs(s, dir).select(col("doc_id"), col("lang"),
            length(col("text")).cast("double").as("len")),
          col("lang"), col("len"))
        .filter(col("score") > 2.0)
        .select(col("doc_id"), col("lang"), col("len"), col("med"),
          col("mad"), col("score"))
        .orderBy("doc_id"),
    Some("""
      WITH d AS (SELECT doc_id, lang, CAST(length(text) AS DOUBLE) AS len FROM documents),
      m AS (SELECT lang, quantile_cont(len, 0.5) AS med FROM d GROUP BY lang),
      a AS (SELECT d.doc_id, d.lang, d.len, m.med FROM d JOIN m USING (lang)),
      s AS (SELECT lang, quantile_cont(abs(len - med), 0.5) AS mad FROM a GROUP BY lang),
      f AS (SELECT a.doc_id, a.lang, a.len, a.med, s.mad,
              CASE WHEN s.mad > 0 THEN abs(a.len - a.med) / s.mad END AS score
            FROM a JOIN s USING (lang))
      SELECT doc_id, lang, len, med, mad, score
      FROM f WHERE score > 2.0
      ORDER BY doc_id"""))

  // ---------------------------------------------------------------- q77
  /** Lift-ranked collocations over the q70 bigram space: top-100 bigrams
    * by observed-over-expected co-occurrence (PMI without the log — the
    * ranking is identical and the arithmetic oracle-portable), with the
    * min-count floor that keeps rare-pair noise out. Exercises
    * [[graft.api.GraftOps.collocations]]. */
  val q77 = QueryDef("q77_collocations",
    (s, dir) =>
      graft.api.GraftOps.collocations(bigramRows(s, dir), col("bg"),
          minCount = 20, k = 100)
        .orderBy(desc("lift"), col("bg")),
    Some(s"""
      WITH t AS (SELECT ${Duck.toks} AS tk FROM documents),
      b AS (SELECT unnest(list_filter(list_transform(range(1, len(tk)),
          i -> CASE WHEN tk[i] <> '' AND tk[i+1] <> '' THEN tk[i] || ' ' || tk[i+1] ELSE NULL END),
          x -> x IS NOT NULL)) AS bg FROM t),
      c AS (SELECT bg, COUNT(*) AS n,
              string_split(bg, ' ')[1] AS w1, string_split(bg, ' ')[2] AS w2
            FROM b GROUP BY bg),
      m1 AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS n1 FROM c GROUP BY w1),
      m2 AS (SELECT w2, CAST(SUM(n) AS BIGINT) AS n2 FROM c GROUP BY w2),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
      SELECT c.bg, c.n, m1.n1, m2.n2,
        CAST(c.n AS DOUBLE) * CAST(tot.total AS DOUBLE)
          / (CAST(m1.n1 AS DOUBLE) * CAST(m2.n2 AS DOUBLE)) AS lift
      FROM c JOIN m1 USING (w1) JOIN m2 USING (w2), tot
      WHERE c.n >= 20
      ORDER BY lift DESC, bg
      LIMIT 100"""))

  // ---------------------------------------------------------------- q86
  private val CHUNK_MAX = 20
  private val CHUNK_STRIDE = 15

  /** Document chunking into overlapping fixed-token windows (maxTokens=20,
    * stride=15 ⇒ 5-token overlap) — the windowing step in front of
    * embedding/training pipelines. Chunk count is exact integer
    * ceil-division, chunk text is a deterministic token slice, so every
    * chunk of every document hash-matches DuckDB. */
  val q86 = QueryDef("q86_chunk_documents",
    (s, dir) =>
      graft.api.GraftOps.chunkDocuments(docs(s, dir), col("doc_id"),
          col("text"), maxTokens = CHUNK_MAX, stride = CHUNK_STRIDE)
        .orderBy("doc_id", "chunk_id"),
    Some(s"""
      WITH t AS (
        SELECT doc_id, ${Duck.toks} AS toks FROM documents),
      n AS (
        SELECT doc_id, toks, CAST(len(toks) AS INTEGER) AS n FROM t),
      c AS (
        SELECT doc_id, toks,
          CASE WHEN n <= $CHUNK_MAX THEN 1
               ELSE 1 + (n - $CHUNK_MAX + ${CHUNK_STRIDE - 1}) // $CHUNK_STRIDE
          END AS nc
        FROM n),
      e AS (
        SELECT doc_id, toks, CAST(unnest(range(0, nc)) AS INTEGER) AS chunk_id
        FROM c),
      s AS (
        SELECT doc_id, chunk_id,
          list_slice(toks, chunk_id * $CHUNK_STRIDE + 1,
            chunk_id * $CHUNK_STRIDE + $CHUNK_MAX) AS ct
        FROM e)
      SELECT doc_id, chunk_id,
        CAST(len(ct) AS INTEGER) AS n_chunk_tokens,
        array_to_string(ct, ' ') AS chunk_text
      FROM s
      ORDER BY doc_id, chunk_id"""))

  // --------------------------------------------------------------- q101
  /** Intra-document repeated-segment trim (Gopher-style boilerplate
    * removal as a TRANSFORM — q38 only scores): 10-token segments,
    * duplicates within one document dropped, first kept. Both engines
    * plant the repetition deterministically (every 4th doc re-appends
    * its own first 20 tokens after truncation to a segment boundary) so
    * the trim path is hash-gated: planted docs lose exactly their 2
    * planted segments unless the doc already repeated itself. Pure
    * narrow — zero shuffles (chunkDocuments posture). */
  val q101 = QueryDef("q101_segment_dedup_trim",
    (s, dir) => {
      val base = docs(s, dir)
        .withColumn("__bt", expr(
          "slice(split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' '), " +
            "1, (size(split(regexp_replace(lower(trim(text)), '\\\\s+', ' '), ' ')) div 10) * 10)"))
        .withColumn("ptext",
          when(pmod(col("doc_id"), lit(4)) === 0,
            concat_ws(" ", array_join(col("__bt"), " "),
              array_join(slice(col("__bt"), 1, 20), " ")))
          .otherwise(array_join(col("__bt"), " ")))
      graft.api.GraftOps.trimRepeatedSegments(base, col("ptext"), width = 10)
        .select(col("doc_id"), col("n_segs"), col("n_kept"), col("trimmed_text"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH t AS (
        SELECT doc_id, ${Duck.toks} AS toks FROM documents),
      b AS (
        SELECT doc_id, list_slice(toks, 1, (len(toks) // 10) * 10) AS bt FROM t),
      x AS (
        SELECT doc_id,
          CASE WHEN doc_id % 4 = 0 THEN list_concat(bt, list_slice(bt, 1, 20))
               ELSE bt END AS toks2
        FROM b),
      sg AS (
        SELECT doc_id, toks2,
          list_transform(range(1, CAST((len(toks2) + 9) // 10 AS INTEGER) + 1),
            i -> array_to_string(list_slice(toks2, (i - 1) * 10 + 1, i * 10), ' ')) AS segs
        FROM x),
      k AS (
        SELECT doc_id, len(segs) AS n_segs,
          list_filter(segs, (s, i) -> list_position(segs, s) = i) AS kept
        FROM sg)
      SELECT doc_id, n_segs, len(kept) AS n_kept,
        array_to_string(kept, ' ') AS trimmed_text
      FROM k ORDER BY doc_id"""))

  // --------------------------------------------------------------- q109
  /** Frequency-vocabulary build + token-id encoding — the step that
    * turns a curated text corpus into model input: top-512 tokens get
    * dense ids 0..511 by (count desc, token asc), every document's
    * token stream re-expresses as `array<int>` with −1 for
    * out-of-vocabulary. The WHOLE id assignment (including boundary
    * ties) and every encoded id of every document are hash-gated —
    * both engines state the same count→rank→map-lookup chain
    * ([[graft.api.GraftOps.buildVocab]] /
    * [[graft.api.GraftOps.encodeTokens]]; DuckDB rebuilds the map with
    * `map(list, list)` and probes it per token). Encoding never
    * shuffles the corpus — the vocab collapses to one broadcast map
    * row and the lookup is a per-row HOF transform. */
  val q109 = QueryDef("q109_vocab_encode",
    (s, dir) => {
      val t = docs(s, dir)
        .select(col("doc_id"), Text.tokens(col("text")).as("toks"))
      val vocab = graft.api.GraftOps.buildVocab(t, col("toks"), topK = 512)
      graft.api.GraftOps.encodeTokens(t, col("toks"), vocab, oovId = -1)
        .select(col("doc_id"),
          size(col("token_ids")).as("n_tokens"),
          size(filter(col("token_ids"), i => i === -1)).as("n_oov"),
          // the gate canonicalizes scalars only — ship the ids joined
          array_join(transform(col("token_ids"), i => i.cast("string")), ",")
            .as("ids_csv"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH t AS (SELECT doc_id, ${Duck.toks} AS toks FROM documents),
      tok AS (SELECT unnest(toks) AS token FROM t),
      counts AS (SELECT token, count(*) AS n FROM tok GROUP BY token),
      vocab AS (
        SELECT token,
          CAST(row_number() OVER (ORDER BY n DESC, token) - 1 AS INTEGER)
            AS token_id
        FROM counts ORDER BY n DESC, token LIMIT 512),
      m AS (
        SELECT map(list(token ORDER BY token_id),
                   list(token_id ORDER BY token_id)) AS mm
        FROM vocab)
      SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_tokens,
        CAST(len(list_filter(toks, x -> mm[x][1] IS NULL)) AS INTEGER)
          AS n_oov,
        array_to_string(list_transform(toks,
          x -> CAST(coalesce(mm[x][1], -1) AS INTEGER)), ',') AS ids_csv
      FROM t, m
      ORDER BY doc_id"""))

  // --------------------------------------------------------------- q110
  /** Markup→text extraction over a deterministically synthesized HTML
    * wrapper (the q99/q100 planted-structure idiom): each doc's text is
    * entity-ESCAPED (& → &amp;, < → &lt;) and embedded in a full page —
    * script block (containing raw `<` and `&&` that must vanish with
    * the block, not leak into the tag-strip), style block, attributed
    * tags, newlines, a literal `&copy;` (outside the decode set — must
    * pass through) and a literal `&amp;lt;` (must single-decode to
    * `&lt;`, never double-decode to `<`). Both engines state the same
    * seven steps ([[graft.api.GraftOps.extractText]]), so the whole
    * extraction chain is hash-gated end to end. Pure narrow — zero
    * shuffles. */
  val q110 = QueryDef("q110_markup_extract",
    (s, dir) => {
      val esc = docs(s, dir).withColumn("__esc",
        expr("replace(replace(text, '&', '&amp;'), '<', '&lt;')"))
      val html = esc.withColumn("markup", concat(
        lit("<html><head><title>d"), col("doc_id").cast("string"),
        lit("</title><script type=\"text/javascript\">var x = 1 < 2 && true;</script>" +
          "<style media=\"all\">p { color: red; }</style></head><body><h1>Doc "),
        col("doc_id").cast("string"),
        lit("</h1>\n<p>"), col("__esc"),
        lit("</p>\n<div class=\"footer\">&copy; 2024 &amp; Co. &amp;lt;tm&amp;gt;</div></body></html>")))
      graft.api.GraftOps.extractText(html, col("markup"))
        .select(col("doc_id"), length(col("extracted")).as("ex_len"),
          col("extracted"))
        .orderBy("doc_id")
    },
    Some("""
      WITH esc AS (
        SELECT doc_id,
          replace(replace(text, '&', '&amp;'), '<', '&lt;') AS e
        FROM documents),
      h AS (
        SELECT doc_id,
          '<html><head><title>d' || CAST(doc_id AS VARCHAR) ||
          '</title><script type="text/javascript">var x = 1 < 2 && true;</script>' ||
          '<style media="all">p { color: red; }</style></head><body><h1>Doc ' ||
          CAST(doc_id AS VARCHAR) || '</h1>' || chr(10) || '<p>' || e ||
          '</p>' || chr(10) ||
          '<div class="footer">&copy; 2024 &amp; Co. &amp;lt;tm&amp;gt;</div></body></html>'
            AS m
        FROM esc),
      x1 AS (SELECT doc_id,
        regexp_replace(m, '(?is)<script[^>]*>.*?</script>', ' ', 'g') AS t
        FROM h),
      x2 AS (SELECT doc_id,
        regexp_replace(t, '(?is)<style[^>]*>.*?</style>', ' ', 'g') AS t
        FROM x1),
      x3 AS (SELECT doc_id, regexp_replace(t, '<[^>]*>', ' ', 'g') AS t
        FROM x2),
      d AS (SELECT doc_id,
        replace(replace(replace(replace(replace(t,
          '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
          '&amp;', '&') AS t
        FROM x3),
      f AS (SELECT doc_id,
        trim(regexp_replace(t, '[ \t\n\r\f]+', ' ', 'g')) AS extracted
        FROM d)
      SELECT doc_id, CAST(length(extracted) AS INTEGER) AS ex_len, extracted
      FROM f ORDER BY doc_id"""))

  // --------------------------------------------------------------- q112
  /** BM25-style retrieval: every 50th doc's first four tokens become a
    * query; top-5 docs per query by the log-free Okapi score
    * ([[graft.api.GraftOps.bm25TopK]] — rational RSJ idf, fixed-order
    * IEEE chain, sorted per-(query, doc) term fold). Both rank AND the
    * micros-quantized score hash-match: every arithmetic step is stated
    * identically on both engines, so the fold produces bit-equal
    * doubles. The query's own source doc ranks (it contains its terms)
    * but need not win — ~5% exact-dup docs and tf/dl variation make the
    * leaderboard non-trivial. */
  /** The q112 BM25 CTE chain through ranked candidates `r` — shared with
    * q115's fusion oracle so both gates state the identical scoring. */
  private val bm25Cte: String = s"""
      t AS (SELECT doc_id,
        list_filter(${Duck.toks}, x -> x <> '') AS toks FROM documents
        WHERE doc_id IS NOT NULL),
      tok AS (SELECT doc_id, unnest(toks) AS t FROM t),
      tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
             FROM tok GROUP BY 1, 2),
      dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl
             FROM tf GROUP BY 1),
      st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(dl) AS BIGINT) AS tot FROM dl),
      dfq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
      qt AS (SELECT DISTINCT doc_id // 50 AS qid,
               unnest(list_slice(toks, 1, 4)) AS t
             FROM t WHERE doc_id % 50 = 0),
      c AS (SELECT qid, tf.doc_id, tf.t,
              (CAST((n - df)*2 + 1 AS DOUBLE) / CAST(df*2 + 1 AS DOUBLE))
              * ((tf * (1200000.0/1000000.0 + 1.0))
                 / (tf + (1200000.0/1000000.0)
                    * ((1.0 - 750000.0/1000000.0)
                       + (750000.0/1000000.0)
                         * (CAST(dl.dl * n AS DOUBLE) / CAST(tot AS DOUBLE)))))
                AS c
            FROM qt JOIN tf USING (t) JOIN dfq USING (t)
            JOIN dl ON dl.doc_id = tf.doc_id, st),
      s2 AS (SELECT qid, doc_id,
               list_reduce(list_transform(
                 list_sort(list(struct_pack(t := t, c := c))), x -> x.c),
                 (a, b2) -> a + b2) AS score
             FROM c GROUP BY 1, 2),
      r AS (SELECT qid, doc_id, score,
              row_number() OVER (PARTITION BY qid
                ORDER BY score DESC, doc_id) AS rank
            FROM s2)"""

  /** The q112/q115 query batch: every 50th doc's first four tokens. */
  private def bmQueries(d: DataFrame): DataFrame =
    d.filter(pmod(col("doc_id"), lit(50)) === 0)
      .select(expr("doc_id div 50").as("qid"),
        concat_ws(" ", slice(
          filter(Text.tokens(col("text")), t => t =!= lit("")),
          1, 4)).as("qtext"))

  val q112 = QueryDef("q112_bm25_topk",
    (s, dir) => {
      val d = docs(s, dir)
      graft.api.GraftOps.bm25TopK(d, col("doc_id"), col("text"),
          bmQueries(d), col("qid"), col("qtext"), k = 5)
        .withColumn("score_us", floor(col("score") * lit(1000000.0)))
        .drop("score")
        .orderBy("query_id", "rank")
    },
    Some(s"""
      WITH $bm25Cte
      SELECT qid AS query_id, doc_id, rank,
        CAST(floor(score * 1000000.0) AS BIGINT) AS score_us
      FROM r WHERE rank <= 5
      ORDER BY query_id, rank"""))

  // --------------------------------------------------------------- q115
  /** Hybrid-retrieval fusion: the q112 BM25 top-20 fused with a static
    * quality prior (global top-20 docs by length, replicated per query —
    * how a calibration-free prior actually enters an RRF mix) via
    * [[graft.api.GraftOps.rrfFuse]]. Both engines state the identical
    * BM25 CTE (shared string), the identical prior ranking, and the
    * identical index-ordered contribution fold, so fused rank AND
    * micros-quantized RRF score hash-gate end to end. */
  val q115 = QueryDef("q115_rrf_fusion",
    (s, dir) => {
      val d = docs(s, dir)
      val qs = bmQueries(d)
      val bm = graft.api.GraftOps.bm25TopK(d, col("doc_id"), col("text"),
          qs, col("qid"), col("qtext"), k = 20)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val w = Window.orderBy(desc("n_chars"), col("doc_id"))
      val prior20 = d.select(col("doc_id"), col("n_chars"))
        .orderBy(desc("n_chars"), col("doc_id")).limit(20)
        .withColumn("rank", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("rank"))
      val prior = qs.select(col("qid").as("query_id")).crossJoin(prior20)
        .select(col("query_id"), col("doc_id"), col("rank"))
      graft.api.GraftOps.rrfFuse(Seq(bm, prior), topK = 10)
        .withColumn("rrf_us", floor(col("rrf") * lit(1000000.0)))
        .drop("rrf")
        .orderBy("query_id", "rank")
    },
    Some(s"""
      WITH $bm25Cte,
      bm AS (SELECT qid AS query_id, doc_id, rank FROM r WHERE rank <= 20),
      pr AS (SELECT doc_id, CAST(row_number() OVER
               (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
             FROM documents QUALIFY rank <= 20),
      qids AS (SELECT DISTINCT doc_id // 50 AS query_id
               FROM documents WHERE doc_id % 50 = 0),
      u AS (
        SELECT query_id, doc_id, 0 AS src,
          1.0 / CAST(rank + 60 AS DOUBLE) AS c FROM bm
        UNION ALL
        SELECT q.query_id, p.doc_id, 1 AS src,
          1.0 / CAST(p.rank + 60 AS DOUBLE) AS c FROM qids q, pr p),
      f AS (SELECT query_id, doc_id,
              list_reduce(list_transform(
                list_sort(list(struct_pack(s := src, c := c))), x -> x.c),
                (a, b2) -> a + b2) AS rrf
            FROM u GROUP BY 1, 2),
      fr AS (SELECT query_id, doc_id, rrf,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY rrf DESC, doc_id) AS rank
             FROM f)
      SELECT query_id, doc_id, rank,
        CAST(floor(rrf * 1000000.0) AS BIGINT) AS rrf_us
      FROM fr WHERE rank <= 10
      ORDER BY query_id, rank"""))

  // --------------------------------------------------------------- q158
  /** Rank-biased overlap between the q112 BM25 top-20 and the q115
    * static length-prior top-20 (p = 0.9, depth 20) — "how much did
    * relevance ranking change the prior's order", per query: the
    * measurement companion of q115's fusion over the SAME two
    * rankings. The p-powers come from repeated multiplication inside
    * one pinned ascending fold, so the float score hash-gates against
    * the oracle's recursive CTE stepping the identical recurrence.
    * Exercises [[graft.api.GraftOps.rboCompare]]. */
  val q158 = QueryDef("q158_rbo_rankings",
    (s, dir) => {
      val d = docs(s, dir)
      val qs = bmQueries(d)
      val bm = graft.api.GraftOps.bm25TopK(d, col("doc_id"), col("text"),
          qs, col("qid"), col("qtext"), k = 20)
        .select(col("query_id"), col("doc_id"), col("rank"))
      val w = Window.orderBy(desc("n_chars"), col("doc_id"))
      val prior20 = d.select(col("doc_id"), col("n_chars"))
        .orderBy(desc("n_chars"), col("doc_id")).limit(20)
        .withColumn("rank", row_number().over(w).cast("long"))
        .select(col("doc_id"), col("rank"))
      val prior = qs.select(col("qid").as("query_id")).crossJoin(prior20)
        .select(col("query_id"), col("doc_id"), col("rank"))
      graft.api.GraftOps.rboCompare(bm, prior, col("query_id"),
          col("doc_id"), col("rank"), pPpm = 900000L, depth = 20)
        .withColumn("rbo_us", floor(col("rbo") * lit(1000000.0)))
        .drop("rbo")
        .orderBy("query_id")
    },
    Some(s"""
      WITH RECURSIVE $bm25Cte,
      bm AS (SELECT qid AS query_id, doc_id, rank FROM r WHERE rank <= 20),
      pr AS (SELECT doc_id, CAST(row_number() OVER
               (ORDER BY n_chars DESC, doc_id) AS BIGINT) AS rank
             FROM documents QUALIFY rank <= 20),
      qids AS (SELECT DISTINCT doc_id // 50 AS query_id
               FROM documents WHERE doc_id % 50 = 0),
      pb AS (SELECT q.query_id, p.doc_id, p.rank FROM qids q, pr p),
      la0 AS (SELECT query_id, list_transform(list_sort(list(
                struct_pack(r := rank, d := CAST(doc_id AS VARCHAR)))),
                x -> x.d) AS la
              FROM bm GROUP BY 1),
      lb0 AS (SELECT query_id, list_transform(list_sort(list(
                struct_pack(r := rank, d := CAST(doc_id AS VARCHAR)))),
                x -> x.d) AS lb
              FROM pb GROUP BY 1),
      j AS MATERIALIZED (SELECT la0.query_id, list_slice(la, 1, 20) AS la,
              list_slice(lb, 1, 20) AS lb
            FROM la0 JOIN lb0 ON la0.query_id = lb0.query_id),
      -- MATERIALIZED: the recursion below references ov once per level;
      -- left inline, DuckDB re-evaluates the whole bm25 chain per level
      -- (OOM at sf1)
      ov AS MATERIALIZED (SELECT j.query_id, d.i,
               CAST(len(list_intersect(list_slice(j.la, 1, d.i),
                 list_slice(j.lb, 1, d.i))) AS INTEGER) AS inter
             FROM j, (SELECT unnest(range(1, 21)) AS i) d),
      rec AS (
        SELECT o.query_id, o.i,
          CAST(1.0 AS DOUBLE) * (CAST(900000 AS DOUBLE) / 1000000.0) AS pw,
          CAST(0.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) *
            (CAST(o.inter AS DOUBLE) / CAST(o.i AS DOUBLE)) AS s
        FROM ov o WHERE o.i = 1
        UNION ALL
        SELECT o.query_id, o.i,
          r2.pw * (CAST(900000 AS DOUBLE) / 1000000.0),
          r2.s + r2.pw * (CAST(o.inter AS DOUBLE) / CAST(o.i AS DOUBLE))
        FROM ov o JOIN rec r2
          ON o.query_id = r2.query_id AND o.i = r2.i + 1)
      SELECT j.query_id,
        CAST(len(j.la) AS INTEGER) AS n_a,
        CAST(len(j.lb) AS INTEGER) AS n_b,
        CAST(len(list_intersect(j.la, j.lb)) AS INTEGER) AS overlap_at_depth,
        CAST(floor(((1.0 - (CAST(900000 AS DOUBLE) / 1000000.0)) * rec.s)
          * 1000000.0) AS BIGINT) AS rbo_us
      FROM j JOIN rec ON j.query_id = rec.query_id AND rec.i = 20
      ORDER BY j.query_id"""))

  // --------------------------------------------------------------- q122
  /** Blocklist scoring over the documents corpus: per-document hit
    * count, distinct matched terms, and exact integer-ppm density for
    * a six-term lexicon (here a literal fixture; the operator takes a
    * TABLE precisely so real 10⁵-term blocklists never embed in the
    * plan). Exercises [[graft.api.GraftOps.lexiconScore]]. */
  val q122 = QueryDef("q122_lexicon_score",
    (s, dir) => {
      import s.implicits._
      val lex = Seq("slow", "merge", "filter", "stream", "big", "vector")
        .toDF("term")
      graft.api.GraftOps.lexiconScore(docs(s, dir), col("doc_id"),
          col("text"), lex, col("term"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH lex AS (
        SELECT * FROM (VALUES ('slow'), ('merge'), ('filter'),
          ('stream'), ('big'), ('vector')) AS v(term)),
      t AS (
        SELECT doc_id, ${Duck.toks} AS tk
        FROM documents),
      base AS (
        SELECT doc_id,
          CASE WHEN tk = ['']
               THEN 0 ELSE CAST(len(tk) AS INTEGER) END AS n_tokens
        FROM t),
      m AS (
        SELECT t.doc_id, u.tok
        FROM t, unnest(t.tk) AS u(tok)
        WHERE u.tok IN (SELECT term FROM lex)),
      h AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS hits,
          CAST(count(DISTINCT tok) AS BIGINT) AS n_terms
        FROM m GROUP BY 1)
      SELECT base.doc_id, base.n_tokens,
        COALESCE(h.hits, 0) AS hits, COALESCE(h.n_terms, 0) AS n_terms,
        CASE WHEN base.n_tokens > 0
             THEN (COALESCE(h.hits, 0) * 1000000) // base.n_tokens
             ELSE 0 END AS hits_ppm
      FROM base LEFT JOIN h USING (doc_id)
      ORDER BY doc_id"""))

  // -------------------------------------------------------------- q142
  /** Exact positional phrase matching over the corpus — two bigrams the
    * fixture actually contains plus a trigram extension of one: per
    * (doc, phrase) contiguous-window match counts, matches-only.
    * Exercises [[graft.api.GraftOps.phraseMatch]] (phrases are plan
    * literals; one codegen'd fold per row, zero shuffle). */
  val q142 = QueryDef("q142_phrase_match",
    (s, dir) =>
      graft.api.GraftOps.phraseMatch(docs(s, dir), col("doc_id"),
          col("text"), Seq(Seq("table", "hash"), Seq("customer", "join"),
            Seq("part", "filter", "small")))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id", "phrase"),
    Some(s"""
      WITH t AS (
        SELECT doc_id, ${Duck.toks} AS toks FROM documents),
      p(phrase, ph) AS (VALUES
        ('table hash', ['table', 'hash']),
        ('customer join', ['customer', 'join']),
        ('part filter small', ['part', 'filter', 'small'])),
      m AS (
        SELECT doc_id, phrase,
          CAST(CASE WHEN len(toks) >= len(ph)
            THEN len(list_filter(range(1, len(toks) - len(ph) + 2),
              j -> list_slice(toks, j, j + len(ph) - 1) = ph))
            ELSE 0 END AS BIGINT) AS n_matches
        FROM t, p)
      SELECT doc_id, phrase, n_matches FROM m
      WHERE n_matches > 0
      ORDER BY doc_id, phrase"""))

  // -------------------------------------------------------------- q138
  /** Rule-battery quality filter over the corpus — the explainable
    * keep/drop report with per-rule flags (word-count, mean-word-length,
    * alpha-ratio, symbol-ratio, top-token mass, stopword presence), all
    * exact-integer ppm comparisons. Thresholds are tuned to SPLIT the
    * fixture (a filter that keeps or drops everything gates nothing):
    * minWords 40 fails short docs, the 4.0–4.8 mean-length band and the
    * 12% top-token cap each cut both ways. Exercises
    * [[graft.api.GraftOps.qualityRules]]. Booleans surface as BIGINT
    * 0/1 (the q125 alarm precedent — engine-portable hashing). */
  val q138 = QueryDef("q138_quality_rules",
    (s, dir) => {
      val flags = Seq("r_wordcount", "r_meanlen", "r_alpha", "r_sym",
        "r_toptok", "r_stop", "keep")
      graft.api.GraftOps.qualityRules(docs(s, dir), col("doc_id"),
          col("text"), minWords = 40, maxWords = 100000,
          minMeanLenPpm = 4000000L, maxMeanLenPpm = 4800000L,
          minAlphaPpm = 800000L, maxSymPpm = 100000L,
          maxTopTokPpm = 120000L, minStops = 2)
        .select(Seq(col("id").as("doc_id"), col("n_words"), col("sum_len"),
          col("n_alpha"), col("n_sym"), col("top_cnt"), col("n_stop")) ++
          flags.map(f => col(f).cast("long").as(f)): _*)
        .orderBy("doc_id")
    },
    Some(s"""
      WITH t AS (
        SELECT doc_id,
          list_filter(${Duck.toks}, tk -> tk <> '') AS toks,
          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS norm
        FROM documents),
      f AS (
        SELECT doc_id,
          CAST(len(toks) AS BIGINT) AS n_words,
          CAST(COALESCE(list_sum(list_transform(toks, tk -> length(tk))), 0) AS BIGINT) AS sum_len,
          CAST(len(list_filter(toks, tk -> regexp_matches(tk, '[a-z]'))) AS BIGINT) AS n_alpha,
          CAST(length(norm) - length(replace(norm, '#', ''))
            + (length(norm) - length(replace(norm, '...', ''))) // 3 AS BIGINT) AS n_sym,
          CAST(COALESCE(list_max(list_transform(list_distinct(toks),
            tk -> len(list_filter(toks, x -> x = tk)))), 0) AS BIGINT) AS top_cnt,
          CAST(len(list_intersect(list_distinct(toks),
            ['the', 'a', 'of', 'and', 'to', 'in'])) AS BIGINT) AS n_stop
        FROM t),
      r AS (
        SELECT *,
          CAST(n_words >= 40 AND n_words <= 100000 AS BIGINT) AS r_wordcount,
          CAST(n_words > 0 AND sum_len * 1000000 >= n_words * 4000000
            AND sum_len * 1000000 <= n_words * 4800000 AS BIGINT) AS r_meanlen,
          CAST(n_words > 0 AND n_alpha * 1000000 >= n_words * 800000 AS BIGINT) AS r_alpha,
          CAST(n_words > 0 AND n_sym * 1000000 <= n_words * 100000 AS BIGINT) AS r_sym,
          CAST(n_words > 0 AND top_cnt * 1000000 <= n_words * 120000 AS BIGINT) AS r_toptok,
          CAST(n_stop >= 2 AS BIGINT) AS r_stop
        FROM f)
      SELECT doc_id, n_words, sum_len, n_alpha, n_sym, top_cnt, n_stop,
        r_wordcount, r_meanlen, r_alpha, r_sym, r_toptok, r_stop,
        CAST(r_wordcount + r_meanlen + r_alpha + r_sym + r_toptok + r_stop = 6
          AS BIGINT) AS keep
      FROM r ORDER BY doc_id"""))

  // -------------------------------------------------------------- q135
  /** DuckDB restatement of [[graft.api.GraftOps.bpeFit]]'s first
    * `nMerges` iterations, generated as unrolled CTE blocks (the q108
    * PageRank precedent for iterative trainers): per iteration k —
    * p_k counts adjacent symbol pairs positionally (weighted by word
    * frequency, overlapping positions count), m_k is the
    * deterministic argmax (n desc, s1, s2), and r_k applies the merge
    * to every word with a recursive CTE walking symbol positions
    * left-to-right non-overlapping (i advances 2 on a merge, 1
    * otherwise — EXACTLY the operator's greedy fold). `w0` starts
    * from per-character symbols of every distinct non-empty word. */
  private def bpeCtes(nMerges: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""
      w0 AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS freq,
          list_transform(range(1, length(word) + 1),
            i -> substr(word, CAST(i AS INTEGER), 1)) AS syms
        FROM (SELECT unnest(list_filter(${Duck.toks}, x -> x <> ''))
                AS word
              FROM documents)
        GROUP BY word)"""
    for (k <- 1 to nMerges) {
      val p = k - 1
      sb ++= s""",
      p$k AS MATERIALIZED (SELECT s1, s2, CAST(SUM(freq) AS BIGINT) AS n FROM (
          SELECT freq, syms[CAST(i AS INTEGER)] AS s1,
                 syms[CAST(i AS INTEGER) + 1] AS s2
          FROM w$p, unnest(range(1, len(syms))) AS t(i)
          WHERE len(syms) >= 2)
        GROUP BY 1, 2),
      m$k AS MATERIALIZED (SELECT s1, s2, n
              FROM p$k ORDER BY n DESC, s1, s2 LIMIT 1),
      r$k AS (
        SELECT word, freq, syms, CAST([] AS VARCHAR[]) AS acc, 1 AS i
        FROM w$p
        UNION ALL
        SELECT r.word, r.freq, r.syms,
          CASE WHEN i < len(syms) AND syms[i] = m.s1 AND syms[i+1] = m.s2
               THEN list_append(acc, m.s1 || m.s2)
               ELSE list_append(acc, syms[i]) END,
          CASE WHEN i < len(syms) AND syms[i] = m.s1 AND syms[i+1] = m.s2
               THEN i + 2 ELSE i + 1 END
        FROM r$k r, m$k m WHERE i <= len(syms)),
      w$k AS MATERIALIZED (SELECT word, freq, acc AS syms FROM r$k
              WHERE i = len(syms) + 1)"""
    }
    sb.toString
  }

  private val bpeMerges = 8

  /** BPE merge training over the document corpus: 8 greedy
    * most-frequent-pair merges from per-character symbols, every rank,
    * pair, and exact count hash-gated against the unrolled
    * recursive-CTE restatement ([[bpeCtes]]). Output columns alias to
    * lhs/rhs (left/right are reserved words in SQL ORDER BY contexts —
    * the intervalJoin naming guard precedent). Exercises
    * [[graft.api.GraftOps.bpeFit]]. */
  val q135 = QueryDef("q135_bpe_fit",
    (s, dir) =>
      graft.api.GraftOps.bpeFit(
          docs(s, dir).select(
            filter(Text.tokens(col("text")), t => t =!= lit(""))
              .as("toks")),
          col("toks"), nMerges = bpeMerges)
        .select(col("rank"), col("left").as("lhs"), col("right").as("rhs"),
          col("n"))
        .orderBy("rank"),
    Some(s"""
      WITH RECURSIVE ${bpeCtes(bpeMerges)}
      SELECT CAST(rank AS INTEGER) AS rank, lhs, rhs, n FROM (
        ${(1 to bpeMerges).map(k =>
          s"SELECT $k AS rank, s1 AS lhs, s2 AS rhs, n FROM m$k")
          .mkString("\n        UNION ALL ")})
      ORDER BY rank"""))

  /** BPE encoding of every document with the 8 trained merges: per-doc
    * piece count and the full flattened piece stream, hash-gated. The
    * oracle probes the trainer's FINAL word→pieces state as a map (the
    * q109 map-probe idiom — every corpus token is a training word by
    * construction), which equals applying the ranked merges per token
    * because each encode step k sees exactly the symbol state the
    * trainer saw at step k (the spec-pinned encode==trainer law).
    * Exercises [[graft.api.GraftOps.bpeEncode]]. */
  val q135b = QueryDef("q135b_bpe_encode",
    (s, dir) => {
      val t = docs(s, dir).select(col("doc_id"),
        filter(Text.tokens(col("text")), x => x =!= lit("")).as("toks"))
      val merges = graft.api.GraftOps.bpeFit(t, col("toks"), bpeMerges)
      graft.api.GraftOps.bpeEncode(t, col("toks"), merges)
        .select(col("doc_id"),
          size(flatten(col("pieces"))).as("n_pieces"),
          array_join(transform(flatten(col("pieces")), p => p), ",")
            .as("pieces_csv"))
        .orderBy("doc_id")
    },
    Some(s"""
      WITH RECURSIVE ${bpeCtes(bpeMerges)},
      mp AS (SELECT map(list(word), list(syms)) AS mm FROM w$bpeMerges),
      d AS (SELECT doc_id, list_filter(${Duck.toks}, x -> x <> '') AS toks
            FROM documents),
      enc AS (SELECT doc_id,
                flatten(list_transform(toks, x -> mm[x][1])) AS pieces
              FROM d, mp)
      SELECT doc_id, CAST(len(pieces) AS INTEGER) AS n_pieces,
        array_to_string(pieces, ',') AS pieces_csv
      FROM enc ORDER BY doc_id"""))

  // -------------------------------------------------------------- q136
  /** DuckDB restatement of [[graft.api.GraftOps.lmScore]]'s fixed-point
    * log2 ladder (see `log2Q10` — MSB CASE + ten truncating
    * square-and-compare steps, all integer ops), generated as chained
    * CTE blocks over the bigram model. */
  private def lmLadderSql: String = {
    val eCase = (32 to 1 by -1)
      .map(k => s"WHEN q30 >= ${1L << (30 + k)} THEN $k")
      .mkString("CASE ", " ", " ELSE 0 END")
    val steps = (1 to 10).map { j =>
      val p = if (j == 1) "u0" else s"u${j - 1}"
      s"""
      t$j AS (SELECT w1, w2, e, frac, (x * x) // 1073741824 AS xs FROM $p),
      u$j AS (SELECT w1, w2, e,
          CASE WHEN xs >= 2147483648 THEN xs // 2 ELSE xs END AS x,
          frac + CASE WHEN xs >= 2147483648 THEN ${1 << (10 - j)} ELSE 0 END
            AS frac
        FROM t$j)"""
    }.mkString(",")
    s"""
      q AS (SELECT *, CAST((CAST(n_ctx AS HUGEINT) * 1073741824)
              // CAST(n_big AS HUGEINT) AS BIGINT) AS q30 FROM mdl),
      e0 AS (SELECT *, $eCase AS e FROM q),
      u0 AS (SELECT w1, w2, e, CAST(q30 >> e AS BIGINT) AS x, 0 AS frac
             FROM e0),$steps,
      sur AS (SELECT w1, w2, CAST(e * 1024 + frac AS BIGINT) AS sur
              FROM u10)"""
  }

  /** Bigram-LM surprisal scoring of every document — total and average
    * −log2 p(w₂|w₁) in exact 1/1024-bit units under the corpus's own
    * bigram counts; the whole report (including the fixed-point log2 of
    * every model row) hash-gates. Exercises
    * [[graft.api.GraftOps.lmScore]]. */
  val q136 = QueryDef("q136_lm_score",
    (s, dir) =>
      graft.api.GraftOps.lmScore(
          docs(s, dir).select(col("doc_id"),
            filter(Text.tokens(col("text")), x => x =!= lit("")).as("toks")),
          col("doc_id"), col("toks"))
        .withColumnRenamed("key", "doc_id")
        .orderBy("doc_id"),
    Some(s"""
      WITH d AS (SELECT doc_id,
             list_filter(${Duck.toks}, x -> x <> '') AS toks
           FROM documents),
      pos AS MATERIALIZED (
        SELECT doc_id, toks[CAST(i AS INTEGER)] AS w1,
               toks[CAST(i AS INTEGER) + 1] AS w2
        FROM d, unnest(range(1, len(toks))) AS t(i)
        WHERE len(toks) >= 2),
      bm AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_big
             FROM pos GROUP BY 1, 2),
      mdl AS (SELECT w1, w2, n_big,
                CAST(SUM(n_big) OVER (PARTITION BY w1) AS BIGINT) AS n_ctx
              FROM bm),
      ${lmLadderSql},
      per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS m,
                CAST(SUM(sur) AS BIGINT) AS s
              FROM pos JOIN sur USING (w1, w2) GROUP BY 1)
      SELECT d.doc_id, COALESCE(per.m, CAST(0 AS BIGINT)) AS n_bigrams,
        COALESCE(per.s, CAST(0 AS BIGINT)) AS sur_q10,
        CASE WHEN per.m > 0 THEN per.s // per.m END AS avg_q10
      FROM d LEFT JOIN per USING (doc_id)
      ORDER BY doc_id"""))

  // -------------------------------------------------------------- q148
  /** DuckDB restatement of [[graft.api.GraftOps.unigramFit]]'s exact
    * fixed-point surprisal ladder, keyed by PIECE over a (piece, mass)
    * vocabulary CTE `src` — the q136 [[lmLadderSql]] shape with the
    * bigram key swapped for the piece key. Ends in `sur$tag(piece,
    * sur)`. */
  private def uniLadderSql(tag: String, src: String): String = {
    val eCase = (32 to 1 by -1)
      .map(k => s"WHEN q30 >= ${1L << (30 + k)} THEN $k")
      .mkString("CASE ", " ", " ELSE 0 END")
    val steps = (1 to 10).map { j =>
      val p = if (j == 1) s"u0$tag" else s"u${j - 1}$tag"
      s"""
      t$j$tag AS (SELECT piece, e, frac, (x * x) // 1073741824 AS xs FROM $p),
      u$j$tag AS (SELECT piece, e,
          CASE WHEN xs >= 2147483648 THEN xs // 2 ELSE xs END AS x,
          frac + CASE WHEN xs >= 2147483648 THEN ${1 << (10 - j)} ELSE 0 END
            AS frac
        FROM t$j$tag)"""
    }.mkString(",")
    s"""
      tot$tag AS (SELECT CAST(SUM(mass) AS BIGINT) AS tot FROM $src),
      q$tag AS (SELECT piece, CAST((CAST(tot AS HUGEINT) * 1073741824)
              // CAST(mass AS HUGEINT) AS BIGINT) AS q30 FROM $src, tot$tag),
      e0$tag AS (SELECT *, $eCase AS e FROM q$tag),
      u0$tag AS (SELECT piece, e, CAST(q30 >> e AS BIGINT) AS x, 0 AS frac
             FROM e0$tag),$steps,
      sur$tag AS (SELECT piece, CAST(e * 1024 + frac AS BIGINT) AS sur
              FROM u10$tag)"""
  }

  private val uniVocabSize = 80
  private val uniIters = 2
  private val uniMaxPiece = 3
  private val uniTopWords = 50
  private val uniMaxWordLen = 10

  /** One unigram EM round as CTE text: score `vocabIn` with the ladder,
    * Viterbi-segment every training word by ENUMERATING all
    * segmentations (a recursive path CTE — the oracle-side statement of
    * the DP's pinned (cost, n_pieces, path) total order), re-mass
    * pieces by usage, floor the single-codepoint coverage set at mass
    * 1, re-prune multis. Ends in `vocab$r(piece, mass)`. */
  private def uniRoundSql(r: Int, vocabIn: String): String = s"""
      ${uniLadderSql(s"v$r", vocabIn)},
      edgs$r AS (
        SELECT e.w, e.j0, e.j1, e.piece, s.sur
        FROM (SELECT w.w, CAST(t.i AS INTEGER) AS j0,
                CAST(t.i + u.l - 1 AS INTEGER) AS j1,
                substr(w.w, CAST(t.i AS INTEGER), CAST(u.l AS INTEGER)) AS piece
              FROM words w, unnest(range(1, len(w.w) + 1)) t(i),
                   unnest(range(1, $uniMaxPiece + 1)) u(l)
              WHERE t.i + u.l - 1 <= len(w.w)) e
        JOIN surv$r s USING (piece)),
      paths$r AS (
        SELECT w, CAST(0 AS INTEGER) AS p, CAST(0 AS BIGINT) AS cost,
          CAST(0 AS INTEGER) AS np, CAST('' AS VARCHAR) AS path
        FROM words
        UNION ALL
        SELECT e.w, e.j1, p.cost + e.sur, p.np + 1,
          CASE WHEN p.path = '' THEN e.piece
               ELSE p.path || ' ' || e.piece END
        FROM paths$r p JOIN edgs$r e ON e.w = p.w AND e.j0 = p.p + 1),
      best$r AS (
        SELECT w, path FROM (
          SELECT p.w, p.path,
            row_number() OVER (PARTITION BY p.w
              ORDER BY p.cost, p.np, p.path) AS rn
          FROM paths$r p JOIN words ww ON ww.w = p.w
          WHERE p.p = len(ww.w)) WHERE rn = 1),
      use$r AS (
        SELECT piece, CAST(SUM(n) AS BIGINT) AS mass
        FROM (SELECT b.w, unnest(string_split(b.path, ' ')) AS piece
              FROM best$r b) sp
        JOIN words USING (w) GROUP BY piece),
      vocab$r AS (
        SELECT s.piece, CAST(COALESCE(u.mass, 1) AS BIGINT) AS mass
        FROM singles s LEFT JOIN use$r u USING (piece)
        UNION ALL
        SELECT piece, mass FROM (
          SELECT u.piece, u.mass,
            row_number() OVER (ORDER BY u.mass DESC, u.piece) AS rn
          FROM use$r u WHERE len(u.piece) > 1) m, nsing
        WHERE m.rn <= $uniVocabSize - nsing.ns)"""

  /** Unigram-LM (SentencePiece-style) tokenizer training over the
    * document corpus: seed substring masses over the top-50 word
    * table, two EM rounds of exact-surprisal Viterbi re-segmentation,
    * prune to 80 pieces — every piece, mass, and fixed-point score
    * hash-gated against the unrolled recursive-CTE restatement
    * (Viterbi = enumerate-all-paths + the pinned total order; the
    * q135/q108 iterative-oracle precedent). Exercises
    * [[graft.api.GraftOps.unigramFit]]. */
  val q148 = QueryDef("q148_unigram_fit",
    (s, dir) =>
      graft.api.GraftOps.unigramFit(docs(s, dir),
          Text.tokens(col("text")), vocabSize = uniVocabSize,
          iters = uniIters, maxPieceLen = uniMaxPiece,
          topWords = uniTopWords, maxWordLen = uniMaxWordLen)
        .orderBy("rank"),
    Some(s"""
      WITH RECURSIVE
      tk AS (SELECT doc_id, ${Duck.toks} AS toks FROM documents),
      words AS MATERIALIZED (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS n
        FROM (SELECT unnest(toks) AS w FROM tk)
        WHERE w <> '' AND len(w) <= $uniMaxWordLen
        GROUP BY w ORDER BY n DESC, w LIMIT $uniTopWords),
      sub AS (
        SELECT substr(w.w, CAST(t.i AS INTEGER), CAST(u.l AS INTEGER)) AS piece,
          w.n
        FROM words w, unnest(range(1, len(w.w) + 1)) t(i),
             unnest(range(1, $uniMaxPiece + 1)) u(l)
        WHERE t.i + u.l - 1 <= len(w.w)),
      mass0 AS MATERIALIZED (
        SELECT piece, CAST(SUM(n) AS BIGINT) AS mass FROM sub GROUP BY piece),
      singles AS MATERIALIZED (SELECT piece FROM mass0 WHERE len(piece) = 1),
      nsing AS (SELECT CAST(COUNT(*) AS INTEGER) AS ns FROM singles),
      vocab0 AS (
        SELECT s.piece, m.mass FROM singles s JOIN mass0 m USING (piece)
        UNION ALL
        SELECT piece, mass FROM (
          SELECT piece, mass,
            row_number() OVER (ORDER BY mass DESC, piece) AS rn
          FROM mass0 WHERE len(piece) > 1) mm, nsing
        WHERE mm.rn <= $uniVocabSize - nsing.ns),
      ${uniRoundSql(1, "vocab0")},
      ${uniRoundSql(2, "vocab1")},
      ${uniLadderSql("fin", s"vocab$uniIters")}
      SELECT v.piece, v.mass, s.sur AS sur_q10,
        CAST(row_number() OVER (ORDER BY v.mass DESC, v.piece) AS BIGINT)
          AS "rank"
      FROM vocab$uniIters v JOIN surfin s USING (piece)
      ORDER BY "rank""""))

  val all: Seq[QueryDef] =
    Seq(q12, q22, q23, q24, q25, q70, q70b, q73, q77, q86, q101, q109,
      q110, q112, q115, q122, q135, q135b, q136, q138, q142, q148, q150,
      q156, q158)
}
