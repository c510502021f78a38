package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{QueryDef, Tables}
import graft.functions.{CosineSim, Portable}

/** Similarity-search operator family (SURVEY.md §2.2 ext rows):
  * exact brute-force top-k (the correctness baseline), hyperplane-LSH
  * bucketed ANN (the scale path — candidate set shrinks ~2^planes×), and
  * per-label centroid aggregation.
  *
  * 100 TB posture: brute-force kNN broadcasts the (small) probe set and
  * scans the corpus once — shuffle is only the per-probe top-k. The LSH
  * variant turns the scan into an equi-join on bucket id, which partitions
  * and prunes; both avoid a corpus×corpus product.
  */
object SimilarityOps {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  private val DIM = 64
  private val PLANES = 6

  /** Deterministic pseudo-random hyperplanes, baked from the portable md5
    * hash so BOTH the Spark plan and the generated oracle SQL carry the
    * identical integer constants (scaled by 1000.0 at use site). */
  private[operators] val hyperInt: Array[Array[Long]] =
    Array.tabulate(PLANES, DIM)((j, i) => Portable.phashJvm(s"hp${j}_$i") % 2001 - 1000)

  /** LSH bucket id: sign bits of the 6 hyperplane dots, in one codegen'd
    * pass ([[graft.functions.PlaneSigns]] — the HOF fold form runs
    * interpreted and re-walks the embedding per plane). */
  private def bucket(e: Column): Column =
    graft.functions.PlaneSigns(e,
      hyperInt.map(_.toIndexedSeq.map(_.toDouble / 1000.0)).toIndexedSeq)
      .cast("int")

  /** DuckDB rendering of the same plane dot / bucket. */
  private def planeDotSql(e: String, j: Int): String = {
    val lst = hyperInt(j).map(v => s"($v)/1000.0").mkString("[", ", ", "]")
    s"list_reduce(list_transform(range(1, ${DIM + 1}), i -> CAST($e[i] AS DOUBLE) * list_extract($lst, i)), (p, q) -> p + q)"
  }
  private def bucketSql(e: String): String =
    (0 until PLANES).map(j => s"(CASE WHEN ${planeDotSql(e, j)} > 0 THEN ${1 << j} ELSE 0 END)")
      .mkString("(", " + ", ")")

  // ---------------------------------------------------------------- q13
  /** Exact kNN: 10 probe vectors × corpus, top-5 by cosine (desc, vec_id
    * tiebreak). Probes broadcast; corpus scanned once; per-probe top-k via
    * ranking window. Cosine is the codegen'd Catalyst expression. */
  val q13 = QueryDef("q13_similarity_knn",
    (s, dir) => {
      val e = emb(s, dir)
      graft.api.GraftOps.knn(e, e.filter(col("vec_id") < 10),
          col("vec_id"), col("embedding"), col("vec_id"), col("embedding"), k = 5)
        .select(col("probe_id"), col("id").as("vec_id"), col("rank"), col("sim"))
        .orderBy("probe_id", "rank")
    },
    Some(s"""
      WITH probes AS (
        SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id < 10),
      pairs AS (
        SELECT probe_id, vec_id,
          ${Duck.cosine("pe", "embedding")} AS sim
        FROM probes, embeddings WHERE vec_id <> probe_id),
      ranked AS (
        SELECT probe_id, vec_id,
          CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rank,
          sim
        FROM pairs)
      SELECT probe_id, vec_id, rank, sim
      FROM ranked WHERE rank <= 5
      ORDER BY probe_id, rank"""))

  // ---------------------------------------------------------------- q20
  /** ANN via random-hyperplane LSH: bucket both sides on 6 sign bits, then
    * exact top-3 *within bucket* per probe. The equi-join on bucket is the
    * scale path: cost ~ corpus/2^6 per probe instead of the full scan. */
  val q20 = QueryDef("q20_ann_lsh",
    (s, dir) => {
      val e = emb(s, dir).withColumn("bkt", bucket(col("embedding")))
      val probes = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("probe_id"), col("embedding").as("pe"), col("bkt"))
      val w = Window.partitionBy(col("probe_id")).orderBy(desc("sim"), col("vec_id"))
      e.join(broadcast(probes), Seq("bkt"))
        .filter(col("vec_id") =!= col("probe_id"))
        .withColumn("sim", CosineSim(col("pe"), col("embedding")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 3)
        .select(col("probe_id"), col("vec_id"), col("rank"), col("sim"))
        .orderBy("probe_id", "rank")
    },
    Some(s"""
      WITH b AS (
        SELECT vec_id, embedding, ${bucketSql("embedding")} AS bkt FROM embeddings),
      probes AS (
        SELECT vec_id AS probe_id, embedding AS pe, bkt FROM b WHERE vec_id < 10),
      pairs AS (
        SELECT probe_id, b.vec_id,
          ${Duck.cosine("pe", "b.embedding")} AS sim
        FROM probes JOIN b USING (bkt) WHERE b.vec_id <> probe_id),
      ranked AS (
        SELECT probe_id, vec_id,
          CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rank,
          sim
        FROM pairs)
      SELECT probe_id, vec_id, rank, sim
      FROM ranked WHERE rank <= 3
      ORDER BY probe_id, rank"""))

  // ---------------------------------------------------------------- q21
  /** Per-label centroids: posexplode the embedding, two-phase hash agg on
    * (label, dim). Components are quantized to exact integer micros
    * (floor(v·1e6) — float→double exact, one IEEE multiply, floor; all
    * bit-portable) so the sum is order-free integer math; double→decimal
    * casts turned out NOT to be portable (engines disagree at ulp scale on
    * the scale-10 rounding). */
  val q21 = QueryDef("q21_label_centroids",
    (s, dir) => {
      emb(s, dir)
        .select(col("label"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("label"), col("dim"))
        .agg(
          (sum(floor(col("v").cast("double") * lit(1000000.0)).cast("long"))
            .cast("double") / 1000000.0 / count(lit(1))).as("centroid"),
          count(lit(1)).as("n"))
        .orderBy("label", "dim")
    },
    Some("""
      SELECT label, CAST(i - 1 AS INTEGER) AS dim,
        CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
          / 1000000.0 / COUNT(*) AS centroid,
        COUNT(*) AS n
      FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx
      GROUP BY label, dim
      ORDER BY label, dim"""))

  // ---------------------------------------------------------------- q34
  /** ANN via IVF (inverted file): coarse centroids = the exact per-label
    * centroids of q21 (integer-micros quantized → engine-portable);
    * every vector is assigned to its nearest centroid by dot score
    * (sequential double fold, label tiebreak); probes search ONLY their
    * own cell (nprobe=1), exact cosine top-3 inside. Centroid ASSIGNMENT
    * is a narrow per-row argmax projection: the K-row centroid table is
    * computed distributed, collected (K·64 doubles — tiny by
    * construction, like a trained KMeans model), and baked into a
    * max-of-struct literal — zero shuffle, no corpus×K intermediate, vs
    * the cross-join + row_number window form which shuffle-amplifies K×
    * at scale. The per-cell search stays an equi-join on cell id —
    * corpus/|cells| work per probe. */
  val q34 = QueryDef("q34_ann_ivf",
    (s, dir) =>
      graft.api.GraftOps.ivfTopK(emb(s, dir), col("vec_id"), col("embedding"),
          col("label"), col("vec_id") < 10, k = 3, nprobe = 1)
        .select(col("probe_id"), col("id").as("vec_id"), col("rank"), col("sim"))
        .orderBy("probe_id", "rank"),
    Some(s"""
      WITH cdim AS (
        SELECT label, CAST(i - 1 AS INTEGER) AS dim,
          CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
            / 1000000.0 / COUNT(*) AS cv
        FROM embeddings, (SELECT unnest(range(1, 65)) AS i) idx
        GROUP BY label, dim),
      cent AS (
        SELECT label AS c_label,
          list_transform(list_sort(list({'dim': dim, 'cv': cv})), p -> p.cv) AS cvec
        FROM cdim GROUP BY label),
      scored AS (
        SELECT vec_id, embedding, c_label,
          list_reduce(list_transform(range(1, 65),
            i -> CAST(embedding[i] AS DOUBLE) * list_extract(cvec, i)), (p, q) -> p + q) AS score
        FROM embeddings, cent),
      assigned AS (
        SELECT vec_id, embedding, c_label AS cell FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, c_label) AS arn
          FROM scored) WHERE arn = 1),
      probes AS (
        SELECT vec_id AS probe_id, embedding AS pe, cell FROM assigned WHERE vec_id < 10),
      pairs AS (
        SELECT probe_id, a.vec_id,
          ${Duck.cosine("pe", "a.embedding")} AS sim
        FROM probes JOIN assigned a USING (cell)
        WHERE a.vec_id <> probe_id),
      ranked AS (
        SELECT probe_id, vec_id,
          CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rank,
          sim
        FROM pairs)
      SELECT probe_id, vec_id, rank, sim
      FROM ranked WHERE rank <= 3
      ORDER BY probe_id, rank"""))

  // ---------------------------------------------------------------- q48
  /** DuckDB sequential-fold dot of an embedding against a DOUBLE[] list
    * column — same op order as NearestCells' JVM loop (q34-proven). */
  private def dotColSql(e: String, c: String): String =
    s"list_reduce(list_transform(range(1, ${DIM + 1}), i -> CAST($e[i] AS DOUBLE) * list_extract($c, i)), (p, q) -> p + q)"

  /** k-means trainer, 2 Lloyd rounds at k=5 with hash-min seeds — the
    * training seam of the IVF family (q34 consumes a centroid table
    * exactly like the one this trains). Every arithmetic step is the
    * proven-portable machinery of q21/q34: portable-hash seed pick,
    * micros-quantized centroids, sequential-fold dot assignment with
    * (score desc, cluster asc) ties, integer-micros mean updates. */
  val q48 = QueryDef("q48_kmeans_train",
    (s, dir) =>
      graft.api.GraftOps.kmeansFit(emb(s, dir), col("vec_id"), col("embedding"),
          k = 5, iters = 2)
        .orderBy("cluster", "dim"),
    Some(s"""
      WITH hashed AS (
        SELECT vec_id, embedding,
          ${Duck.ph("'km|' || CAST(vec_id AS VARCHAR)")} AS h
        FROM embeddings),
      seeds AS (
        SELECT embedding,
          CAST(row_number() OVER (ORDER BY h, vec_id) AS INTEGER) - 1 AS cluster
        FROM hashed ORDER BY h, vec_id LIMIT 5),
      cvec0 AS (
        SELECT cluster,
          list_transform(range(1, ${DIM + 1}),
            i -> floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) / 1000000.0) AS cvec
        FROM seeds),
      scored1 AS (
        SELECT e.vec_id, e.embedding, c.cluster,
          ${dotColSql("e.embedding", "c.cvec")} AS score
        FROM embeddings e, cvec0 c),
      asg1 AS (
        SELECT vec_id, embedding, cluster FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cluster) AS rn
          FROM scored1) WHERE rn = 1),
      cent1 AS (
        SELECT cluster, CAST(i - 1 AS INTEGER) AS dim,
          CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
            / 1000000.0 / COUNT(*) AS centroid
        FROM asg1, (SELECT unnest(range(1, ${DIM + 1})) AS i) idx
        GROUP BY cluster, dim),
      cvec1 AS (
        SELECT cluster,
          list_transform(list_sort(list({'dim': dim, 'cv': centroid})), p -> p.cv) AS cvec
        FROM cent1 GROUP BY cluster),
      scored2 AS (
        SELECT e.vec_id, e.embedding, c.cluster,
          ${dotColSql("e.embedding", "c.cvec")} AS score
        FROM embeddings e, cvec1 c),
      asg2 AS (
        SELECT vec_id, embedding, cluster FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cluster) AS rn
          FROM scored2) WHERE rn = 1)
      SELECT cluster, CAST(i - 1 AS INTEGER) AS dim,
        CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
          / 1000000.0 / COUNT(*) AS centroid,
        COUNT(*) AS n
      FROM asg2, (SELECT unnest(range(1, ${DIM + 1})) AS i) idx
      GROUP BY cluster, dim
      ORDER BY cluster, dim"""))

  // ---------------------------------------------------------------- q50
  private val PQ_M = 4
  private val PQ_SUBDIM = DIM / PQ_M
  private val PQ_KSUB = 4

  /** DuckDB sequential-fold dot of embedding slice [off+1, off+subDim]
    * against a subDim-long DOUBLE[] list — the subspace form of q48's
    * dotColSql (same left-fold op order as the JVM loop). Parameterized by
    * subspace width so the q50 (m=4) and q66 rich (m=16) tiers share it. */
  private def dotSubSqlW(e: String, c: String, off: Int, subDim: Int): String =
    s"list_reduce(list_transform(range(${off + 1}, ${off + subDim + 1}), i -> CAST($e[i] AS DOUBLE) * list_extract($c, i - $off)), (p, q) -> p + q)"

  private def dotSubSql(e: String, c: String, off: Int): String =
    dotSubSqlW(e, c, off, PQ_SUBDIM)

  /** One subspace's training + encode CTE chain: quantized seed slices →
    * one Lloyd assignment → integer-micros sub-centroids → per-vector
    * argmax code. Mechanically the q48 chain restricted to a slice.
    * Parameterized by subspace width, the seeds CTE (codebook size = that
    * CTE's LIMIT), and the corpus CTE (default the raw embeddings table;
    * q84's residual tier trains the same chain over a residual CTE whose
    * DOUBLE `embedding` makes every CAST a no-op) so every PQ tier
    * generates from one template. */
  private def pqSubspaceSqlW(s: Int, subDim: Int, seedsCte: String,
      corpus: String = "embeddings"): String = {
    val off = s * subDim
    s"""cvec0_$s AS (
        SELECT cluster,
          list_transform(range(${off + 1}, ${off + subDim + 1}),
            i -> floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) / 1000000.0) AS cvec
        FROM $seedsCte),
      scored1_$s AS (
        SELECT e.vec_id, e.embedding, c.cluster,
          ${dotSubSqlW("e.embedding", "c.cvec", off, subDim)} AS score
        FROM $corpus e, cvec0_$s c),
      asg_$s AS (
        SELECT vec_id, embedding, cluster FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cluster) AS rn
          FROM scored1_$s) WHERE rn = 1),
      cent_$s AS (
        SELECT cluster, CAST(i - 1 AS INTEGER) AS dim,
          CAST(SUM(CAST(floor(CAST(embedding[i + $off] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
            / 1000000.0 / COUNT(*) AS centroid
        FROM asg_$s, (SELECT unnest(range(1, ${subDim + 1})) AS i) idx
        GROUP BY cluster, dim),
      cvec_$s AS (
        SELECT cluster,
          list_transform(list_sort(list({'dim': dim, 'cv': centroid})), p -> p.cv) AS cvec
        FROM cent_$s GROUP BY cluster),
      scored2_$s AS (
        SELECT e.vec_id, c.cluster,
          ${dotSubSqlW("e.embedding", "c.cvec", off, subDim)} AS score
        FROM $corpus e, cvec_$s c),
      code_$s AS (
        SELECT vec_id, cluster AS code FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cluster) AS rn
          FROM scored2_$s) WHERE rn = 1)"""
  }

  private def pqSubspaceSql(s: Int): String =
    pqSubspaceSqlW(s, PQ_SUBDIM, "seeds")

  /** Product-quantization ANN: per-subspace sub-codebooks trained with the
    * q48 machinery (one Lloyd round, hash-min seeds — the same seed rows
    * in every subspace), every vector coded to `PQ_M` sub-centroid ids,
    * probes scored by ADC — the corpus side of the scan carries ONLY the
    * codes. Every arithmetic step is the proven-portable q21/q34/q48
    * family, so the whole train→encode→search path hash-matches DuckDB. */
  val q50 = QueryDef("q50_ann_pq",
    (s, dir) => {
      val e = emb(s, dir)
      val model = graft.api.GraftOps.pqFit(e, col("vec_id"), col("embedding"),
        dim = DIM, m = PQ_M, ksub = PQ_KSUB, iters = 1)
      graft.api.GraftOps.pqTopK(e, col("vec_id"), col("embedding"),
          col("vec_id") < 10, model, dim = DIM, k = 3)
        .select(col("probe_id"), col("id").as("vec_id"), col("rank"), col("adc"))
        .orderBy("probe_id", "rank")
    },
    Some(s"""
      WITH hashed AS (
        SELECT vec_id, embedding,
          ${Duck.ph("'km|' || CAST(vec_id AS VARCHAR)")} AS h
        FROM embeddings),
      seeds AS (
        SELECT embedding,
          CAST(row_number() OVER (ORDER BY h, vec_id) AS INTEGER) - 1 AS cluster
        FROM hashed ORDER BY h, vec_id LIMIT $PQ_KSUB),
      ${(0 until PQ_M).map(pqSubspaceSql).mkString(",\n      ")},
      codes AS (
        SELECT c0.vec_id, ${(0 until PQ_M).map(s => s"c$s.code AS code$s").mkString(", ")}
        FROM code_0 c0 ${(1 until PQ_M).map(s => s"JOIN code_$s c$s USING (vec_id)").mkString(" ")}),
      probes AS (
        SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id < 10),
      pairs AS (
        SELECT probe_id, v.vec_id,
          (${(0 until PQ_M).map(s => dotSubSql("pe", s"cv$s.cvec", s * PQ_SUBDIM)).mkString(" + ")}) AS adc
        FROM probes, codes v
          ${(0 until PQ_M).map(s => s"JOIN cvec_$s cv$s ON cv$s.cluster = v.code$s").mkString("\n          ")}
        WHERE v.vec_id <> probe_id),
      ranked AS (
        SELECT probe_id, vec_id,
          CAST(row_number() OVER (PARTITION BY probe_id ORDER BY adc DESC, vec_id) AS INTEGER) AS rank,
          adc
        FROM pairs)
      SELECT probe_id, vec_id, rank, adc
      FROM ranked WHERE rank <= 3
      ORDER BY probe_id, rank"""))

  // ---------------------------------------------------------------- q52
  private val IVFPQ_K = 4      // coarse cells = PQ_KSUB so ONE seeds CTE serves both trainers
  private val IVFPQ_NPROBE = 2

  /** The composed IVF×PQ index end-to-end: a 1-round k-means coarse
    * quantizer routes (each corpus vector lives in its argmax-dot cell;
    * each probe searches its nearest `IVFPQ_NPROBE` cells), the q50 PQ
    * model compresses (the scan side carries only cell + 4 codes), and
    * ADC scores only WITHIN probed cells — corpus·nprobe/K work per
    * probe instead of q50's full scan. Every arithmetic step is the
    * proven-portable q48 (coarse) + q50 (PQ) machinery, so the whole
    * train→route→encode→search path hash-matches DuckDB. */
  val q52 = QueryDef("q52_ann_ivf_pq",
    (s, dir) => {
      val e = emb(s, dir)
      val coarse = graft.api.GraftOps.kmeansFit(e, col("vec_id"), col("embedding"),
        k = IVFPQ_K, iters = 1)
      val pq = graft.api.GraftOps.pqFit(e, col("vec_id"), col("embedding"),
        dim = DIM, m = PQ_M, ksub = PQ_KSUB, iters = 1)
      graft.api.GraftOps.ivfPqTopK(e, col("vec_id"), col("embedding"),
          col("vec_id") < 10, coarse, pq, dim = DIM, k = 3, nprobe = IVFPQ_NPROBE)
        .select(col("probe_id"), col("id").as("vec_id"), col("rank"), col("adc"))
        .orderBy("probe_id", "rank")
    },
    Some(s"""
      WITH hashed AS (
        SELECT vec_id, embedding,
          ${Duck.ph("'km|' || CAST(vec_id AS VARCHAR)")} AS h
        FROM embeddings),
      seeds AS (
        SELECT embedding,
          CAST(row_number() OVER (ORDER BY h, vec_id) AS INTEGER) - 1 AS cluster
        FROM hashed ORDER BY h, vec_id LIMIT $IVFPQ_K),
      gcvec0 AS (
        SELECT cluster,
          list_transform(range(1, ${DIM + 1}),
            i -> floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) / 1000000.0) AS cvec
        FROM seeds),
      gscored AS (
        SELECT e.vec_id, e.embedding, c.cluster,
          ${dotColSql("e.embedding", "c.cvec")} AS score
        FROM embeddings e, gcvec0 c),
      gasg AS (
        SELECT vec_id, embedding, cluster FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cluster) AS rn
          FROM gscored) WHERE rn = 1),
      gcent AS (
        SELECT cluster, CAST(i - 1 AS INTEGER) AS dim,
          CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
            / 1000000.0 / COUNT(*) AS centroid
        FROM gasg, (SELECT unnest(range(1, ${DIM + 1})) AS i) idx
        GROUP BY cluster, dim),
      gcvec1 AS (
        SELECT cluster,
          list_transform(list_sort(list({'dim': dim, 'cv': centroid})), p -> p.cv) AS cvec
        FROM gcent GROUP BY cluster),
      cranked AS (
        SELECT vec_id, embedding, cluster,
          row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cluster) AS crn
        FROM (
          SELECT e.vec_id, e.embedding, c.cluster,
            ${dotColSql("e.embedding", "c.cvec")} AS score
          FROM embeddings e, gcvec1 c)),
      assigned AS (
        SELECT vec_id, cluster AS cell FROM cranked WHERE crn = 1),
      probecells AS (
        SELECT vec_id AS probe_id, embedding AS pe, cluster AS cell
        FROM cranked WHERE vec_id < 10 AND crn <= $IVFPQ_NPROBE),
      ${(0 until PQ_M).map(pqSubspaceSql).mkString(",\n      ")},
      codes AS (
        SELECT c0.vec_id, ${(0 until PQ_M).map(s => s"c$s.code AS code$s").mkString(", ")}
        FROM code_0 c0 ${(1 until PQ_M).map(s => s"JOIN code_$s c$s USING (vec_id)").mkString(" ")}),
      pairs AS (
        SELECT probe_id, v.vec_id,
          (${(0 until PQ_M).map(s => dotSubSql("pe", s"cv$s.cvec", s * PQ_SUBDIM)).mkString(" + ")}) AS adc
        FROM probecells p
          JOIN assigned a ON a.cell = p.cell
          JOIN codes v ON v.vec_id = a.vec_id
          ${(0 until PQ_M).map(s => s"JOIN cvec_$s cv$s ON cv$s.cluster = v.code$s").mkString("\n          ")}
        WHERE v.vec_id <> probe_id),
      ranked AS (
        SELECT probe_id, vec_id,
          CAST(row_number() OVER (PARTITION BY probe_id ORDER BY adc DESC, vec_id) AS INTEGER) AS rank,
          adc
        FROM pairs)
      SELECT probe_id, vec_id, rank, adc
      FROM ranked WHERE rank <= 3
      ORDER BY probe_id, rank"""))

  // ---------------------------------------------------------------- q60
  private val RERANK = 6

  /** The two-stage IVF×PQ search: the q52 ADC pass SHORTLISTS `RERANK`
    * candidates per probe, then exact cosine (the q13-proven portable
    * fold) re-scores only the shortlist and the final top-3 keep the
    * exact order. This is the standard ANN refinement — ADC quantization
    * error is refunded for |probes|·RERANK dot products instead of a
    * full-corpus exact scan. Every stage is individually hash-proven
    * (q52 routing/ADC + q13 cosine), so the composition hash-matches. */
  val q60 = QueryDef("q60_ann_ivf_pq_rerank",
    (s, dir) => {
      val e = emb(s, dir)
      val coarse = graft.api.GraftOps.kmeansFit(e, col("vec_id"), col("embedding"),
        k = IVFPQ_K, iters = 1)
      val pq = graft.api.GraftOps.pqFit(e, col("vec_id"), col("embedding"),
        dim = DIM, m = PQ_M, ksub = PQ_KSUB, iters = 1)
      graft.api.GraftOps.ivfPqTopK(e, col("vec_id"), col("embedding"),
          col("vec_id") < 10, coarse, pq, dim = DIM, k = 3,
          nprobe = IVFPQ_NPROBE, rerank = RERANK)
        .select(col("probe_id"), col("id").as("vec_id"), col("rank"),
          col("adc"), col("sim"))
        .orderBy("probe_id", "rank")
    },
    Some(s"""
      WITH hashed AS (
        SELECT vec_id, embedding,
          ${Duck.ph("'km|' || CAST(vec_id AS VARCHAR)")} AS h
        FROM embeddings),
      seeds AS (
        SELECT embedding,
          CAST(row_number() OVER (ORDER BY h, vec_id) AS INTEGER) - 1 AS cluster
        FROM hashed ORDER BY h, vec_id LIMIT $IVFPQ_K),
      gcvec0 AS (
        SELECT cluster,
          list_transform(range(1, ${DIM + 1}),
            i -> floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) / 1000000.0) AS cvec
        FROM seeds),
      gscored AS (
        SELECT e.vec_id, e.embedding, c.cluster,
          ${dotColSql("e.embedding", "c.cvec")} AS score
        FROM embeddings e, gcvec0 c),
      gasg AS (
        SELECT vec_id, embedding, cluster FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cluster) AS rn
          FROM gscored) WHERE rn = 1),
      gcent AS (
        SELECT cluster, CAST(i - 1 AS INTEGER) AS dim,
          CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
            / 1000000.0 / COUNT(*) AS centroid
        FROM gasg, (SELECT unnest(range(1, ${DIM + 1})) AS i) idx
        GROUP BY cluster, dim),
      gcvec1 AS (
        SELECT cluster,
          list_transform(list_sort(list({'dim': dim, 'cv': centroid})), p -> p.cv) AS cvec
        FROM gcent GROUP BY cluster),
      cranked AS (
        SELECT vec_id, embedding, cluster,
          row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cluster) AS crn
        FROM (
          SELECT e.vec_id, e.embedding, c.cluster,
            ${dotColSql("e.embedding", "c.cvec")} AS score
          FROM embeddings e, gcvec1 c)),
      assigned AS (
        SELECT vec_id, cluster AS cell FROM cranked WHERE crn = 1),
      probecells AS (
        SELECT vec_id AS probe_id, embedding AS pe, cluster AS cell
        FROM cranked WHERE vec_id < 10 AND crn <= $IVFPQ_NPROBE),
      ${(0 until PQ_M).map(pqSubspaceSql).mkString(",\n      ")},
      codes AS (
        SELECT c0.vec_id, ${(0 until PQ_M).map(s => s"c$s.code AS code$s").mkString(", ")}
        FROM code_0 c0 ${(1 until PQ_M).map(s => s"JOIN code_$s c$s USING (vec_id)").mkString(" ")}),
      pairs AS (
        SELECT probe_id, v.vec_id,
          (${(0 until PQ_M).map(s => dotSubSql("pe", s"cv$s.cvec", s * PQ_SUBDIM)).mkString(" + ")}) AS adc
        FROM probecells p
          JOIN assigned a ON a.cell = p.cell
          JOIN codes v ON v.vec_id = a.vec_id
          ${(0 until PQ_M).map(s => s"JOIN cvec_$s cv$s ON cv$s.cluster = v.code$s").mkString("\n          ")}
        WHERE v.vec_id <> probe_id),
      shortlist AS (
        SELECT probe_id, vec_id, adc FROM (
          SELECT probe_id, vec_id, adc,
            row_number() OVER (PARTITION BY probe_id ORDER BY adc DESC, vec_id) AS arn
          FROM pairs) WHERE arn <= $RERANK),
      pvec AS (
        SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id < 10),
      rr AS (
        SELECT s.probe_id, s.vec_id, s.adc,
          ${Duck.cosine("p.pe", "e.embedding")} AS sim
        FROM shortlist s
          JOIN pvec p ON p.probe_id = s.probe_id
          JOIN embeddings e ON e.vec_id = s.vec_id),
      ranked AS (
        SELECT probe_id, vec_id,
          CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id) AS INTEGER) AS rank,
          adc, sim
        FROM rr)
      SELECT probe_id, vec_id, rank, adc, sim
      FROM ranked WHERE rank <= 3
      ORDER BY probe_id, rank"""))

  // ---------------------------------------------------------------- q61
  private val RP_K = 16

  /** Johnson–Lindenstrauss random projection 64 → 16: every component of
    * every projected vector is hash-checked. The ±1/√16 = ±0.25 plane
    * entries derive from the portable md5 hash on BOTH sides (the
    * PlaneSigns hyperplane-baking trick), the fold is the q13-proven
    * sequential dot, and the gated row posexplodes to (vec_id, dim,
    * value) so no array column reaches the driver. */
  val q61 = QueryDef("q61_random_projection",
    (s, dir) =>
      graft.api.GraftOps.randomProject(emb(s, dir), col("embedding"),
          inDim = DIM, outDim = RP_K, seed = 0)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "value")))
        .orderBy("vec_id", "dim"),
    Some {
      val planesLit = graft.api.GraftOps.rpPlanes(DIM, RP_K, 0)
        .map(_.mkString("[", ", ", "]")).mkString("[", ",\n          ", "]")
      s"""
      WITH planes AS (SELECT $planesLit AS pl),
      dims AS (SELECT unnest(range(0, $RP_K)) AS dim),
      proj AS (
        SELECT vec_id, CAST(dim AS INTEGER) AS dim,
          list_reduce(list_transform(range(1, ${DIM + 1}),
            i -> CAST(embedding[i] AS DOUBLE) * list_extract(list_extract(pl, dim + 1), i)),
            (a, b) -> a + b) AS value
        FROM embeddings, dims, planes)
      SELECT vec_id, dim, value FROM proj
      ORDER BY vec_id, dim"""
    })

  // ---------------------------------------------------------------- q62
  /** L2 normalization — the unit-norm preprocessing the dot-scored
    * routing family assumes: every component of every normalized vector
    * is hash-checked. The norm is a sequential sum-of-squares fold
    * (zero-seeded on the Spark side, first-element-seeded in DuckDB's
    * list_reduce — bit-identical because squares are non-negative and
    * 0.0 + x ≡ x), the divide is one IEEE op, and the gated row
    * posexplodes to (vec_id, dim, value) so no array reaches the
    * driver. Zero-norm vectors emit NULL components on BOTH sides. */
  val q62 = QueryDef("q62_l2_normalize",
    (s, dir) =>
      graft.api.GraftOps.l2Normalize(emb(s, dir), col("embedding"))
        .select(col("vec_id"), posexplode(col("unit")).as(Seq("dim", "value")))
        .orderBy("vec_id", "dim"),
    Some(s"""
      WITH n AS (
        SELECT vec_id,
          sqrt(list_reduce(list_transform(embedding,
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (a, b) -> a + b)) AS nrm
        FROM embeddings),
      dims AS (SELECT unnest(range(0, $DIM)) AS dim)
      SELECT e.vec_id, CAST(d.dim AS INTEGER) AS dim,
        CASE WHEN n.nrm > 0 THEN CAST(e.embedding[d.dim + 1] AS DOUBLE) / n.nrm END AS value
      FROM embeddings e JOIN n USING (vec_id), dims d
      ORDER BY vec_id, dim"""))

  // ---------------------------------------------------------------- q66
  private val RICH_M = 16
  private val RICH_KSUB = 16
  private val RICH_SUBDIM = DIM / RICH_M

  /** The RICH-codebook IVF×PQ tier — the opt-in recall refinement the
    * SURVEY §2.4 design note reserves for when raw-ADC ranking at the
    * compact q52 codebook (m=4, ksub=4: 4·4=16 B of codebook per
    * subspace) misranks too much: same routing, same raw-vector encode
    * (at-rest code stability — a rich index is just ANOTHER model+code
    * table, old codes stay valid under their own model), but m=16
    * subspaces × ksub=16 sub-centroids, i.e. 4-dim subvectors against
    * 16-entry codebooks. Measured on the oracle fixture (RecallSpec):
    * recall@3 at nprobe=2 rises 0.067 → 0.233 (3.5×), against a 0.700
    * routing ceiling — quantization, not routing, was the binding loss.
    * Cost shape is unchanged: codes are 16 small ints/row (vs 4), ADC is
    * one codegen'd pass either way; training is 16 subspace trainers
    * over the same one corpus scan each. Every arithmetic step is the
    * proven-portable q48/q50 machinery at different (m, ksub), so the
    * whole train→route→encode→search path hash-matches DuckDB. */
  val q66 = QueryDef("q66_ann_ivf_pq_rich",
    (s, dir) => {
      val e = emb(s, dir)
      val coarse = graft.api.GraftOps.kmeansFit(e, col("vec_id"), col("embedding"),
        k = IVFPQ_K, iters = 1)
      val pq = graft.api.GraftOps.pqFit(e, col("vec_id"), col("embedding"),
        dim = DIM, m = RICH_M, ksub = RICH_KSUB, iters = 1)
      graft.api.GraftOps.ivfPqTopK(e, col("vec_id"), col("embedding"),
          col("vec_id") < 10, coarse, pq, dim = DIM, k = 3, nprobe = IVFPQ_NPROBE)
        .select(col("probe_id"), col("id").as("vec_id"), col("rank"), col("adc"))
        .orderBy("probe_id", "rank")
    },
    Some(s"""
      WITH hashed AS (
        SELECT vec_id, embedding,
          ${Duck.ph("'km|' || CAST(vec_id AS VARCHAR)")} AS h
        FROM embeddings),
      seeds AS (
        SELECT embedding,
          CAST(row_number() OVER (ORDER BY h, vec_id) AS INTEGER) - 1 AS cluster
        FROM hashed ORDER BY h, vec_id LIMIT $IVFPQ_K),
      seeds16 AS (
        SELECT embedding,
          CAST(row_number() OVER (ORDER BY h, vec_id) AS INTEGER) - 1 AS cluster
        FROM hashed ORDER BY h, vec_id LIMIT $RICH_KSUB),
      gcvec0 AS (
        SELECT cluster,
          list_transform(range(1, ${DIM + 1}),
            i -> floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) / 1000000.0) AS cvec
        FROM seeds),
      gscored AS (
        SELECT e.vec_id, e.embedding, c.cluster,
          ${dotColSql("e.embedding", "c.cvec")} AS score
        FROM embeddings e, gcvec0 c),
      gasg AS (
        SELECT vec_id, embedding, cluster FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cluster) AS rn
          FROM gscored) WHERE rn = 1),
      gcent AS (
        SELECT cluster, CAST(i - 1 AS INTEGER) AS dim,
          CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
            / 1000000.0 / COUNT(*) AS centroid
        FROM gasg, (SELECT unnest(range(1, ${DIM + 1})) AS i) idx
        GROUP BY cluster, dim),
      gcvec1 AS (
        SELECT cluster,
          list_transform(list_sort(list({'dim': dim, 'cv': centroid})), p -> p.cv) AS cvec
        FROM gcent GROUP BY cluster),
      cranked AS (
        SELECT vec_id, embedding, cluster,
          row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cluster) AS crn
        FROM (
          SELECT e.vec_id, e.embedding, c.cluster,
            ${dotColSql("e.embedding", "c.cvec")} AS score
          FROM embeddings e, gcvec1 c)),
      assigned AS (
        SELECT vec_id, cluster AS cell FROM cranked WHERE crn = 1),
      probecells AS (
        SELECT vec_id AS probe_id, embedding AS pe, cluster AS cell
        FROM cranked WHERE vec_id < 10 AND crn <= $IVFPQ_NPROBE),
      ${(0 until RICH_M).map(s0 => pqSubspaceSqlW(s0, RICH_SUBDIM, "seeds16")).mkString(",\n      ")},
      codes AS (
        SELECT c0.vec_id, ${(0 until RICH_M).map(s0 => s"c$s0.code AS code$s0").mkString(", ")}
        FROM code_0 c0 ${(1 until RICH_M).map(s0 => s"JOIN code_$s0 c$s0 USING (vec_id)").mkString(" ")}),
      pairs AS (
        SELECT probe_id, v.vec_id,
          (${(0 until RICH_M).map(s0 => dotSubSqlW("pe", s"cv$s0.cvec", s0 * RICH_SUBDIM, RICH_SUBDIM)).mkString(" + ")}) AS adc
        FROM probecells p
          JOIN assigned a ON a.cell = p.cell
          JOIN codes v ON v.vec_id = a.vec_id
          ${(0 until RICH_M).map(s0 => s"JOIN cvec_$s0 cv$s0 ON cv$s0.cluster = v.code$s0").mkString("\n          ")}
        WHERE v.vec_id <> probe_id),
      ranked AS (
        SELECT probe_id, vec_id,
          CAST(row_number() OVER (PARTITION BY probe_id ORDER BY adc DESC, vec_id) AS INTEGER) AS rank,
          adc
        FROM pairs)
      SELECT probe_id, vec_id, rank, adc
      FROM ranked WHERE rank <= 3
      ORDER BY probe_id, rank"""))

  // ---------------------------------------------------------------- q71
  /** SQ8 scalar-quantization ANN: per-dimension [lo, hi] ranges train in
    * one aggregate (min/max are value-exact — no quantization step, no
    * codebook search), every vector encodes to 1 byte/dim (4× smaller
    * than the floats, the compression tier below PQ's 4·m bytes/row),
    * probes score candidates asymmetrically against the dequantized
    * reconstruction. Every arithmetic step (floor-encode, lo+code·step
    * decode, sequential-fold dot) is stated identically here and in the
    * SQL, so the whole train→encode→search path hash-matches DuckDB. */
  val q71 = QueryDef("q71_ann_sq8",
    (s, dir) => {
      val e = emb(s, dir)
      val model = graft.api.GraftOps.sqFit(e, col("embedding"))
      graft.api.GraftOps.sqTopK(e, col("vec_id"), col("embedding"),
          col("vec_id") < 10, model, k = 3)
        .select(col("probe_id"), col("id").as("vec_id"), col("rank"), col("sq"))
        .orderBy("probe_id", "rank")
    },
    Some(s"""
      WITH stats AS (
        SELECT CAST(i AS INTEGER) - 1 AS dim,
          MIN(CAST(embedding[i] AS DOUBLE)) AS lo,
          MAX(CAST(embedding[i] AS DOUBLE)) AS hi
        FROM embeddings, (SELECT unnest(range(1, ${DIM + 1})) AS i) ix
        GROUP BY dim),
      mdl AS (
        SELECT
          list_transform(list_sort(list({'d': dim, 'v': lo})), p -> p.v) AS los,
          list_transform(list_sort(list({'d': dim, 'v': hi})), p -> p.v) AS his
        FROM stats),
      codes AS (
        SELECT vec_id, list_transform(range(1, ${DIM + 1}), i ->
          CASE WHEN his[i] = los[i] THEN 0
               ELSE LEAST(GREATEST(CAST(floor(
                 (CAST(embedding[i] AS DOUBLE) - los[i]) * 255.0 / (his[i] - los[i])
               ) AS INTEGER), 0), 255) END) AS cds
        FROM embeddings, mdl),
      probes AS (
        SELECT vec_id AS probe_id, embedding AS pe FROM embeddings WHERE vec_id < 10),
      pairs AS (
        SELECT probe_id, c.vec_id,
          list_reduce(list_transform(range(1, ${DIM + 1}), i ->
            CAST(pe[i] AS DOUBLE) * (los[i] + cds[i] * ((his[i] - los[i]) / 255.0))),
            (p, q) -> p + q) AS sq
        FROM probes, codes c, mdl WHERE c.vec_id <> probe_id),
      ranked AS (
        SELECT probe_id, vec_id,
          CAST(row_number() OVER (PARTITION BY probe_id ORDER BY sq DESC, vec_id) AS INTEGER) AS rank,
          sq
        FROM pairs)
      SELECT probe_id, vec_id, rank, sq
      FROM ranked WHERE rank <= 3
      ORDER BY probe_id, rank"""))

  // ---------------------------------------------------------------- q84
  /** The RESIDUAL-PQ (IVFADC) opt-in tier at the q52 configuration: the
    * same coarse quantizer routes, but the PQ codebooks train on and the
    * codes quantize `v − c(v)` — each vector minus its cell's centroid —
    * and the ADC score reconstructs through the cell:
    * `⟨p, c(v)⟩ + ⟨p, r̂(v)⟩`. Inside a cell the residual ball is a
    * cell-radius, so the SAME (m, ksub) codebook budget yields strictly
    * finer resolution (RecallSpec measures the residual tier beating the
    * equal-bytes rich tier). Opt-in because residual codes bind to the
    * frozen coarse model — a coarse retrain invalidates them (no
    * reindexCells cheap path) — so raw-vector PQ stays the default
    * lifecycle. Every arithmetic step (coarse chain, residual subtract,
    * subspace trainers over the residual frame, celldot + subspace-sum
    * ADC) is stated identically on both sides, so the whole
    * train→route→encode→search path hash-matches DuckDB. */
  val q84 = QueryDef("q84_ann_residual_pq",
    (s, dir) => {
      val e = emb(s, dir)
      val coarse = graft.api.GraftOps.kmeansFit(e, col("vec_id"), col("embedding"),
        k = IVFPQ_K, iters = 1)
      val rpq = graft.api.GraftOps.pqFitResidual(e, col("vec_id"), col("embedding"),
        coarse, dim = DIM, m = PQ_M, ksub = PQ_KSUB, iters = 1)
      graft.api.GraftOps.ivfRpqTopK(e, col("vec_id"), col("embedding"),
          col("vec_id") < 10, coarse, rpq, dim = DIM, k = 3, nprobe = IVFPQ_NPROBE)
        .select(col("probe_id"), col("id").as("vec_id"), col("rank"), col("adc"))
        .orderBy("probe_id", "rank")
    },
    Some(s"""
      WITH hashed AS (
        SELECT vec_id, embedding,
          ${Duck.ph("'km|' || CAST(vec_id AS VARCHAR)")} AS h
        FROM embeddings),
      seeds AS (
        SELECT embedding,
          CAST(row_number() OVER (ORDER BY h, vec_id) AS INTEGER) - 1 AS cluster
        FROM hashed ORDER BY h, vec_id LIMIT $IVFPQ_K),
      gcvec0 AS (
        SELECT cluster,
          list_transform(range(1, ${DIM + 1}),
            i -> floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) / 1000000.0) AS cvec
        FROM seeds),
      gscored AS (
        SELECT e.vec_id, e.embedding, c.cluster,
          ${dotColSql("e.embedding", "c.cvec")} AS score
        FROM embeddings e, gcvec0 c),
      gasg AS (
        SELECT vec_id, embedding, cluster FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cluster) AS rn
          FROM gscored) WHERE rn = 1),
      gcent AS (
        SELECT cluster, CAST(i - 1 AS INTEGER) AS dim,
          CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)) AS DOUBLE)
            / 1000000.0 / COUNT(*) AS centroid
        FROM gasg, (SELECT unnest(range(1, ${DIM + 1})) AS i) idx
        GROUP BY cluster, dim),
      gcvec1 AS (
        SELECT cluster,
          list_transform(list_sort(list({'dim': dim, 'cv': centroid})), p -> p.cv) AS cvec
        FROM gcent GROUP BY cluster),
      cranked AS (
        SELECT vec_id, embedding, cluster, score,
          row_number() OVER (PARTITION BY vec_id ORDER BY score DESC, cluster) AS crn
        FROM (
          SELECT e.vec_id, e.embedding, c.cluster,
            ${dotColSql("e.embedding", "c.cvec")} AS score
          FROM embeddings e, gcvec1 c)),
      assigned AS (
        SELECT vec_id, cluster AS cell FROM cranked WHERE crn = 1),
      probecells AS (
        SELECT vec_id AS probe_id, embedding AS pe, cluster AS cell, score AS celldot
        FROM cranked WHERE vec_id < 10 AND crn <= $IVFPQ_NPROBE),
      resid AS (
        SELECT e.vec_id,
          list_transform(range(1, ${DIM + 1}),
            i -> CAST(e.embedding[i] AS DOUBLE) - list_extract(g.cvec, i)) AS embedding
        FROM embeddings e
          JOIN assigned a ON a.vec_id = e.vec_id
          JOIN gcvec1 g ON g.cluster = a.cell),
      seedids AS (
        SELECT vec_id,
          CAST(row_number() OVER (ORDER BY h, vec_id) AS INTEGER) - 1 AS cluster
        FROM hashed ORDER BY h, vec_id LIMIT $PQ_KSUB),
      rseeds AS (
        SELECT r.embedding, s.cluster FROM seedids s JOIN resid r USING (vec_id)),
      ${(0 until PQ_M).map(s0 => pqSubspaceSqlW(s0, PQ_SUBDIM, "rseeds", "resid")).mkString(",\n      ")},
      codes AS (
        SELECT c0.vec_id, ${(0 until PQ_M).map(s0 => s"c$s0.code AS code$s0").mkString(", ")}
        FROM code_0 c0 ${(1 until PQ_M).map(s0 => s"JOIN code_$s0 c$s0 USING (vec_id)").mkString(" ")}),
      pairs AS (
        SELECT probe_id, v.vec_id,
          p.celldot + (${(0 until PQ_M).map(s0 => dotSubSql("pe", s"cv$s0.cvec", s0 * PQ_SUBDIM)).mkString(" + ")}) AS adc
        FROM probecells p
          JOIN assigned a ON a.cell = p.cell
          JOIN codes v ON v.vec_id = a.vec_id
          ${(0 until PQ_M).map(s0 => s"JOIN cvec_$s0 cv$s0 ON cv$s0.cluster = v.code$s0").mkString("\n          ")}
        WHERE v.vec_id <> probe_id),
      ranked AS (
        SELECT probe_id, vec_id,
          CAST(row_number() OVER (PARTITION BY probe_id ORDER BY adc DESC, vec_id) AS INTEGER) AS rank,
          adc
        FROM pairs)
      SELECT probe_id, vec_id, rank, adc
      FROM ranked WHERE rank <= 3
      ORDER BY probe_id, rank"""))

  // --------------------------------------------------------------- q128
  /** MMR diversified re-rank of the q13 exact top-20: 10 probes, λ =
    * 0.7, k = 5 — relevance is the probe cosine, diversity the
    * candidate–candidate cosine, and the oracle restates the IDENTICAL
    * greedy walk as a recursive CTE carrying the selected set as list
    * columns (the q117 stepping pattern applied to a SELECTION instead
    * of a value), so every emitted mmr double is bit-equal. Exercises
    * [[graft.api.GraftOps.mmrRerank]]. */
  val q128 = {
    val LAM = "(CAST(700000 AS DOUBLE) / 1000000.0)"
    val mExpr = s"($LAM * c.r - (1.0 - $LAM) * list_aggregate(" +
      s"""list_transform(s.sel_v, sv -> ${Duck.cosine("c.v", "sv")}), 'max'))"""
    QueryDef("q128_mmr_rerank",
      (s, dir) => {
        val e = emb(s, dir)
        val cand = graft.api.GraftOps.knn(e, e.filter(col("vec_id") < 10),
            col("vec_id"), col("embedding"), col("vec_id"),
            col("embedding"), k = 20)
          .join(e.select(col("vec_id").as("id"), col("embedding")),
            Seq("id"))
        graft.api.GraftOps.mmrRerank(cand, col("probe_id"), col("id"),
            col("sim"), col("embedding"), k = 5, lambdaPpm = 700000L)
          .select(col("query").as("probe_id"), col("rank"),
            col("doc").as("vec_id"), col("mmr"))
          .orderBy("probe_id", "rank")
      },
      Some(s"""
        WITH RECURSIVE cand AS (
          SELECT q, d, r, v FROM (
            SELECT p.vec_id AS q, e.vec_id AS d,
              ${Duck.cosine("p.embedding", "e.embedding")} AS r,
              e.embedding AS v,
              row_number() OVER (PARTITION BY p.vec_id
                ORDER BY ${Duck.cosine("p.embedding", "e.embedding")} DESC,
                  e.vec_id) AS rn
            FROM embeddings p, embeddings e
            WHERE p.vec_id < 10 AND e.vec_id <> p.vec_id)
          WHERE rn <= 20),
        r AS (
          SELECT q, 1 AS rank, d, $LAM * r AS m,
            [d] AS sel_d, [v] AS sel_v
          FROM (SELECT q, d, r, v, row_number() OVER (PARTITION BY q
              ORDER BY $LAM * r DESC, d) AS rn FROM cand)
          WHERE rn = 1
          UNION ALL
          SELECT q, rank + 1, d, m,
            list_append(sel_d, d), list_append(sel_v, v)
          FROM (
            SELECT s.q, s.rank, c.d, c.v, s.sel_d, s.sel_v,
              $mExpr AS m,
              row_number() OVER (PARTITION BY s.q
                ORDER BY $mExpr DESC, c.d) AS rn
            FROM r s JOIN cand c
              ON c.q = s.q AND NOT list_contains(s.sel_d, c.d)
            WHERE s.rank < 5)
          WHERE rn = 1)
        SELECT q AS probe_id, CAST(rank AS INTEGER) AS rank,
          d AS vec_id, m AS mmr
        FROM r ORDER BY probe_id, rank"""))
  }

  // --------------------------------------------------------------- q154
  /** Exact integer Gram matrix of the embeddings table — the sufficient
    * statistic PCA/whitening starts from, hash-gated because every cell
    * is an exact Long sum of floor-micros products (the q21/q48
    * convention applied to second moments). One GramAgg pass, O(dim²)
    * task state, zero row expansion; the oracle restates the identical
    * integer arithmetic over the 2,080 (i ≤ j) dim pairs. Exercises
    * [[graft.api.GraftOps.gramMatrix]]. */
  val q154 = QueryDef("q154_gram_matrix",
    (s, dir) =>
      graft.api.GraftOps.gramMatrix(emb(s, dir), col("embedding"), DIM),
    Some(s"""
      WITH p AS (
        SELECT CAST(a.i AS INTEGER) - 1 AS i, CAST(b.i AS INTEGER) - 1 AS j,
          CAST(a.i AS BIGINT) AS ii, CAST(b.i AS BIGINT) AS jj
        FROM (SELECT unnest(range(1, ${DIM + 1})) AS i) a,
             (SELECT unnest(range(1, ${DIM + 1})) AS i) b
        WHERE a.i <= b.i)
      SELECT p.i, p.j,
        CAST(SUM(
          CAST(floor(CAST(embedding[p.ii] AS DOUBLE) * 1000000) AS BIGINT) *
          CAST(floor(CAST(embedding[p.jj] AS DOUBLE) * 1000000) AS BIGINT))
        AS BIGINT) AS g
      FROM embeddings, p
      GROUP BY 1, 2
      ORDER BY i, j"""))

  /** PCA projection of every embedding onto the top-8 principal
    * components (fit + project, model flowing as a table). Rows-only
    * by design — eigenvectors are iterative float output no SQL engine
    * restates; the laws live in the suite (orthonormality, eigen
    * residual, descending eigenvalues, planted-direction recovery,
    * determinism) and the corpus-side statistic the fit consumes is
    * exactly q154's hash-gated Gram. Exercises
    * [[graft.api.GraftOps.pcaFit]] / pcaProject. */
  val q154b = QueryDef("q154b_pca_project",
    (s, dir) => {
      val e = emb(s, dir)
      val model = graft.api.GraftOps.pcaFit(e, col("embedding"), DIM, k = 8)
      graft.api.GraftOps.pcaProject(e, col("embedding"), model, DIM)
        .select(col("vec_id"), posexplode(col("proj")).as(Seq("dim", "value")))
        .orderBy("vec_id", "dim")
    },
    None)

  // --------------------------------------------------------------- q159
  /** Ridge quality-scorer fit + corpus-scale apply (λ = 0.1): train a
    * linear scorer of `label` on the embeddings and score every vector
    * — the CCNet/fastText quality-filter workflow end to end. Rows-only
    * by design (the Cholesky solve is float output no SQL engine
    * restates, the q154b posture); the laws live in the suite (exact
    * planted-relation recovery, λ-shrinkage, determinism, bit-equality
    * with the summary-fed fit) and the ONE corpus statistic the fit
    * consumes is the q154-hash-gated augmented Gram. Scores surface as
    * floor-micros so the dump is integer-stable. Exercises
    * [[graft.api.GraftOps.ridgeFit]] / ridgeApply. */
  val q159 = QueryDef("q159_ridge_score",
    (s, dir) => {
      val e = emb(s, dir)
      val model = graft.api.GraftOps.ridgeFit(e, col("embedding"),
        col("label").cast("double"), DIM, lambdaPpm = 100000L)
      graft.api.GraftOps.ridgeApply(e, col("embedding"), model, DIM)
        .select(col("vec_id"), col("label"),
          floor(col("score") * lit(1000000.0)).as("score_us"))
        .orderBy("vec_id")
    },
    None)

  // --------------------------------------------------------------- q165
  /** Logistic quality-scorer fit + corpus-scale apply: IRLS-train a
    * probability-of-quality model of "label ≥ 5" on the embeddings
    * (4 Newton iterations, λ = 0.1 — each iteration ONE exact Gram
    * pass) and score every vector with σ(β·x + b) — the actual
    * CCNet/fastText model class (q159's ridge is its linear sibling;
    * this face emits normalized (0,1) probabilities that q160's
    * calibration consumes directly). Rows-only by design (iterative
    * float IRLS — no SQL restatement; the q159 posture) with the laws
    * spec-pinned: planted-model recovery, loss decrease, λ-shrinkage,
    * bit-equal determinism. Scores surface as floor-micros so the dump
    * is integer-stable. Exercises
    * [[graft.api.GraftOps.logisticFit]] / logisticApply. */
  val q165 = QueryDef("q165_logistic_score",
    (s, dir) => {
      val e = emb(s, dir)
      val model = graft.api.GraftOps.logisticFit(e, col("embedding"),
        col("label") >= 5, DIM, iters = 4, lambdaPpm = 100000L)
      graft.api.GraftOps.logisticApply(e, col("embedding"), model, DIM)
        .select(col("vec_id"), col("label"),
          floor(col("score") * lit(1000000.0)).as("score_us"))
        .orderBy("vec_id")
    },
    None)

  val all: Seq[QueryDef] = Seq(q13, q20, q21, q34, q48, q50, q52, q60, q61,
    q62, q66, q71, q84, q128, q154, q154b, q159, q165)
}
