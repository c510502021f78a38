package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.GraftOps

/** Quantitative recall characterization of the approximate similarity
  * paths against exact kNN — the measured counterpart to the analytic
  * collision-probability bounds in GraftOps' Scaladoc. Runs on the sf0.01
  * fixture (2000 embeddings, 10 probes, 10 label cells), the same data the
  * oracle gate checks.
  *
  * recall@3 = |approx top-3 ∩ exact top-3| / |exact top-3|, over all
  * probes. IVF recall is provably non-decreasing in nprobe (a larger
  * candidate set can only add exact-top-3 members, and any present member
  * is selected because at most 2 corpus vectors score higher), and
  * nprobe = |cells| degenerates to exact kNN — both asserted.
  */
class RecallSpec extends AnyFunSuite with SharedSpark {

  private val sf01 = "/root/testdata/sf0.01"

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.collect().map(r =>
      (r.getAs[Long]("probe_id"), r.getAs[Long]("id"))).toSet

  test("measured recall@3: LSH floor, IVF nprobe curve monotone to 1.0") {
    val e = Tables.load(spark, sf01, "embeddings")
    val probes = e.filter(col("vec_id") < 10)
    val exact = pairs(GraftOps.knn(e, probes, col("vec_id"), col("embedding"),
      col("vec_id"), col("embedding"), k = 3))
    assert(exact.size == 30, s"10 probes x top-3 expected; got ${exact.size}")

    // q20's hyperplane-LSH ANN (6 planes, within-bucket exact top-3)
    val lsh = graft.operators.SimilarityOps.q20.run(spark, sf01)
      .select(col("probe_id"), col("vec_id").as("id"))
    val lshRecall = (exact intersect pairs(lsh)).size.toDouble / exact.size
    info(f"LSH (6 hyperplanes) recall@3 = $lshRecall%.3f")

    // q34's IVF, nprobe swept 1..K (K = 10 label cells)
    val curve = (1 to 10).map { n =>
      val ivf = pairs(GraftOps.ivfTopK(e, col("vec_id"), col("embedding"),
        col("label"), col("vec_id") < 10, k = 3, nprobe = n))
      val r = (exact intersect ivf).size.toDouble / exact.size
      info(f"IVF nprobe=$n%2d recall@3 = $r%.3f")
      n -> r
    }
    val recalls = curve.map(_._2)
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
      s"IVF recall must be non-decreasing in nprobe: $curve")
    assert(recalls.last == 1.0,
      s"nprobe = |cells| must recover exact kNN; got ${recalls.last}")
    // Measured on this fixture (near-orthogonal random embeddings — exact
    // top-3 neighbors sit at LOW cosine): LSH 0.033, IVF nprobe=1 0.133,
    // IVF reaches 1.0 by nprobe=9. Hyperplane LSH keeps ~corpus/2^6
    // candidates, so for neighbors at ~75° its per-pair collision
    // probability is (1−θ/π)^6 ≈ 0.03 — the measured value. The floors
    // below catch collapse (empty candidate sets, broken planes), not
    // fixture jitter; the HIGH-similarity regime LSH is designed for is
    // measured in the planted-pair test that follows.
    assert(lshRecall >= 0.02, f"LSH recall collapsed: $lshRecall%.3f")
    assert(recalls.head >= 0.08, f"IVF nprobe=1 recall collapsed: ${recalls.head}%.3f")
  }

  test("IVFxPQ richer-codebook tier: recall@3 curve at equal nprobe") {
    import org.apache.spark.sql.DataFrame
    val e = Tables.load(spark, sf01, "embeddings")
    val coarse = GraftOps.kmeansFit(e, col("vec_id"), col("embedding"),
      k = 4, iters = 1)
    val exact = pairs(GraftOps.knn(e, e.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"), k = 3))
    def recallAt(m: Int, ksub: Int): Double = {
      val mdl = GraftOps.pqFit(e, col("vec_id"), col("embedding"),
        dim = 64, m = m, ksub = ksub, iters = 1)
      val got = pairs(GraftOps.ivfPqTopK(e, col("vec_id"), col("embedding"),
        col("vec_id") < 10, coarse, mdl, 64, k = 3, nprobe = 2))
      (exact intersect got).size.toDouble / exact.size
    }
    val base = recallAt(4, 4) // the q52 oracle configuration
    info(f"m= 4 ksub= 4 (q52 tier) recall@3 nprobe=2 = $base%.3f")
    val curve = Seq((8, 16), (16, 16), (32, 16)).map { case (m, k) =>
      val r = recallAt(m, k)
      info(f"m=$m%2d ksub=$k%2d            recall@3 nprobe=2 = $r%.3f")
      (m, k, r)
    }
    // routing ceiling at this nprobe: exhaustive rerank removes ALL
    // quantization error, leaving only the coarse-routing loss
    val ceilPairs = pairs(GraftOps.ivfPqTopK(e, col("vec_id"), col("embedding"),
      col("vec_id") < 10, coarse,
      GraftOps.pqFit(e, col("vec_id"), col("embedding"), 64, 4, 4, 1),
      64, k = 3, nprobe = 2, rerank = e.count().toInt))
    val ceiling = (exact intersect ceilPairs).size.toDouble / exact.size
    info(f"routing ceiling (exhaustive rerank) at nprobe=2 = $ceiling%.3f")
    assert(base > 0.0 && ceiling >= base)
    // the q66 rich tier (m=16, ksub=16) must at least DOUBLE the compact
    // tier's recall at equal nprobe — the quantization loss, not routing,
    // is what the richer codebook buys back (measured 0.067 -> 0.233 on
    // this deterministic fixture, ceiling 0.700)
    val rich = curve.collectFirst { case (16, 16, r) => r }.get
    assert(rich >= 2.0 * base,
      f"rich codebook tier under 2x the compact tier: $rich%.3f vs base $base%.3f")
  }

  test("residual-PQ tier: recall@3 >= rich tier at equal bytes") {
    // The SURVEY §2.4 design-note trade, measured: residual codebooks
    // (pqFitResidual — quantize v − c(v), score celldot + residual ADC)
    // against raw-vector codebooks at the SAME (m, ksub) = the same
    // bytes/row and the same codebook budget. Inside a coarse cell the
    // residual ball is a cell-radius, so the residual tier's resolution
    // is strictly finer wherever routing is informative; the assertion
    // pins the design claim (>= at equal bytes), the info lines record
    // the measured gap.
    val e = Tables.load(spark, sf01, "embeddings")
    val coarse = GraftOps.kmeansFit(e, col("vec_id"), col("embedding"),
      k = 4, iters = 1)
    val exact = pairs(GraftOps.knn(e, e.filter(col("vec_id") < 10),
      col("vec_id"), col("embedding"), col("vec_id"), col("embedding"), k = 3))
    def rawRecall(m: Int, ksub: Int): Double = {
      val mdl = GraftOps.pqFit(e, col("vec_id"), col("embedding"),
        dim = 64, m = m, ksub = ksub, iters = 1)
      val got = pairs(GraftOps.ivfPqTopK(e, col("vec_id"), col("embedding"),
        col("vec_id") < 10, coarse, mdl, 64, k = 3, nprobe = 2))
      (exact intersect got).size.toDouble / exact.size
    }
    def residRecall(m: Int, ksub: Int): Double = {
      val mdl = GraftOps.pqFitResidual(e, col("vec_id"), col("embedding"),
        coarse, dim = 64, m = m, ksub = ksub, iters = 1)
      val got = pairs(GraftOps.ivfRpqTopK(e, col("vec_id"), col("embedding"),
        col("vec_id") < 10, coarse, mdl, 64, k = 3, nprobe = 2))
      (exact intersect got).size.toDouble / exact.size
    }
    val configs = Seq((4, 4), (16, 16))
    val measured = configs.map { case (m, k) =>
      val raw = rawRecall(m, k)
      val res = residRecall(m, k)
      info(f"m=$m%2d ksub=$k%2d  raw-PQ recall@3 = $raw%.3f   residual-PQ recall@3 = $res%.3f")
      (m, k, raw, res)
    }
    // the rich-bytes configuration is the design claim: residual >= rich
    val (_, _, rich, residRich) = measured.find(c => c._1 == 16 && c._2 == 16).get
    assert(residRich >= rich,
      f"residual tier under the equal-bytes rich tier: $residRich%.3f < $rich%.3f")
    assert(residRich > 0.0, "residual tier recall collapsed to zero")
  }

  test("measured recall of banded LSH on planted high-similarity pairs") {
    // embeddingNearDup's OR-amplified 8-band × 4-bit LSH is built for the
    // near-dup regime (cosine ≥ threshold ≈ 0.95): analytic recall there
    // is 1−(1−p^4)^8 with p = 1−θ/π → ~1 as θ→0. This measures it:
    // 200 planted jittered pairs, recall = recovered fraction vs the
    // exact quadratic path on identical data.
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def base(): Array[Float] = Array.fill(64)(rnd.nextFloat() * 2 - 1)
    def jitter(v: Array[Float]): Array[Float] =
      v.map(x => x + rnd.nextFloat() * 0.08f - 0.04f) // cosine ≈ 0.97-0.999
    val rows = (0 until 200).flatMap { i =>
      val v = base()
      Seq((i * 2L, v.toSeq), (i * 2L + 1, jitter(v).toSeq))
    }
    val df = rows.toDF("vid", "v")
    def pairSet(quad: Boolean) = graft.api.GraftOps.embeddingNearDup(
        df, org.apache.spark.sql.functions.col("vid"),
        org.apache.spark.sql.functions.col("v"), threshold = 0.95,
        allowQuadratic = quad, sizeHint = if (quad) None else Some(Long.MaxValue - 1))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairSet(quad = true)
    val lsh = pairSet(quad = false)
    assert(exact.size >= 150, s"fixture sanity: ${exact.size} high-sim pairs")
    val recall = (exact intersect lsh).size.toDouble / exact.size
    info(f"banded 8x4 LSH recall at sim>=0.95: $recall%.4f (${exact.size} true pairs)")
    assert(lsh.subsetOf(exact), "LSH must verify candidates exactly (no false pairs)")
    assert(recall >= 0.95, f"banded LSH recall in its design regime: $recall%.4f")
  }

  test("semantic dedup: planted near-dup recall through learned cells") {
    // semanticDedupPairs routes candidates through k-means cells instead
    // of random hyperplane buckets: a planted pair is missed ONLY when
    // its two near-identical vectors straddle a cell boundary. With 100
    // planted pairs at cosine ≥ ~0.98 the measured recall should be near
    // 1 (boundary straddles are rare because the pair's two vectors are
    // ~0.1 rad apart while cells are ~π/4 wide); the floor catches
    // collapse (broken routing, empty cells), not jitter.
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    def unit(): Array[Float] = {
      val v = Array.fill(64)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / n).toFloat)
    }
    val rows = (0 until 100).flatMap { i =>
      val v = unit()
      val near = v.map(x => x + (rnd.nextGaussian() * 0.02).toFloat)
      Seq((i * 2L, v.toSeq), (i * 2L + 1, near.toSeq))
    }
    val df = rows.toDF("vec_id", "embedding")
    val found = graft.api.GraftOps.semanticDedupPairs(df,
        org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"),
        k = 8, threshold = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val planted = (0 until 100).map(i => (i * 2L, i * 2L + 1)).toSet
    val recall = (planted intersect found).size.toDouble / planted.size
    info(f"semantic (k=8 cells) planted-pair recall at sim>=0.95: $recall%.4f")
    assert(found.subsetOf(planted),
      "cell routing must not invent pairs: every found pair is exact-cosine-verified")
    assert(recall >= 0.9, f"semantic dedup recall collapsed: $recall%.4f")
    // End-to-end: every found pair is disjoint (perfect matching), so
    // the keep-best apply drops exactly one member per found pair.
    val touched = found.toSeq.flatMap(p => Seq(p._1, p._2))
    assert(touched.distinct.size == touched.size, "found pairs form a matching")
    val kept = graft.api.GraftOps.semanticDedup(df,
      org.apache.spark.sql.functions.col("vec_id"),
      org.apache.spark.sql.functions.element_at(
        org.apache.spark.sql.functions.col("embedding"), 1).cast("double"),
      org.apache.spark.sql.functions.col("embedding"),
      k = 8, threshold = 0.95).count()
    assert(kept == 200 - found.size,
      s"semanticDedup must drop one member per cluster: kept $kept of 200, ${found.size} pairs")
  }

  test("semantic dedup nprobe=2: a planted cell-boundary pair is missed at 1, found at 2") {
    // The documented approximate contract of clustered dedup is exactly
    // this miss: two near-identical vectors straddling a cell boundary.
    // Fixture: two tight blobs at +e0 and -e0 (so k=2 k-means converges
    // onto them), plus ONE planted pair sitting on the boundary —
    // orthogonal to the blob axis with a tiny +-eps tilt along it, so
    // its members' argmax cells DIFFER while their mutual cosine is
    // ~1-2eps^2. nprobe=2 routes each row to both cells, turning the
    // boundary miss into an equi-join hit; nprobe=1 stays the q83 plan.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dim = 8
    def v(parts: (Int, Double)*): Seq[Float] = {
      val a = Array.fill(dim)(0.0)
      parts.foreach { case (i, x) => a(i) = x }
      val n = math.sqrt(a.map(x => x * x).sum)
      a.map(x => (x / n).toFloat).toSeq
    }
    val rnd = new scala.util.Random(13)
    def blob(sign: Double, base: Long) = (0 until 20).map { j =>
      (base + j, v(0 -> sign, 1 -> rnd.nextGaussian() * 0.05,
        2 -> rnd.nextGaussian() * 0.05))
    }
    val eps = 0.02
    val planted = Seq(
      (1000L, v(0 -> eps, 3 -> 1.0)),
      (1001L, v(0 -> -eps, 3 -> 1.0)))
    val df = (blob(1.0, 0L) ++ blob(-1.0, 100L) ++ planted)
      .toDF("vec_id", "embedding")
    def pairsAt(nprobe: Int): Set[(Long, Long)] =
      graft.api.GraftOps.semanticDedupPairs(df, col("vec_id"),
          col("embedding"), k = 2, threshold = 0.99, iters = 2,
          nprobe = nprobe)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val at1 = pairsAt(1)
    val at2 = pairsAt(2)
    assert(!at1.contains((1000L, 1001L)),
      s"fixture sanity: the planted pair must straddle cells at nprobe=1: $at1")
    assert(at2.contains((1000L, 1001L)),
      s"nprobe=2 must recover the boundary pair: $at2")
    assert(at1.subsetOf(at2), "raising nprobe only ADDS pairs, never loses any")
  }
}
