package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, FloatType}
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws (SURVEY.md §5.4), checked over seeded pseudo-random
  * inputs (deterministic; expression-level cases evaluate the Catalyst
  * expression directly, no Spark job per case). */
class PropertySpec extends AnyFunSuite with SharedSpark {

  private val rng = new scala.util.Random(42)
  private def randVec(n: Int = 8): Array[Float] =
    Array.fill(n)(rng.nextFloat() * 20 - 10).map(v => if (math.abs(v) < 1e-3) 1f else v)

  private def cos(a: Array[Float], b: Array[Float]): Double =
    graft.functions.CosineSim(
      Literal(new GenericArrayData(a.map(x => x: Any)), ArrayType(FloatType)),
      Literal(new GenericArrayData(b.map(x => x: Any)), ArrayType(FloatType)))
      .eval(null).asInstanceOf[Double]

  test("weightedSample is monotone in BOTH weight and rate (seeded sweep)") {
    // raising any row's weight, or the global rate, must only ever ADD
    // rows — the law that makes iterative curation tuning safe (a higher
    // quality bar can't resurrect-and-drop different rows each run).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(19)
    val base = (1L to 1500L).map(i => (i, rnd.nextDouble())).toDF("id", "w")
    def kept(df: org.apache.spark.sql.DataFrame, rate: Long): Set[Long] =
      graft.api.GraftOps.weightedSample(df, col("id"), col("w"), rate)
        .select("id").as[Long].collect().toSet
    val rates = Seq(100000L, 300000L, 600000L, 1000000L)
    val byRate = rates.map(r => kept(base, r))
    byRate.sliding(2).foreach { case Seq(lo, hi) =>
      assert(lo.subsetOf(hi), "raising the rate only adds rows")
    }
    val boosted = base.withColumn("w", least(lit(1.0), col("w") * 1.7))
    rates.zip(byRate).foreach { case (r, k) =>
      assert(k.subsetOf(kept(boosted, r)), s"weight boost only adds at rate $r")
    }
  }

  test("quantileNormalize lands distinct values exactly on the (n-1)-grid") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    // distinct random scores per group: sorted qranks must be EXACTLY
    // 0/(n-1), 1/(n-1), ..., 1 — the grid law that makes a global
    // threshold mean the same thing in every group
    val df = (1 to 3).flatMap { g =>
      rnd.shuffle((1 to 50).toList).map(v => (s"g$g", v * 1.0 + g))
    }.toDF("g", "v")
    val out = graft.api.GraftOps.quantileNormalize(df, col("g"), col("v"))
      .select("g", "qrank").collect()
      .groupBy(_.getString(0)).map { case (g, rows) =>
        g -> rows.map(_.getDouble(1)).sorted.toSeq
      }
    val grid = (0 until 50).map(i => i.toDouble / 49)
    out.foreach { case (g, qs) => assert(qs == grid, s"group $g off-grid") }
  }

  test("cosine_sim is symmetric, bounded, ~1 on self, ~-1 on negation (200 cases)") {
    (1 to 200).foreach { _ =>
      val a = randVec(); val b = randVec()
      val ab = cos(a, b)
      assert(ab == cos(b, a), "symmetry")
      assert(ab >= -1.0000000001 && ab <= 1.0000000001, "bounds")
      assert(math.abs(cos(a, a) - 1.0) < 1e-9, "self")
      assert(math.abs(cos(a, a.map(-_)) + 1.0) < 1e-9, "negation")
    }
  }

  test("l2_unit preserves cosine geometry and lands on the unit sphere (200 cases)") {
    // the law connecting the two vector expressions: normalization must
    // not move angles — cos(a, b) == dot(unit(a), unit(b)) — and every
    // normalized vector must have norm ~1. Both checked expression-level
    // on seeded cases (interpreted eval path; the codegen path is pinned
    // equal by the q62 oracle + FunctionsSpec SQL round-trip).
    def unit(a: Array[Float]): Array[Double] =
      graft.functions.L2Unit(
        Literal(new GenericArrayData(a.map(x => x: Any)), ArrayType(FloatType)))
        .eval(null).asInstanceOf[GenericArrayData].toDoubleArray()
    (1 to 200).foreach { _ =>
      val a = randVec(); val b = randVec()
      val ua = unit(a); val ub = unit(b)
      assert(math.abs(ua.map(x => x * x).sum - 1.0) < 1e-12, "unit norm")
      val dot = ua.zip(ub).map { case (x, y) => x * y }.sum
      assert(math.abs(dot - cos(a, b)) < 1e-9,
        "normalization must preserve cosine geometry")
    }
  }

  test("portable hash is stable, 60-bit bounded, and seed-independent family (500 cases)") {
    (1 to 500).foreach { i =>
      val s = rng.alphanumeric.take(rng.nextInt(20)).mkString
      val h = graft.functions.Portable.phashJvm(s)
      assert(h >= 0 && h < (1L << 60))
      assert(h == graft.functions.Portable.phashJvm(s), "deterministic")
    }
  }

  test("filter commutes with projection on disjoint columns") {
    import spark.implicits._
    val df = Seq((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)).toDF("k", "s", "v")
    val left = df.filter($"k" > 1).select($"s", $"v").collect().toSet
    val right = df.select($"s", $"v", $"k").filter($"k" > 1).select($"s", $"v").collect().toSet
    assert(left == right)
  }

  test("union row-count additivity; except/intersect partition the left side") {
    import spark.implicits._
    val a = (1 to 20).toDF("x")
    val b = (15 to 30).toDF("x")
    assert(a.union(b).count() == a.count() + b.count())
    assert(a.intersect(b).count() + a.except(b).count() == a.distinct().count())
  }

  test("dedup is idempotent") {
    import spark.implicits._
    val df = Seq(1, 1, 2, 2, 2, 3).toDF("x")
    val once = df.dropDuplicates("x")
    assert(once.count() == once.dropDuplicates("x").count())
    assert(once.count() == 3)
  }

  test("repetitionScore is bounded to [0, 1) and monotone under repetition") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val texts = (1 to 50).map { i =>
      val toks = Seq.fill(3 + rng.nextInt(30))(s"t${rng.nextInt(8)}")
      (i.toLong, toks.mkString(" "))
    }
    val scores = graft.api.GraftOps.repetitionScore(texts.toDF("id", "body"), col("body"))
      .collect().map(_.getAs[Double]("rep_ratio"))
    assert(scores.forall(s => s >= 0.0 && s < 1.0), "bounds")
    // pure repetition of one trigram approaches 1, varied text stays 0
    val extremes = graft.api.GraftOps.repetitionScore(
      Seq((1L, ("x " * 50).trim), (2L, (1 to 50).map("u" + _).mkString(" ")))
        .toDF("id", "body"), col("body"))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Double]("rep_ratio")).toMap
    assert(extremes(1L) > 0.9 && extremes(2L) == 0.0)
  }

  test("stratifiedSample kept-fraction is monotone in the rate and rate-1 keeps all") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 3000).map(i => (i.toLong, "g")).toDF("k", "grp")
    def kept(ppm: Int): Long =
      graft.api.GraftOps.stratifiedSample(df, col("grp"), col("k"),
        Map.empty, defaultPpm = ppm).count()
    val ks = Seq(0, 100000, 500000, 900000, 1000000).map(kept)
    assert(ks.zip(ks.tail).forall { case (a, b) => a <= b }, s"monotone: $ks")
    assert(ks.head == 0 && ks.last == 3000, s"rate-0 drops all, rate-1 keeps all: $ks")
  }

  test("mixCorpus copy counts match a driver-side md5 reference exactly") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val keys = (1 to 500).map(_.toLong)
    val df = keys.map(k => (k, if (k % 2 == 0) "a" else "b")).toDF("k", "grp")
    val w = Map("a" -> 1750000L) // 1.75 epochs; b defaults to 0.4
    val out = graft.api.GraftOps.mixCorpus(df, col("grp"), col("k"), w,
        defaultPpm = 400000L)
      .groupBy("k").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = keys.map { k =>
      val wppm = if (k % 2 == 0) 1750000L else 400000L
      val bucket = graft.functions.Portable.phashJvm(s"mix|$k") % 1000000L
      k -> (wppm / 1000000L + (if (bucket < wppm % 1000000L) 1L else 0L))
    }.filter(_._2 >= 1).toMap
    assert(out == expected, "Spark multiset == driver-side reference")
  }

  test("mixCorpus at weight 0 drops every row; shardCorpus covers 0..n-1") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = (1 to 200).map(_.toLong).toDF("k").withColumn("grp", lit("g"))
    assert(graft.api.GraftOps.mixCorpus(df, col("grp"), col("k"), Map.empty,
      defaultPpm = 0L).count() == 0, "w=0 is an empty mix")
    val shards = graft.api.GraftOps.shardCorpus(df, col("k"), seed = 1, nShards = 4)
      .select("shard").distinct().collect().map(_.getInt(0)).toSet
    assert(shards.subsetOf((0 to 3).toSet) && shards.nonEmpty)
  }

  test("window top-k rows are a subset of their group") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val df = Seq((1, 10), (1, 20), (1, 30), (2, 5)).toDF("g", "v")
    val w = Window.partitionBy($"g").orderBy(desc("v"))
    val topk = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 2).drop("rn")
    assert(topk.except(df).count() == 0, "top-k ⊆ group rows")
    assert(topk.count() == 3)
  }

  test("maskRepeatedSpans equals a naive quadratic reference on random corpora (seeded)") {
    // the distributed inverted-index implementation vs the direct
    // definition: token t of doc d is masked iff ANY width-window of d
    // containing t appears (as a token sequence) in >= minDf distinct
    // docs. 30 random corpora over a tiny vocabulary so collisions and
    // repeats are dense.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(57)
    val vocab = Vector("a", "b", "c", "d")
    val width = 3; val minDf = 2
    (1 to 30).foreach { trial =>
      val docs = (0 until 6).map(i =>
        (i.toLong, Seq.fill(rnd.nextInt(12) + 1)(vocab(rnd.nextInt(vocab.size)))
          .mkString(" ")))
      // naive reference
      val toks = docs.map { case (id, t) => id -> t.split(" ").toSeq }.toMap
      val windows: Map[Seq[String], Set[Long]] = toks.toSeq
        .flatMap { case (id, ts) =>
          ts.sliding(width).filter(_.size == width).map(w => (w, id)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      def naiveMasked(id: Long): Set[Int] = {
        val ts = toks(id)
        (0 to ts.size - width).flatMap { s =>
          if (ts.size >= width && windows(ts.slice(s, s + width)).size >= minDf)
            (s until s + width) else Seq.empty
        }.toSet
      }
      val want = docs.map { case (id, _) =>
        val ts = toks(id)
        val m = naiveMasked(id)
        (id, ts.size, m.size,
          ts.zipWithIndex.collect { case (t, i) if !m.contains(i) => t }.mkString(" "))
      }.toSet
      val got = graft.api.GraftOps.maskRepeatedSpans(docs.toDF("id", "txt"),
          col("id"), col("txt"), width = width, minDf = minDf)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
        .toSet
      assert(got == want, s"trial $trial diverged from the naive reference")
    }
  }

  test("chunkDocuments reconstruction law on random docs (seeded)") {
    // dropping each chunk's overlap prefix (except chunk 0) and
    // concatenating must reproduce the original token stream exactly —
    // coverage, order, and boundary correctness in one equation.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(63)
    val maxT = 7; val stride = 4
    val docs = (0 until 40).map(i =>
      (i.toLong, (0 until (rnd.nextInt(40) + 1)).map(j => s"t${i}_$j").mkString(" ")))
    val chunks = graft.api.GraftOps.chunkDocuments(docs.toDF("id", "txt"),
        col("id"), col("txt"), maxTokens = maxT, stride = stride)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(3)))
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    docs.foreach { case (id, txt) =>
      val rebuilt = chunks(id).zipWithIndex.map { case (c, i) =>
        val ts = c.split(" ").toSeq
        if (i == 0) ts else ts.drop(maxT - stride)
      }.reduce(_ ++ _).mkString(" ")
      assert(rebuilt == txt, s"doc $id failed chunk reconstruction")
    }
  }

  test("zorderValue equals the bit-interleave reference; hilbert inverts (seeded)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rnd = new scala.util.Random(71)
    val pts = (0 until 500).map(_ => (rnd.nextInt(4096).toLong, rnd.nextInt(4096).toLong))
    def refZ(x: Long, y: Long): Long =
      (0 until 12).map(i => (((x >> i) & 1) << (2 * i)) | (((y >> i) & 1) << (2 * i + 1)))
        .foldLeft(0L)(_ | _)
    val got = pts.toDF("x", "y")
      .select(col("x"), col("y"),
        graft.api.GraftOps.zorderValue(col("x"), col("y"), 12).as("z"),
        graft.api.GraftOps.hilbertValue(col("x"), col("y"), 12).as("hd"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    got.foreach { case (x, y, z, _) =>
      assert(z == refZ(x, y), s"z($x, $y) != reference interleave") }
    // hilbert: distinct inputs -> distinct distances (injectivity on the
    // sample; full-grid bijectivity is proven in GraftOpsSpec)
    val ds = got.map(_._4)
    assert(ds.distinct.length == pts.distinct.length)
  }
}
