package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.CoreQueries

/** Regression guards over the oracle-verified sf0.001 goldens (the full
  * hash gate is tools/oracle_check.py; these pin a few exact values so
  * `sbt test` alone catches drift). */
class CoreQueriesSpec extends AnyFunSuite with SharedSpark {

  test("every registry query runs at sf0.001 and has stable schema") {
    SparkEntry.registry.foreach { q =>
      val df = q.run(spark, sf001)
      assert(df.columns.nonEmpty, s"${q.name} has empty schema")
      assert(df.count() >= 0, s"${q.name} failed to execute")
    }
  }

  test("q01 pricing summary matches golden first row") {
    val r = CoreQueries.q01.run(spark, sf001).collect()
    assert(r.length == 6)
    val first = r.head
    assert(first.getString(0) == "A" && first.getString(1) == "F")
    assert(first.getAs[Double]("sum_qty") == 13096.0)
    assert(first.getAs[Double]("sum_base_price") == 26731890.14)
    assert(first.getAs[Double]("sum_disc_price") == 25368762.5198)
    assert(first.getAs[Long]("count_order") == 510L)
  }

  test("q02 revenue by nation golden") {
    val r = CoreQueries.q02.run(spark, sf001).collect()
    assert(r.map(_.getString(0)).contains("NATION_12"))
    val rev = r.find(_.getString(0) == "NATION_12").get.getAs[Double]("revenue")
    assert(rev == 49750.989)
  }

  test("q03 returns exactly 10 ordered rows") {
    val r = CoreQueries.q03.run(spark, sf001).collect()
    assert(r.length == 10)
    val revs = r.map(_.getAs[Double]("revenue"))
    assert(revs.zip(revs.tail).forall { case (a, b) => a >= b }, "not sorted desc")
  }

  test("q15 exact distincts golden") {
    val r = CoreQueries.q15.run(spark, sf001).collect()
    assert(r.map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3))).toSeq ==
      Seq(("A", 10L, 200L, 1962L), ("N", 10L, 200L, 2070L), ("R", 10L, 200L, 1968L)))
  }

  test("q14 banded plan avoids nested-loop join") {
    val plan = CoreQueries.q14.run(spark, sf001).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      "theta join should be banded into an equi-join")
  }

  test("q01 pushes the shipdate filter into the parquet scan and prunes columns") {
    val plan = CoreQueries.q01.run(spark, sf001)
      .queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters") &&
      plan.contains("LessThanOrEqual(l_shipdate"), "filter must reach the scan")
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"),
      s"scan must prune unused columns, got $readSchema")
  }

  test("q02 broadcasts the dim tables") {
    val plan = CoreQueries.q02.run(spark, sf001).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "dims should broadcast")
  }

  test("oracle SQL exists for every portable query and names match queries") {
    val names = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
    // every query except the explicitly rows-only ones has an oracle
    val rowsOnly = names -- SparkEntry.oracleSql.keySet
    assert(rowsOnly == Set("q15b_approx_distinct", "q29b_percentiles_approx",
      "q09b_math_libm", // sketches aren't engine-portable; libm isn't bit-exact
      "q147b_profile_table_approx", // HLL profile tier — sketch, like q15b
      "q154b_pca_project", // iterative float eigenvectors; laws spec-pinned
      "q159_ridge_score",  // Cholesky-solve floats; laws spec-pinned like q154b
      "q165_logistic_score", // iterative IRLS floats; laws spec-pinned
      "q49_image_codec_roundtrip", // no SQL engine decodes PNG; spec-exact instead
      "q51_gif_frames_roundtrip",  // ditto for GIF; spec-exact in GraftOpsSpec
      "q53_mjpeg_video_roundtrip",  // ditto for AVI/JPEG; spec-bounded luma
      "q56_audio_pcm_roundtrip"),   // ditto for WAV; spec-exact square wave
      s"unexpected rows-only: $rowsOnly")
  }

  // 2%: percentile_approx surfaces an actual data value, exact percentile
  // interpolates between order statistics — on sf0.001 group sizes that
  // discretization alone can exceed 1%
  test("q29b approx percentiles stay within 2% of the exact q29 values") {
    val exact = CoreQueries.q29.run(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("p50"), r.getAs[Double]("p90"))).toMap
    val approx = CoreQueries.q29b.run(spark, sf001).collect()
    assert(approx.length == exact.size)
    approx.foreach { r =>
      val (p50, p90) = exact(r.getString(0))
      assert(math.abs(r.getAs[Double]("p50_approx") - p50) / p50 < 0.02,
        s"${r.getString(0)} p50 off: ${r.getAs[Double]("p50_approx")} vs $p50")
      assert(math.abs(r.getAs[Double]("p90_approx") - p90) / p90 < 0.02,
        s"${r.getString(0)} p90 off: ${r.getAs[Double]("p90_approx")} vs $p90")
    }
  }

  test("q34 assignment is a narrow projection: no window over corpus x cells") {
    val plan = graft.operators.SimilarityOps.q34.run(spark, sf001)
      .queryExecution.executedPlan.toString
    // exactly one window (the per-probe top-k); the old assignment plan had
    // a second one partitioned by vec_id over the corpus x centroid product
    val windows = plan.linesIterator.count(_.trim.startsWith("Window"))
    assert(windows <= 1, s"expected only the top-k window, got $windows:\n$plan")
  }
}
