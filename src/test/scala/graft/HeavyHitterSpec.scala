package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.api.GraftOps
import graft.functions.MisraGries

/** Heavy-hitter tiers: the exact hash-agg baseline and the Misra–Gries
  * sketch + exact-recount tier must be BIT-EQUAL — the sketch only ever
  * proposes candidates; counts in the answer are always exact. */
class HeavyHitterSpec extends AnyFunSuite with SharedSpark {

  /** Zipf-ish fixture: key k_i appears max(1, 2000/i) times, i = 1..300 —
    * 300 distinct keys (≫ the sketch capacities below, so MG eviction
    * actually runs), a handful above any percent-level threshold. */
  private def zipf = {
    import spark.implicits._
    (1 to 300).flatMap(i => Seq.fill(math.max(1, 2000 / i))(s"k$i"))
      .toDF("key")
  }

  test("sketch tier is bit-equal to the exact tier on a zipf fixture") {
    val exact = GraftOps.heavyHitters(zipf, col("key"), thrPpm = 20000L)
      .orderBy(desc("n"), col("key")).collect().toSeq
    val sketch = GraftOps.heavyHittersSketch(zipf, col("key"),
        thrPpm = 20000L, capacity = 64)
      .orderBy(desc("n"), col("key")).collect().toSeq
    assert(exact.nonEmpty, "fixture must produce heavy hitters")
    assert(exact == sketch)
  }

  test("sketch tier is invariant to partitioning (merge order)") {
    val a = GraftOps.heavyHittersSketch(zipf.repartition(7), col("key"),
      thrPpm = 20000L, capacity = 64).orderBy(desc("n"), col("key")).collect().toSeq
    val b = GraftOps.heavyHittersSketch(zipf.repartition(3), col("key"),
      thrPpm = 20000L, capacity = 64).orderBy(desc("n"), col("key")).collect().toSeq
    assert(a == b)
  }

  test("capacity guard: a sketch too small to be a superset is rejected") {
    val err = intercept[IllegalArgumentException](
      GraftOps.heavyHittersSketch(zipf, col("key"), thrPpm = 1000L, capacity = 64))
    assert(err.getMessage.contains("capacity"))
  }

  test("MisraGries summary keeps every key above n/(capacity+1)") {
    val cap = 16
    val mg = new MisraGries(cap)
    // 5000 'hot' + 200 singletons: hot share ≈ 96% ≫ n/(cap+1)
    val stream = scala.util.Random.shuffle(
      Seq.fill(5000)("hot") ++ (1 to 200).map(i => s"t$i"))
    // split across 4 "partitions", reduce each, then merge — the exact
    // shape Spark's partial aggregation executes
    val parts = stream.grouped((stream.size + 3) / 4).toSeq
      .map(p => p.foldLeft(mg.zero)(mg.reduce))
    val summary = parts.reduce(mg.merge)
    assert(summary.size <= cap)
    assert(summary.contains("hot"))
    val n = stream.size.toLong
    // each counter undercounts by at most n/(cap+1)
    assert(summary("hot") >= 5000L - n / (cap + 1))
    assert(summary("hot") <= 5000L)
  }

  test("exact tier: integer ppm arithmetic and threshold edge") {
    import spark.implicits._
    // 997 'a' + 3 'b' (total 1000) → a: 997000 ppm, b: exactly 3000 ppm
    val df = (Seq.fill(997)("a") ++ Seq.fill(3)("b")).toDF("key")
    val r = GraftOps.heavyHitters(df, col("key"), thrPpm = 3000L)
      .orderBy(desc("n")).collect()
    assert(r.map(_.getString(0)).toSeq == Seq("a", "b"))
    assert(r.map(_.getLong(2)).toSeq == Seq(997000L, 3000L))
    // 3001 ppm excludes b: 3·1e6 = 3000000 < 3001·1000
    val r2 = GraftOps.heavyHitters(df, col("key"), thrPpm = 3001L).collect()
    assert(r2.map(_.getString(0)).toSeq == Seq("a"))
  }
}
