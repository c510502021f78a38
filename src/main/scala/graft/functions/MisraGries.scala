package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries frequent-items summary as a typed, MERGEABLE aggregate —
  * the sketch half of [[graft.api.GraftOps.heavyHittersSketch]].
  *
  * Buffer = at most `capacity` (key, counter) pairs. Classic stream
  * update: increment a present key; insert while below capacity;
  * otherwise decrement EVERY counter by one and drop zeros (each such
  * round pays O(capacity) but removes at least `capacity` total counts,
  * so summary maintenance is O(1) amortized per input row). Merge is the
  * Agarwal et al. mergeable-summaries rule (public result): sum counters
  * pairwise, then subtract the (capacity+1)-th largest counter from all
  * and drop non-positives — the error bound composes across partitions,
  * which is exactly what lets Spark run this as a map-side partial
  * aggregate plus one tiny final merge (the 100 TB shape: each task ships
  * `capacity` pairs, never its key space).
  *
  * Guarantee (with n = total input rows): every key with true count
  * > n/(capacity+1) is present in the summary, and each stored counter
  * undercounts its key by at most n/(capacity+1). The summary alone is
  * therefore a SUPERSET of the heavy hitters above that share — callers
  * recount candidates exactly (one semi-join pass) rather than trusting
  * sketch counters, so sketch internals (iteration order, merge order)
  * never reach an answer.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity > 0, s"capacity must be positive; got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], k: String): Map[String, Long] =
    b.get(k) match {
      case Some(c) => b.updated(k, c + 1L)
      case None if b.size < capacity => b.updated(k, 1L)
      case None =>
        // full + unseen key: the new key and every stored counter give up
        // one count (the arriving key's single count is annihilated too,
        // so it is NOT inserted).
        b.collect { case (kk, c) if c > 1L => kk -> (c - 1L) }
    }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val combined =
      if (a.isEmpty) b
      else if (b.isEmpty) a
      else b.foldLeft(a) { case (m, (k, c)) => m.updated(k, m.getOrElse(k, 0L) + c) }
    if (combined.size <= capacity) combined
    else {
      // subtract the (capacity+1)-th largest counter from every counter;
      // at most `capacity` keys can stay strictly positive afterwards.
      val cut = combined.valuesIterator.toArray.sorted(Ordering[Long].reverse)(capacity)
      combined.collect { case (k, c) if c > cut => k -> (c - cut) }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}
