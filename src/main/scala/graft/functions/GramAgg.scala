package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Exact integer second-moment summary of an embedding column in ONE
  * pass: per row, each component is quantized to floor-micros
  * (`floor(x·10⁶)` — the house exact-decimal convention, q21/q48), and
  * the buffer accumulates [count, the dim quantized sums, the
  * dim·(dim+1)/2 upper-triangle products]. Everything is Long and the
  * merge is element-wise addition — associative and commutative, so
  * map-side combine applies and the whole Gram matrix costs one hash
  * aggregate with O(dim²) state per task, ZERO row expansion (the
  * explode-then-regroup form would ship dim²× rows to one exchange).
  *
  * Exactness bound (documented contract): |x| < 2¹² and
  * N < 2⁶³ / (dim-independent 2⁶² per-cell) ⇒ every cell fits a Long —
  * for unit-scale embeddings (|x| ≤ ~1, cells ≤ 10¹² per row) that is
  * N ≲ 9·10⁶ rows per final aggregate; beyond that, pre-aggregate per
  * shard and fold the (mergeable) summaries in decimal. The oracle
  * (q154) restates the identical integer arithmetic, so the Gram matrix
  * hash-gates even though it summarizes float data.
  *
  * Malformed input fails LOUDLY: a vector whose length differs from
  * `dim` throws (the same wrong-length guard as pcaProject /
  * randomProject — silently zero-padding or truncating would degrade
  * the fitted model with no signal). NULL vectors are skipped (absent,
  * not malformed); non-finite components throw for the same reason
  * (floor(NaN) would silently map to 0).
  */
class GramAgg(dim: Int)
    extends Aggregator[Seq[Float], Array[Long], Seq[Long]] {

  private val gramLen = dim * (dim + 1) / 2
  private val len = 1 + dim + gramLen

  override def zero: Array[Long] = new Array[Long](len)

  override def reduce(b: Array[Long], v: Seq[Float]): Array[Long] = {
    if (v == null) return b
    if (v.length != dim) throw new IllegalArgumentException(
      s"GramAgg: embedding length ${v.length} != declared dim $dim")
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      val x = v(i)
      if (java.lang.Float.isNaN(x) || java.lang.Float.isInfinite(x))
        throw new IllegalArgumentException(
          s"GramAgg: non-finite component $x at index $i")
      q(i) = math.floor(x.toDouble * 1000000.0).toLong
      i += 1
    }
    b(0) += 1L
    i = 0
    var p = 1 + dim
    while (i < dim) {
      b(1 + i) += q(i)
      var j = i
      while (j < dim) {
        b(p) += q(i) * q(j)
        p += 1
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()

  override def outputEncoder: Encoder[Seq[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
}
