package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed UDAF surface (SURVEY.md §2.2): per-group centroid of
  * embedding vectors. Buffer is (running sums, count); merge is
  * element-wise — associative and commutative, so partial aggregation
  * (map-side combine) applies and the operator scales like any hash agg.
  *
  * Note: double summation order across partitions is not fixed, so this
  * Aggregator is the *fast* path; the oracle-checked centroid query
  * (SimilarityOps.q21) uses exact integer quantization instead.
  */
class CentroidAgg(dim: Int)
    extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    val (sums, n) = b
    var i = 0
    while (i < dim && i < v.length) { sums(i) += v(i); i += 1 }
    (sums, n + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    var i = 0
    while (i < dim) { a._1(i) += b._1(i); i += 1 }
    (a._1, a._2 + b._2)
  }

  override def finish(r: (Array[Double], Long)): Seq[Double] =
    if (r._2 == 0) Seq.fill(dim)(0.0)
    else r._1.map(_ / r._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[(Array[Double], Long)]()

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
