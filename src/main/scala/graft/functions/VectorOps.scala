package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** JVM helpers for baked-constant vector math (called from generated code —
  * the TextHash pattern: the loop-heavy part lives in one static method the
  * codegen emits a single call to). */
object VectorOps {

  /** Labels of all centroids argsorted by (sequential-fold dot desc,
    * label asc). `labels` must arrive pre-sorted ascending — the stable
    * sort on −dot then yields the label-asc tiebreak for free. */
  def nearestCells(e: ArrayData, cents: Array[Array[Double]],
      labels: Array[Int]): ArrayData = {
    val k = cents.length
    val dots = new Array[Double](k)
    var j = 0
    while (j < k) {
      val w = cents(j)
      val n = math.min(e.numElements(), w.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += e.getFloat(i).toDouble * w(i); i += 1 }
      dots(j) = dot
      j += 1
    }
    val idx = (0 until k).sortBy(i => -dots(i)) // stable: ties keep label asc
    new GenericArrayData(idx.map(labels(_)).toArray)
  }
}

/** `nearest_cells(vec)`: array<float> → array<int> of the baked centroid
  * labels ordered nearest-first (dot desc, label asc). One codegen'd pass
  * over the embedding for ALL centroids — the interpreted form (one
  * aggregate/zip_with fold per centroid inside an array_sort) re-walks
  * the vector K times outside whole-stage codegen. Element 1 is the IVF
  * cell assignment; elements 1..nprobe are a probe's search cells. */
case class NearestCells(child: Expression, cents: Seq[Seq[Double]],
    labels: Seq[Int]) extends UnaryExpression {
  require(cents.nonEmpty && cents.size == labels.size, "one label per centroid")
  require(labels == labels.sorted, "labels must be pre-sorted ascending")

  @transient private lazy val centsArr: Array[Array[Double]] =
    cents.map(_.toArray).toArray
  @transient private lazy val labelsArr: Array[Int] = labels.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"nearest_cells expects array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  override def nullSafeEval(v: Any): Any =
    VectorOps.nearestCells(v.asInstanceOf[ArrayData], centsArr, labelsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cRef = ctx.addReferenceObj("cents", centsArr, "double[][]")
    val lRef = ctx.addReferenceObj("labels", labelsArr, "int[]")
    defineCodeGen(ctx, ev, e =>
      s"graft.functions.VectorOps.nearestCells($e, $cRef, $lRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): NearestCells =
    copy(child = newChild)
}

object NearestCells {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(vec: Column, cents: Seq[Seq[Double]], labels: Seq[Int]): Column =
    ColumnBridge.column(
      NearestCells(ColumnBridge.expression(vec), cents, labels))
}
