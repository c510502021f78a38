package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** All plane dot products of an `array<float>` embedding in ONE codegen'd
  * pass: element `j` of the result is the sequential left-to-right double
  * dot product with plane `j`. The VALUE-returning sibling of
  * [[PlaneSigns]] (which keeps only the sign bits): this is the
  * random-projection hot path — at 100 TB a dim-reduction pass walks every
  * embedding once, so the k-plane product must stay inside whole-stage
  * codegen (the HOF form — one `aggregate(zip_with(...))` per output dim —
  * runs interpreted and re-walks the embedding k times).
  *
  * Arithmetic contract: identical sequential fold to the oracle's
  * `list_reduce(list_transform(...))` — see CosineSim — so every output
  * component is bit-portable.
  *
  * Length contract (family convention, same as CosineSim): the fold runs
  * over `min(embedding length, plane length)` — a shorter embedding dots
  * only its prefix, with NO error from this expression. Callers that need
  * the full-dimension guarantee must validate the length upstream, the
  * way [[graft.api.GraftOps.randomProject]] does (a `when(size(v)===dim)`
  * guard with `raise_error`); null elements inside the array are likewise
  * the caller's contract (embedding columns are containsNull=false).
  */
case class PlaneDots(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty, "need at least one plane")

  @transient private lazy val planesArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"plane_dots expects array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "plane_dots"

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val out = new Array[Double](planesArr.length)
    var j = 0
    while (j < planesArr.length) {
      val w = planesArr(j)
      val n = math.min(e.numElements(), w.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += e.getFloat(i).toDouble * w(i); i += 1 }
      out(j) = dot
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planesArr, "double[][]")
    nullSafeCodeGen(ctx, ev, e => {
      val out = ctx.freshName("out"); val j = ctx.freshName("j")
      val w = ctx.freshName("w"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
      s"""
         |final double[] $out = new double[$ref.length];
         |for (int $j = 0; $j < $ref.length; $j++) {
         |  final double[] $w = $ref[$j];
         |  final int $n = Math.min($e.numElements(), $w.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $e.getFloat($i)) * $w[$i];
         |  }
         |  $out[$j] = $dot;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneDots =
    copy(child = newChild)
}

object PlaneDots {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(e: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(PlaneDots(ColumnBridge.expression(e), planes))
}
