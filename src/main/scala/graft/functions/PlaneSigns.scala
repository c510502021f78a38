package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All hyperplane sign bits of an `array<float>` embedding in ONE codegen'd
  * pass: bit `j` of the result is set iff the sequential left-to-right
  * double dot product with plane `j` is > 0 (up to 64 planes).
  *
  * This is the LSH hot path (bucket ids in ANN, band keys in embedding
  * near-dup). The HOF form — one `aggregate(zip_with(...))` per plane —
  * runs interpreted and re-walks the embedding once per plane; this
  * expression stays inside whole-stage codegen and walks it once per
  * plane with no allocation (same lesson as TextHash vs HOF signatures).
  *
  * Arithmetic contract: identical sequential fold to the oracle's
  * `list_reduce(list_transform(...))` — see CosineSim — so sign bits are
  * bit-portable.
  */
case class PlaneSigns(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {
  require(planes.nonEmpty && planes.size <= 64, "1..64 planes fit one long")

  @transient private lazy val planesArr: Array[Array[Double]] =
    planes.map(_.toArray).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"plane_signs expects array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "plane_signs"

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    var sig = 0L
    var j = 0
    while (j < planesArr.length) {
      val w = planesArr(j)
      val n = math.min(e.numElements(), w.length)
      var dot = 0.0
      var i = 0
      while (i < n) { dot += e.getFloat(i).toDouble * w(i); i += 1 }
      if (dot > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planesArr, "double[][]")
    nullSafeCodeGen(ctx, ev, e => {
      val sig = ctx.freshName("sig"); val j = ctx.freshName("j")
      val w = ctx.freshName("w"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
      s"""
         |long $sig = 0L;
         |for (int $j = 0; $j < $ref.length; $j++) {
         |  final double[] $w = $ref[$j];
         |  final int $n = Math.min($e.numElements(), $w.length);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += ((double) $e.getFloat($i)) * $w[$i];
         |  }
         |  if ($dot > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PlaneSigns =
    copy(child = newChild)
}

object PlaneSigns {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(e: Column, planes: Seq[Seq[Double]]): Column =
    ColumnBridge.column(PlaneSigns(ColumnBridge.expression(e), planes))
}
