package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Unit-norm (L2) projection of an `array<float>` embedding in ONE
  * codegen'd pass: two tight loops per row — a sequential zero-seeded
  * sum-of-squares fold (bit-identical to the oracle's first-element-
  * seeded `list_reduce`, because squares are non-negative and
  * 0.0 + x ≡ x), then one divide per component. The HOF form
  * (`aggregate` + `transform`) runs interpreted and measured ~5× slower
  * on the q62 fixture; at 100 TB a normalization pass touches every
  * embedding, so it must stay inside whole-stage codegen like its
  * siblings [[PlaneDots]]/[[CosineSim]].
  *
  * Zero-norm vectors yield an array of NULL components (0/0 would be an
  * engine-dependent NaN/Inf); NULL vectors null-propagate. NULL *elements*
  * inside a vector read as 0.0f — the family convention shared with
  * [[PlaneDots]]/[[PlaneSigns]]/[[CosineSim]] (`getFloat` on a null slot):
  * a partially-null embedding is treated as zero-filled, not rejected.
  */
case class L2Unit(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"l2_unit expects array<float>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def prettyName: String = "l2_unit"

  override def nullSafeEval(input: Any): Any = {
    val e = input.asInstanceOf[ArrayData]
    val n = e.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = e.getFloat(i).toDouble; ss += x * x; i += 1 }
    val nrm = math.sqrt(ss)
    if (nrm > 0.0) {
      val out = new Array[Double](n)
      i = 0
      while (i < n) { out(i) = e.getFloat(i).toDouble / nrm; i += 1 }
      new GenericArrayData(out)
    } else new GenericArrayData(new Array[AnyRef](n)) // all-NULL components
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, e => {
      val n = ctx.freshName("n"); val ss = ctx.freshName("ss")
      val nrm = ctx.freshName("nrm"); val i = ctx.freshName("i")
      val x = ctx.freshName("x"); val out = ctx.freshName("out")
      s"""
         |final int $n = $e.numElements();
         |double $ss = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = (double) $e.getFloat($i);
         |  $ss += $x * $x;
         |}
         |final double $nrm = java.lang.Math.sqrt($ss);
         |if ($nrm > 0.0) {
         |  final double[] $out = new double[$n];
         |  for (int $i = 0; $i < $n; $i++) {
         |    $out[$i] = ((double) $e.getFloat($i)) / $nrm;
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new Object[$n]);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Unit =
    copy(child = newChild)
}

object L2Unit {
  import org.apache.spark.sql.graftbridge.ColumnBridge
  def apply(e: Column): Column = ColumnBridge.column(L2Unit(ColumnBridge.expression(e)))
}
