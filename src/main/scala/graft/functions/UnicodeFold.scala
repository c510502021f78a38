package graft.functions

import java.text.Normalizer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonical fold for text dedup/keying: lowercase → NFD →
  * strip combining marks → NFC, i.e. `strip_accents(nfc_normalize(
  * lower(s)))` in DuckDB terms — the two engines state the SAME
  * composition, which is what lets q99 hash-gate the fold end to end.
  *
  * Why this exact pipeline: crawl corpora carry the same sentence as
  * `Café`, `café`, `Cafe´` (combining accent) and `CAFE`; byte-exact
  * dedup sees four distinct documents. Folding case and accents to one
  * canonical form makes exact-dedup (and any downstream hash key)
  * catch them — the standard first normalization pass of a training
  * corpus pipeline. Lowercase runs FIRST so characters whose
  * decomposition only exists post-fold behave identically on both
  * engines.
  *
  * The kernel is locale-independent (`Locale.ROOT`) and strips exactly
  * the Unicode M* categories after NFD; NFC re-composes anything that
  * is not an accent (so e.g. Hangul survives intact). ASCII input is
  * returned via the fast path untouched apart from case.
  */
object UnicodeFold {

  /** JVM kernel (called from codegen): fold one UTF8String. */
  def fold(s: UTF8String): UTF8String = {
    val str = s.toString
    val lower = str.toLowerCase(java.util.Locale.ROOT)
    // fast path: pure-ASCII lowercase needs no normalizer walk
    var ascii = true
    var i = 0
    while (ascii && i < lower.length) {
      if (lower.charAt(i) >= 0x80) ascii = false
      i += 1
    }
    if (ascii) return UTF8String.fromString(lower)
    val nfd = Normalizer.normalize(lower, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK)
        sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }

  def apply(c: Column): Column =
    ColumnBridge.column(FoldText(ColumnBridge.expression(c)))
}

/** `fold_text(s)`: string → string — see [[UnicodeFold]]. */
case class FoldText(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fold_text expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "fold_text"
  override def nullSafeEval(v: Any): Any =
    UnicodeFold.fold(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UnicodeFold.fold($c)")
  override protected def withNewChildInternal(c: Expression): FoldText =
    copy(child = c)
}
