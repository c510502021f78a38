package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** JVM kernel of unigram-LM (SentencePiece-style) Viterbi segmentation —
  * the [[TextHash.bpeSegment]] idiom for the probabilistic tokenizer
  * family: each word is segmented into the vocabulary pieces minimizing
  * total surprisal (Σ sur_q10 — [[graft.api.GraftOps.unigramFit]]'s
  * exact fixed-point scores), with a PINNED deterministic tie order so
  * both the trainer's E-step and the DuckDB oracle's
  * enumerate-all-paths restatement pick the identical segmentation:
  *
  *   (total cost ASC, piece count ASC, space-joined path ASC in UTF-8
  *    byte order)
  *
  * The hierarchical order is suffix-monotone (cost and count are
  * additive; two distinct boundary sequences over the same word diverge
  * at their first boundary, where one piece is a proper prefix of the
  * other, so the path comparison is decided inside the prefix), which
  * is exactly the property that lets left-to-right DP realize the
  * global optimum the oracle finds by enumeration. Path ties compare
  * via [[UTF8String]] (UTF-8 byte order) to match DuckDB's binary
  * collation — Java String.compareTo orders UTF-16 code units, which
  * disagrees on supplementary codepoints.
  *
  * Unknown single codepoints (absent from the vocabulary — impossible
  * during training, possible at encode time) are always segmentable as
  * themselves at cost [[UnigramSeg.UnkCost]] (2⁴⁰ q10-bits — above any
  * real piece score, so segmentations with fewer unknowns always win;
  * sums stay far from Long overflow for any real word). */
object UnigramSeg {
  val UnkCost: Long = 1L << 40

  /** array<string> tokens → array<array<string>> pieces (NULL token →
    * NULL piece list; empty token → empty piece list). */
  def segment(toks: ArrayData,
      vocab: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (toks.isNullAt(i)) null
        else segmentWord(toks.getUTF8String(i).toString, vocab, maxPieceLen)
      i += 1
    }
    new GenericArrayData(out)
  }

  private def segmentWord(w: String,
      vocab: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int): ArrayData = {
    // codepoint boundaries: offs(k) = UTF-16 offset of codepoint k
    val nCp = w.codePointCount(0, w.length)
    if (nCp == 0) return new GenericArrayData(Array.empty[Any])
    val offs = new Array[Int](nCp + 1)
    var ci = 0
    var k = 0
    while (ci < w.length) {
      offs(k) = ci
      ci += Character.charCount(w.codePointAt(ci))
      k += 1
    }
    offs(nCp) = w.length
    // DP state per covered-prefix length: (cost, nPieces, path)
    val cost = new Array[Long](nCp + 1)
    val np = new Array[Int](nCp + 1)
    val path = new Array[scala.collection.immutable.Vector[String]](nCp + 1)
    path(0) = scala.collection.immutable.Vector.empty
    var i2 = 1
    while (i2 <= nCp) {
      var bestCost = Long.MaxValue
      var bestNp = Int.MaxValue
      var bestPath: scala.collection.immutable.Vector[String] = null
      var j = math.max(0, i2 - maxPieceLen)
      while (j < i2) {
        if (path(j) != null) {
          val piece = w.substring(offs(j), offs(i2))
          val sc = vocab.get(piece)
          val pc: Long =
            if (sc != null) sc.longValue()
            else if (i2 - j == 1) UnkCost
            else -1L
          if (pc >= 0L) {
            val cCost = cost(j) + pc
            val cNp = np(j) + 1
            val better =
              if (cCost != bestCost) cCost < bestCost
              else if (cNp != bestNp) cNp < bestNp
              else if (bestPath == null) true
              else {
                val cand = (path(j) :+ piece).mkString(" ")
                val cur = bestPath.mkString(" ")
                UTF8String.fromString(cand)
                  .compareTo(UTF8String.fromString(cur)) < 0
              }
            if (better) {
              bestCost = cCost; bestNp = cNp; bestPath = path(j) :+ piece
            }
          }
        }
        j += 1
      }
      cost(i2) = bestCost; np(i2) = bestNp; path(i2) = bestPath
      i2 += 1
    }
    val pieces = path(nCp)
    val elems = new Array[Any](pieces.length)
    var e = 0
    while (e < pieces.length) {
      elems(e) = UTF8String.fromString(pieces(e))
      e += 1
    }
    new GenericArrayData(elems)
  }
}

/** `unigram_segment(tokens)`: array<string> → array<array<string>> —
  * each token Viterbi-segmented under a trained (piece → sur_q10)
  * vocabulary (see [[graft.api.GraftOps.unigramFit]]), shipped once per
  * task as a reference-object HashMap (the TokenIds/BpeSegment model
  * idiom) — the corpus never shuffles; encode is a pure narrow
  * projection at any scale. */
case class UnigramSegment(child: Expression, vocab: Seq[(String, Long)],
    maxPieceLen: Int) extends UnaryExpression {
  require(vocab.nonEmpty, "vocab must be non-empty")
  require(maxPieceLen >= 1, s"maxPieceLen must be >= 1; got $maxPieceLen")

  @transient private lazy val map: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](vocab.size * 2)
    vocab.foreach { case (p, s) =>
      require(m.put(p, java.lang.Long.valueOf(s)) == null,
        s"duplicate vocab piece '$p'")
    }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false),
      containsNull = true)
  override def prettyName: String = "unigram_segment"
  override def nullSafeEval(v: Any): Any =
    UnigramSeg.segment(v.asInstanceOf[ArrayData], map, maxPieceLen)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramVocab", map, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnigramSeg.segment($c, $ref, $maxPieceLen)")
  }
  override protected def withNewChildInternal(c: Expression): UnigramSegment =
    copy(child = c)
}

object UnigramSegment {
  def asColumn(tokens: Column, vocab: Seq[(String, Long)],
      maxPieceLen: Int): Column =
    ColumnBridge.column(UnigramSegment(ColumnBridge.expression(tokens),
      vocab, maxPieceLen))
}
