package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** JVM implementations of the portable text-hash signatures, exposed as
  * codegen'd Catalyst expressions.
  *
  * The higher-order-function formulations in [[Text]] are correct but run
  * interpreted (Spark HOF lambdas don't participate in whole-stage
  * codegen) and call one md5 per (element × family member): 56 s/5k docs
  * for minhash, 90 s for simhash at sf0.1. These expressions compute the
  * IDENTICAL values (same md5, same arithmetic — the DuckDB oracles state
  * the same formulas over md5 hex) in a tight JVM loop: one md5 per
  * element, integer ops after.
  *
  * MinHash family derivation (Carter–Wegman style): per shingle s,
  *   m  = md5('mh|' + s)
  *   h1 = int64(hex m[0,15)), h2 = int64(hex m[15,30)) mod 1e9+7
  *   member_j(s) = h1 + j·h2   (fits int64: < 2^60 + 16·2^30)
  * signature[j] = min over shingles of member_j.
  */
object TextHash {

  private val md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val HEX = "0123456789abcdef".toCharArray
  private val P = 1000000007L

  /** Contiguous-window phrase occurrences, overlapping counted — one
    * linear scan, no allocation (see PhraseCount). NULL tokens never
    * match (a phrase token is never null by construction). */
  def phraseCount(toks: ArrayData,
      phrase: Array[org.apache.spark.unsafe.types.UTF8String]): Long = {
    val n = toks.numElements()
    val k = phrase.length
    if (n < k) return 0L
    var c = 0L
    var i = 0
    while (i <= n - k) {
      var j = 0
      var ok = true
      while (ok && j < k) {
        val t = toks.getUTF8String(i + j)
        if (t == null || !t.equals(phrase(j))) ok = false else j += 1
      }
      if (ok) c += 1
      i += 1
    }
    c
  }

  /** Per-profile membership counts of a token array (see ProfileCounts). */
  def profileCounts(toks: ArrayData,
      profiles: Array[Array[org.apache.spark.unsafe.types.UTF8String]]): ArrayData = {
    val counts = new Array[Int](profiles.length)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      var p = 0
      while (p < profiles.length) {
        val ws = profiles(p)
        var w = 0
        var hit = false
        while (w < ws.length && !hit) { hit = t.equals(ws(w)); w += 1 }
        if (hit) counts(p) += 1
        p += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  /** Token stats for quality scoring (see TokenStats expression). */
  def tokenStats(toks: ArrayData,
      stop: Array[org.apache.spark.unsafe.types.UTF8String]): org.apache.spark.sql.catalyst.InternalRow = {
    val n = toks.numElements()
    var sumLen = 0
    var nStop = 0
    val seen = new java.util.HashSet[org.apache.spark.unsafe.types.UTF8String](n * 2)
    var i = 0
    while (i < n) {
      val t = toks.getUTF8String(i)
      sumLen += t.numChars()
      var w = 0
      var hit = false
      while (w < stop.length && !hit) { hit = t.equals(stop(w)); w += 1 }
      if (hit) nStop += 1
      seen.add(t)
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(n, sumLen, nStop, seen.size())
  }

  /** 60-bit ints from the first 15 and next 15 hex chars of md5(bytes). */
  private def pair(bytes: Array[Byte]): (Long, Long) = {
    val d = md5.get(); d.reset()
    val dig = d.digest(bytes)
    // hex chars 0..14 and 15..29 — char 15 is the high nibble of byte 7
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < 15) { // hex char i = nibble i
      h1 = (h1 << 4) | nibble(dig, i)
      h2 = (h2 << 4) | nibble(dig, i + 15)
      i += 1
    }
    (h1, h2)
  }
  @inline private def nibble(dig: Array[Byte], hexIdx: Int): Long = {
    val b = dig(hexIdx >> 1) & 0xff
    (if ((hexIdx & 1) == 0) b >> 4 else b & 0xf).toLong
  }

  /** MinHash signature over UTF8 string elements; n family members. */
  def minhash(arr: ArrayData, n: Int): ArrayData = {
    val sig = Array.fill(n)(Long.MaxValue)
    val len = arr.numElements()
    var i = 0
    while (i < len) {
      val s = arr.getUTF8String(i)
      val (h1, h2raw) = pair(("mh|" + s.toString).getBytes("UTF-8"))
      val h2 = h2raw % P
      var j = 0
      while (j < n) {
        val v = h1 + j * h2
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** MinHash signature computed straight from the TOKEN array: shingles of
    * `width` tokens are assembled in a reused StringBuilder (never
    * materialized as a Spark array — the interpreted shingle HOF was the
    * cost pig), hashed once, combined into the family. Same shingle
    * strings ("tok tok tok") and same family arithmetic as [[minhash]],
    * so the q16 oracle is unchanged. Returns null when fewer than `width`
    * tokens (callers filter nulls — the shingle-less-doc semantics). */
  def minhashTokens(toks: ArrayData, width: Int, n: Int): ArrayData = {
    val len = toks.numElements()
    if (len < width) return null
    val sig = Array.fill(n)(Long.MaxValue)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= len - width) {
      sb.setLength(0); sb.append("mh|")
      var k = 0
      while (k < width) {
        if (k > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + k).toString)
        k += 1
      }
      val (h1, h2raw) = pair(sb.toString.getBytes("UTF-8"))
      val h2 = h2raw % P
      var j = 0
      while (j < n) {
        val v = h1 + j * h2
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** Distinct portable hashes of the k-token shingles, straight from the
    * token array (same values as Portable.phash over the shingle strings —
    * the q18 oracle's `md5(sh_raw)` derivation — but one tight JVM pass
    * instead of interpreted shingle materialization + re-hash). */
  def shingleHashes(toks: ArrayData, width: Int): ArrayData = {
    val len = toks.numElements()
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= len - width) {
      sb.setLength(0)
      var k = 0
      while (k < width) {
        if (k > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + k).toString)
        k += 1
      }
      val (h1, _) = pair(sb.toString.getBytes("UTF-8"))
      out.add(h1)
      i += 1
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator(); var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  /** ALL portable k-token-shingle hashes in POSITIONAL order (one per
    * window start, duplicates kept — [[shingleHashes]]' set semantics
    * serve membership joins; span masking needs the position ↔ hash
    * alignment, so element i IS window [i, i+width)'s hash). Same hash
    * derivation as [[shingleHashes]] (md5 first-15-hex of the
    * space-joined window = the oracle's `md5(array_to_string(...))`).
    * Empty array when fewer than `width` tokens. */
  def shingleHashesAll(toks: ArrayData, width: Int): ArrayData = {
    val len = toks.numElements()
    val n = len - width + 1
    if (n <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var k = 0
      while (k < width) {
        if (k > 0) sb.append(' ')
        sb.append(toks.getUTF8String(i + k).toString)
        k += 1
      }
      out(i) = pair(sb.toString.getBytes("UTF-8"))._1
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct window-minimum selection over a positional hash array —
    * the winnowing fingerprint set (Schleimer–Wilkerson–Aiken local
    * fingerprinting): for every length-`window` window over
    * [[shingleHashesAll]]'s positional k-gram hashes, select the
    * window's minimum value; the fingerprint set is the DISTINCT
    * selected values. Value identity is all overlap joins consume, so
    * the tie POSITION is irrelevant — any tie rule yields the same set
    * (classic winnowing's rightmost-tie rule only matters for
    * position-bearing fingerprints). Guarantee: two documents sharing
    * a token run of ≥ window + kgramWidth − 1 tokens share ≥ 1
    * fingerprint — deterministic recall MinHash can't promise. Fewer
    * hashes than `window` → one window over all (short docs still
    * fingerprint); empty input → empty. O(n·window) single pass —
    * cheaper than a monotone deque for the small constant windows
    * fingerprinting uses. */
  def winnowSelect(hashes: ArrayData, window: Int): ArrayData = {
    val n = hashes.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val wins = math.max(n - window + 1, 1)
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < wins) {
      var m = hashes.getLong(i)
      var k = 1
      while (k < window && i + k < n) {
        val v = hashes.getLong(i + k)
        if (v < m) m = v
        k += 1
      }
      out.add(m)
      i += 1
    }
    val arr = new Array[Long](out.size())
    val it = out.iterator(); var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new GenericArrayData(arr)
  }

  /** Distinct unordered term pairs co-occurring within `window` token
    * positions, from a per-document (pos, term) array SORTED by
    * position (r21 — the compiled core of proximityTopK's windowed
    * co-occurrence; replaces the (doc, pos) equi-join + global
    * distinct). Positions are strictly increasing, so the inner scan
    * breaks as soon as the position gap exceeds `window` — O(n·window)
    * exactly, never a position quadratic. Pair identity is
    * (min(t1,t2), max(t1,t2)) by binary string order — identical to
    * least/greatest — and equal terms never pair. */
  def windowTermPairs(arr: ArrayData, window: Int): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.LinkedHashSet[(UTF8String, UTF8String)]()
    var i = 0
    while (i < n) {
      val ri = arr.getStruct(i, 2)
      val pi = ri.getInt(0)
      val ti = ri.getUTF8String(1)
      var j = i + 1
      var go = true
      while (go && j < n) {
        val rj = arr.getStruct(j, 2)
        if (rj.getInt(0) - pi > window) go = false
        else {
          val tj = rj.getUTF8String(1)
          val c = ti.compareTo(tj)
          if (c != 0) {
            // clone: the struct getters may expose reused buffers
            if (c < 0) out.add((ti.clone(), tj.clone()))
            else out.add((tj.clone(), ti.clone()))
          }
          j += 1
        }
      }
      i += 1
    }
    val rows = new Array[Any](out.size())
    val it = out.iterator(); var k = 0
    while (it.hasNext) {
      val (a, b) = it.next()
      rows(k) = org.apache.spark.sql.catalyst.InternalRow(a, b)
      k += 1
    }
    new GenericArrayData(rows)
  }

  /** Count of positions where two int64 signatures agree (the verify
    * step of every near-dup band join; see SigMatchCount). Counts over
    * the shorter length — identical to the HOF form's zip semantics. */
  def sigMatchCount(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var m = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) m += 1
      i += 1
    }
    m
  }

  /** Smallest position where two int64 signatures agree, −1 when none
    * (over the shorter length — see FirstEqIndex): the stateless
    * collapse key of every signature-banded admission join. */
  def firstEqIndex(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) return i
      i += 1
    }
    -1
  }

  /** One linear merge pass of span excision (see ExciseSpans): given the
    * token array and the SORTED (asc) hot-window start positions, return
    * the tokens NOT covered by any [start, start+width) window, in order.
    * O(tokens + starts) per row — the interval-rebuild replacement for
    * the former token-grain posexplode + anti-join (VERDICT r13 task 1);
    * duplicate or overlapping starts are fine (coveredUntil is a max). */
  def exciseSpans(toks: ArrayData, starts: ArrayData, width: Int): ArrayData = {
    val n = toks.numElements()
    val h = starts.numElements()
    val buf = new java.util.ArrayList[AnyRef](n)
    var si = 0
    var coveredUntil = -1L // inclusive token position
    var p = 0
    while (p < n) {
      while (si < h && starts.getInt(si) <= p) {
        val end = starts.getInt(si).toLong + width - 1
        if (end > coveredUntil) coveredUntil = end
        si += 1
      }
      if (p > coveredUntil) buf.add(toks.getUTF8String(p).clone())
      p += 1
    }
    new GenericArrayData(buf.toArray)
  }

  /** Intra-document segment dedup (see DedupSegments): cut the token
    * array into consecutive `width`-token segments (last one may be
    * short), keep each DISTINCT segment's first occurrence in order,
    * return the kept segments as joined strings. One linear pass +
    * hash-set per row — the Gopher-style boilerplate trim (repeated
    * headers/footers/navigation INSIDE one document), complementing
    * q85's cross-document span masking. */
  def dedupSegments(toks: ArrayData, width: Int): ArrayData = {
    val n = toks.numElements()
    val nseg = (n + width - 1) / width
    val seen = new java.util.LinkedHashSet[String](nseg * 2)
    var s = 0
    while (s < nseg) {
      val from = s * width
      val until = math.min(n, from + width)
      val sb = new java.lang.StringBuilder
      var i = from
      while (i < until) {
        if (i > from) sb.append(' ')
        sb.append(toks.getUTF8String(i).toString)
        i += 1
      }
      seen.add(sb.toString)
      s += 1
    }
    val out = new Array[AnyRef](seen.size)
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) {
      out(j) = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Rolling polynomial fingerprint over the token stream (see q25):
    * h ← (h·31 + (tokenHash mod p)) mod p, left-to-right — same '0|'
    * seeded token hash as simhash / Portable.phash(0, t). */
  def rollingFingerprint(toks: ArrayData): Long = {
    var acc = 0L
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      val (h1, _) = pair(("0|" + toks.getUTF8String(i).toString).getBytes("UTF-8"))
      acc = (acc * 31L + (h1 % P)) % P
      i += 1
    }
    acc
  }

  /** 60-bit majority-vote SimHash over token hashes (same '0|' seed and
    * first-15-hex derivation as Portable.phash / the q17 oracle). */
  def simhash(arr: ArrayData): Long = {
    val votes = new Array[Int](60)
    val len = arr.numElements()
    var i = 0
    while (i < len) {
      val (h1, _) = pair(("0|" + arr.getUTF8String(i).toString).getBytes("UTF-8"))
      var b = 0
      while (b < 60) {
        if (((h1 >> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 60) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  /** Token→dense-id encode against a vocabulary HashMap (see TokenIds):
    * one O(1) content-hash probe per token, `oovId` for misses and NULL
    * elements. */
  def tokenIds(toks: ArrayData,
      vocab: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer],
      oovId: Int): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (toks.isNullAt(i)) out(i) = oovId
      else {
        val id = vocab.get(toks.getUTF8String(i))
        out(i) = if (id == null) oovId else id.intValue()
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** BPE segmentation of each token (see [[BpeSegment]]): per-CODEPOINT
    * initial symbols (the `substr` grain both engines state — never
    * UTF-16 units, which would split surrogate pairs), then each ranked
    * merge applied greedy left-to-right non-overlapping. `merges` rows
    * are [left, right, left||right] (the concat precomputed once). */
  def bpeSegment(toks: ArrayData, merges: Array[Array[String]]): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      out(i) =
        if (toks.isNullAt(i)) null
        else bpeSegmentWord(toks.getUTF8String(i).toString, merges)
      i += 1
    }
    new GenericArrayData(out)
  }

  private def bpeSegmentWord(w: String,
      merges: Array[Array[String]]): ArrayData = {
    var cur = new Array[String](w.codePointCount(0, w.length))
    var ci = 0
    var k = 0
    while (ci < w.length) {
      val cp = w.codePointAt(ci)
      cur(k) = new String(Character.toChars(cp))
      k += 1
      ci += Character.charCount(cp)
    }
    var mi = 0
    while (mi < merges.length && cur.length >= 2) {
      val x = merges(mi)(0)
      val y = merges(mi)(1)
      val xy = merges(mi)(2)
      val buf = new Array[String](cur.length)
      var j = 0
      var o = 0
      while (j < cur.length) {
        if (j + 1 < cur.length && cur(j) == x && cur(j + 1) == y) {
          buf(o) = xy; o += 1; j += 2
        } else {
          buf(o) = cur(j); o += 1; j += 1
        }
      }
      cur = java.util.Arrays.copyOf(buf, o)
      mi += 1
    }
    val elems = new Array[Any](cur.length)
    var e = 0
    while (e < cur.length) {
      elems(e) = org.apache.spark.unsafe.types.UTF8String.fromString(cur(e))
      e += 1
    }
    new GenericArrayData(elems)
  }
}

/** `minhash_sig(shingles, n)`: array<string> → array<long> signature. */
case class MinHashSig(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(v: Any): Any =
    TextHash.minhash(v.asInstanceOf[ArrayData], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minhash($c, $n)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
}

/** `minhash_sig_tokens(tokens, width, n)`: array<string> tokens →
  * array<long> signature (null when < width tokens). */
case class MinHashSigTokens(child: Expression, width: Int, n: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig_tokens"
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    TextHash.minhashTokens(v.asInstanceOf[ArrayData], width, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${c.isNull}) {
        ${ev.value} = graft.functions.TextHash.minhashTokens(${c.value}, $width, $n);
        ${ev.isNull} = ${ev.value} == null;
      }""")
  }
  override protected def withNewChildInternal(c: Expression): MinHashSigTokens =
    copy(child = c)
}

/** `shingle_hashes(tokens, width)`: array<string> → array<long> of
  * distinct portable shingle hashes (empty when < width tokens). */
case class ShingleHashes(child: Expression, width: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def nullSafeEval(v: Any): Any =
    TextHash.shingleHashes(v.asInstanceOf[ArrayData], width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.shingleHashes($c, $width)")
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
}

/** `shingle_hashes_all(tokens, width)`: array<string> → array<long> of ALL
  * window hashes in positional order (duplicates kept; element i is window
  * [i, i+width)'s portable hash) — the posexplode-ready form span masking
  * needs. Empty when < width tokens. */
case class ShingleHashesAll(child: Expression, width: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes_all"
  override def nullSafeEval(v: Any): Any =
    TextHash.shingleHashesAll(v.asInstanceOf[ArrayData], width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.shingleHashesAll($c, $width)")
  override protected def withNewChildInternal(c: Expression): ShingleHashesAll =
    copy(child = c)
}

/** `winnow_select(hashes, window)`: array<long> positional window hashes →
  * array<long> distinct window minima — the winnowing fingerprint set
  * (codegen'd; semantics and the recall guarantee in
  * [[TextHash.winnowSelect]]). */
case class WinnowSelect(child: Expression, window: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_select"
  override def nullSafeEval(v: Any): Any =
    TextHash.winnowSelect(v.asInstanceOf[ArrayData], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.winnowSelect($c, $window)")
  override protected def withNewChildInternal(c: Expression): WinnowSelect =
    copy(child = c)
}

/** `sig_match_count(a, b)`: number of positions where two array<long>
  * signatures agree — the codegen'd form of
  * `size(filter(zip_with(a, b, _ === _), identity))`, which runs
  * interpreted per row (HOF lambdas never join whole-stage codegen).
  * This sits on the verify step of every near-dup band join, batch AND
  * per-micro-batch streaming, where the interpreted form's latency is
  * hottest; one expression in both paths also keeps the batch/stream
  * agreement guarantee (S10) trivially true. */
case class SigMatchCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sig_match_count expects (array<bigint>, array<bigint>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_match_count"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHash.sigMatchCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHash.sigMatchCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): SigMatchCount = copy(left = l, right = r)
}

/** `excise_spans(tokens, starts, width)`: array<string> × array<int>
  * (sorted asc hot-window starts) → array<string> of the tokens outside
  * every [start, start+width) window, original order kept. The span-grain
  * rebuild kernel of maskRepeatedSpans/maskSpansAgainst: one linear merge
  * per row replaces the former corpus-wide per-token anti-join, so the
  * masking tail shuffles only window STARTS (pair-bounded), never every
  * token of every document. */
case class ExciseSpans(left: Expression, right: Expression, width: Int)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"excise_spans expects (array<string>, array<int>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "excise_spans"
  override def nullSafeEval(toks: Any, starts: Any): Any =
    TextHash.exciseSpans(toks.asInstanceOf[ArrayData],
      starts.asInstanceOf[ArrayData], width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (t, s) => s"graft.functions.TextHash.exciseSpans($t, $s, $width)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): ExciseSpans = copy(left = l, right = r)
}

/** `dedup_segments(tokens, width)`: array<string> → array<string> —
  * consecutive `width`-token segments with duplicate segments removed,
  * first occurrence kept, order preserved (see
  * [[TextHash.dedupSegments]]). */
case class DedupSegments(child: Expression, width: Int)
    extends UnaryExpression {
  require(width >= 1, s"width must be >= 1; got $width")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dedup_segments expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "dedup_segments"
  override def nullSafeEval(v: Any): Any =
    TextHash.dedupSegments(v.asInstanceOf[ArrayData], width)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.dedupSegments($c, $width)")
  override protected def withNewChildInternal(c: Expression): DedupSegments =
    copy(child = c)
}

object DedupSegments {
  def asColumn(tokens: Column, width: Int): Column =
    ColumnBridge.column(DedupSegments(ColumnBridge.expression(tokens), width))
}

/** `window_term_pairs(postings, window)`: array<struct<pos:int,
  * term:string>> (sorted by pos asc, positions strictly increasing) →
  * array<struct<ta:string, tb:string>> — the DISTINCT unordered term
  * pairs co-occurring within `window` positions (see
  * [[TextHash.windowTermPairs]]). The compiled core of proximityTopK's
  * per-doc co-occurrence: replaces the ×window position explode + (doc,
  * pos) equi-join + corpus-wide distinct with one narrow pass over each
  * doc's collected postings. Per-doc state is doc-length-bounded (the
  * winnow-window grain, posture-safe); the output is bounded by both
  * n·window and |vocab|². ALLOCATION NOTE (r21 ADVICE): the dedup set
  * holds one cloned UTF8String pair per DISTINCT in-window pair — an
  * adversarial doc whose in-window vocabulary is huge pays an
  * allocation storm up to min(n·window, |vocab|²) entries; the
  * query-vocabulary semi-join upstream is the admission cap (|vocab| =
  * the QUERY term universe, model-sized by contract), so a hostile
  * CORPUS cannot widen it — only a hostile query table can, and that
  * is the caller's stated model-sized contract. */
case class WindowTermPairs(child: Expression, window: Int)
    extends UnaryExpression {
  require(window >= 1, s"window must be >= 1; got $window")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(s: StructType, _)
        if s.length == 2 && s(0).dataType == IntegerType &&
          s(1).dataType == StringType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"window_term_pairs expects array<struct<pos:int, term:string>>, " +
        s"got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("__ta", StringType, nullable = false),
    StructField("__tb", StringType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "window_term_pairs"
  override def nullSafeEval(v: Any): Any =
    TextHash.windowTermPairs(v.asInstanceOf[ArrayData], window)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.windowTermPairs($c, $window)")
  override protected def withNewChildInternal(c: Expression): WindowTermPairs =
    copy(child = c)
}

object WindowTermPairs {
  def asColumn(postings: Column, window: Int): Column =
    ColumnBridge.column(
      WindowTermPairs(ColumnBridge.expression(postings), window))
}

/** `first_eq_index(a, b)`: smallest position where two array<long>
  * signatures agree (−1 when none, zip over the shorter length) — the
  * STATELESS collapse of a multi-band candidate join: a pair found via
  * several band collisions is emitted only from the row whose band index
  * equals this value, a pure per-row predicate over the two full
  * signatures, so streaming admission needs no dropDuplicates state. */
case class FirstEqIndex(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"first_eq_index expects (array<bigint>, array<bigint>), " +
          s"got (${l.simpleString}, ${r.simpleString})")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "first_eq_index"
  override def nullSafeEval(a: Any, b: Any): Any =
    TextHash.firstEqIndex(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.TextHash.firstEqIndex($a, $b)")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): FirstEqIndex = copy(left = l, right = r)
}

/** `token_ids(tokens)`: array<string> → array<int> — each token replaced
  * by its dense vocabulary id (`vocab(i)` ↔ id `i`), `oovId` for
  * out-of-vocabulary or NULL tokens. The vocabulary ships once per task
  * as a reference-object HashMap (the Sq8Encode model idiom) and every
  * lookup is O(1); the declarative alternative — `try_element_at` on a
  * Catalyst map — is an O(K) LINEAR SCAN per token (ArrayBasedMapData
  * has no index), measured 7× the whole-query cost at K=512. */
case class TokenIds(child: Expression, vocab: Seq[String], oovId: Int)
    extends UnaryExpression {
  require(vocab.nonEmpty, "vocab must be non-empty")

  @transient private lazy val map: java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer] = {
    val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Integer](vocab.size * 2)
    var i = 0
    vocab.foreach { t =>
      require(m.put(org.apache.spark.unsafe.types.UTF8String.fromString(t),
        Integer.valueOf(i)) == null, s"duplicate vocab token '$t'")
      i += 1
    }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"token_ids expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "token_ids"
  override def nullSafeEval(v: Any): Any =
    TextHash.tokenIds(v.asInstanceOf[ArrayData], map, oovId)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mapRef = ctx.addReferenceObj("vocabMap", map, "java.util.HashMap")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.tokenIds($c, $mapRef, $oovId)")
  }
  override protected def withNewChildInternal(c: Expression): TokenIds =
    copy(child = c)
}

object TokenIds {
  def asColumn(tokens: Column, vocab: Seq[String], oovId: Int): Column =
    ColumnBridge.column(TokenIds(ColumnBridge.expression(tokens), vocab, oovId))
}

/** `bpe_segment(tokens)`: array<string> → array<array<string>> — each
  * token segmented into BPE pieces under a trained ranked merge list
  * (see [[graft.api.GraftOps.bpeFit]]), which ships once per task as a
  * reference object (the TokenIds model idiom). O(len · nMerges) per
  * token in a tight JVM loop: the declarative alternative — an
  * nMerges-deep chain of interpreted `aggregate` HOF folds per token —
  * computed the identical pieces at ~16 s / 500 sf0.01 docs; this runs
  * inside whole-stage codegen. A NULL token yields a NULL piece list
  * (unknown word ≠ empty word). */
case class BpeSegment(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {
  require(merges.nonEmpty, "merges must be non-empty")

  @transient private lazy val table: Array[Array[String]] =
    merges.map { case (x, y) => Array(x, y, x + y) }.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_segment expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = false),
      containsNull = true)
  override def prettyName: String = "bpe_segment"
  override def nullSafeEval(v: Any): Any =
    TextHash.bpeSegment(v.asInstanceOf[ArrayData], table)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeMerges", table, "java.lang.String[][]")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextHash.bpeSegment($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): BpeSegment =
    copy(child = c)
}

object BpeSegment {
  def asColumn(tokens: Column, merges: Seq[(String, String)]): Column =
    ColumnBridge.column(BpeSegment(ColumnBridge.expression(tokens), merges))
}

/** `simhash60(tokens)`: array<string> → long. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"
  override def nullSafeEval(v: Any): Any =
    TextHash.simhash(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash($c)")
  override protected def withNewChildInternal(c: Expression): SimHash60 = copy(child = c)
}

object MinHashSig {
  def apply(shingles: Column, n: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shingles), n))
}
object MinHashSigTokens {
  def asColumn(tokens: Column, width: Int, n: Int): Column =
    ColumnBridge.column(MinHashSigTokens(ColumnBridge.expression(tokens), width, n))
}
object ShingleHashes {
  def asColumn(tokens: Column, width: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(tokens), width))
}
object ShingleHashesAll {
  def asColumn(tokens: Column, width: Int): Column =
    ColumnBridge.column(ShingleHashesAll(ColumnBridge.expression(tokens), width))
}
object SimHash60 {
  def apply(tokens: Column): Column =
    ColumnBridge.column(SimHash60(ColumnBridge.expression(tokens)))
}
object ExciseSpans {
  def asColumn(tokens: Column, starts: Column, width: Int): Column =
    ColumnBridge.column(ExciseSpans(ColumnBridge.expression(tokens),
      ColumnBridge.expression(starts), width))
}
object WinnowSelect {
  def asColumn(hashes: Column, window: Int): Column =
    ColumnBridge.column(WinnowSelect(ColumnBridge.expression(hashes), window))
}
object SigMatchCount {
  def asColumn(a: Column, b: Column): Column =
    ColumnBridge.column(
      SigMatchCount(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
object FirstEqIndex {
  def asColumn(a: Column, b: Column): Column =
    ColumnBridge.column(
      FirstEqIndex(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** `profile_counts(tokens)`: array<string> → array<int> — per-profile
  * membership counts in one codegen'd pass (q22 langid / stopword
  * scoring; the `size(filter(toks, isin(...)))` HOF form runs interpreted
  * once PER profile). Profiles are tiny word lists, so membership is an
  * allocation-free linear scan over UTF8String equality — identical
  * counting to SQL `IN` equality. */
/** `phrase_count(tokens, phrase)`: number of contiguous token windows
  * equal to the baked phrase, OVERLAPPING windows counted (step 1) —
  * the codegen'd kernel of [[graft.api.GraftOps.phraseMatch]]: the HOF
  * form (`size(filter(sequence(...), j => slice(toks, j, k) === lit))`)
  * runs interpreted per WINDOW with an array allocation per probe and
  * measured ~20× slower on the 5k-doc bench. One linear scan per row,
  * no allocation. NULL tokens never match. */
case class PhraseCount(child: Expression, phrase: Seq[String])
    extends UnaryExpression {
  require(phrase.nonEmpty && phrase.forall(_.nonEmpty),
    "phrase must be a non-empty sequence of non-empty tokens")

  @transient private lazy val phraseArr: Array[org.apache.spark.unsafe.types.UTF8String] =
    phrase.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"phrase_count expects array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "phrase_count"

  override def nullSafeEval(v: Any): Any =
    TextHash.phraseCount(v.asInstanceOf[ArrayData], phraseArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("phrase", phraseArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.phraseCount($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): PhraseCount =
    copy(child = c)
}

object PhraseCount {
  def asColumn(tokens: Column, phrase: Seq[String]): Column =
    ColumnBridge.column(PhraseCount(ColumnBridge.expression(tokens), phrase))
}

case class ProfileCounts(child: Expression, profiles: Seq[Seq[String]])
    extends UnaryExpression {
  require(profiles.nonEmpty, "at least one profile")

  @transient private lazy val profArr: Array[Array[org.apache.spark.unsafe.types.UTF8String]] =
    profiles.map(_.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray).toArray

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)
  override def prettyName: String = "profile_counts"

  override def nullSafeEval(v: Any): Any =
    TextHash.profileCounts(v.asInstanceOf[ArrayData], profArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("profiles", profArr,
      "org.apache.spark.unsafe.types.UTF8String[][]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.profileCounts($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): ProfileCounts =
    copy(child = c)
}

object ProfileCounts {
  def asColumn(tokens: Column, profiles: Seq[Seq[String]]): Column =
    ColumnBridge.column(ProfileCounts(ColumnBridge.expression(tokens), profiles))
}

/** `token_stats(tokens)`: array<string> → struct(n_tokens, sum_len,
  * n_stop, n_distinct) — every integer input of the text-quality features
  * in one codegen'd pass (replaces interpreted aggregate/filter/
  * array_distinct HOFs). Lengths are character counts (SQL `length`);
  * distinctness is exact string equality, matching `list_distinct`. */
case class TokenStats(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  @transient private lazy val stopArr: Array[org.apache.spark.unsafe.types.UTF8String] =
    stopwords.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("n_tokens", org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("sum_len", org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("n_stop", org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("n_distinct", org.apache.spark.sql.types.IntegerType, nullable = false)))
  override def prettyName: String = "token_stats"

  override def nullSafeEval(v: Any): Any =
    TextHash.tokenStats(v.asInstanceOf[ArrayData], stopArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("stopwords", stopArr,
      "org.apache.spark.unsafe.types.UTF8String[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.tokenStats($c, $ref)")
  }
  override protected def withNewChildInternal(c: Expression): TokenStats =
    copy(child = c)
}

object TokenStats {
  def asColumn(tokens: Column, stopwords: Seq[String]): Column =
    ColumnBridge.column(TokenStats(ColumnBridge.expression(tokens), stopwords))
}

/** `rolling_fingerprint(tokens)`: array<string> → long — the q25
  * order-sensitive document fingerprint in one codegen'd pass (the HOF
  * form pays one interpreted md5 lambda per token). */
case class RollingFingerprint(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"
  override def nullSafeEval(v: Any): Any =
    TextHash.rollingFingerprint(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.rollingFingerprint($c)")
  override protected def withNewChildInternal(c: Expression): RollingFingerprint =
    copy(child = c)
}

object RollingFingerprint {
  def apply(tokens: Column): Column =
    ColumnBridge.column(RollingFingerprint(ColumnBridge.expression(tokens)))
}
