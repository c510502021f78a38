package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline column builders (tokenize / shingle / minhash / simhash /
  * rolling fingerprint), all engine-portable (see [[Portable]]): every hash
  * is md5-derived and every fold is an explicit left-to-right `aggregate`,
  * so the DuckDB oracle can state the identical computation with
  * `list_transform` / `list_reduce`.
  *
  * Everything here is built from Spark higher-order functions on array
  * columns — no UDFs, no explode-shuffle for per-document signatures; the
  * whole signature pipeline runs inside whole-stage codegen and scales
  * linearly in documents (the 100 TB posture: signatures are a narrow map,
  * only the candidate-pair join shuffles).
  */
object Text {

  /** Normalize: lower, trim, collapse whitespace runs. */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  /** Whitespace tokens of the normalized text. */
  def tokens(c: Column): Column = split(normText(c), " ")

  /** Evaluate `c` ONCE per row and hand the bound value to `f`: inside a
    * higher-order-function lambda, a captured expression tree is
    * re-evaluated per ELEMENT, so a per-position lambda over an
    * expensive array expression (tokenize = regex + split) silently
    * multiplies that cost by the array length (r21: Text.shingles was
    * re-running the whole tokenizer once per shingle position). The
    * single-element transform binds the value to a lambda variable. */
  private def bindOnce(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** k-token shingles: ["a b c","b c d",…]; empty array when < k tokens. */
  def shingles(toks: Column, k: Int): Column = bindOnce(toks) { t =>
    when(size(t) >= k,
      transform(sequence(lit(0), size(t) - k),
        i => concat_ws(" ", slice(t, i + lit(1), lit(k)))))
      .otherwise(typedLit(Seq.empty[String]))
  }

  /** Portable seeded 60-bit hash usable inside HOF lambdas. */
  private def ph(seed: Column, s: Column): Column =
    conv(substring(md5(concat(seed.cast("string"), lit("|"), s)), 1, 15), 16, 10)
      .cast("long")

  /** MinHash signature — delegates to the codegen'd [[MinHashSig]]
    * expression (one md5 per shingle + Carter–Wegman family; the HOF
    * formulation ran interpreted and was 16× heavier on md5). */
  def minhashSignature(sh: Column, n: Int): Column = MinHashSig(sh, n)

  /** LSH band keys: md5 over each `rows`-wide slice of the signature.
    * Docs sharing any band key become candidate pairs. (Signature bound
    * once per row — see [[bindOnce]]; a captured signature expression
    * would re-hash the whole MinHash family once per band.) */
  def lshBands(sig: Column, bands: Int, rows: Int): Column = bindOnce(sig) { s =>
    transform(sequence(lit(0), lit(bands - 1)),
      b => md5(concat_ws(",",
        transform(slice(s, b * lit(rows) + lit(1), lit(rows)), x => x.cast("string")))))
  }

  /** 60-bit SimHash over the token multiset: bit b is set iff the majority
    * of token hashes have bit b set — codegen'd [[SimHash60]] expression. */
  def simhash(toks: Column): Column = SimHash60(toks)

  /** 15-bit chunk `i` (0..3) of a 60-bit simhash — LSH band key for the
    * hamming-distance join (pigeonhole: hamming ≤ 3 ⇒ ≥1 equal chunk). */
  def simhashChunk(sh: Column, i: Int): Column =
    shiftright(sh, 15 * i) % lit(32768)

  /** Rolling polynomial fingerprint of the token stream:
    * h ← (h*31 + tokenHash mod p) mod p, p = 1e9+7. Order-sensitive (it is
    * a *rolling* hash), fold is left-to-right in both engines. */
  def rollingFingerprint(toks: Column): Column = {
    val p = 1000000007L
    aggregate(
      transform(toks, t => ph(lit(0), t)),
      lit(0L),
      (acc, h) => (acc * 31L + (h % p)) % p)
  }
}
