package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic primitives.
  *
  * The correctness gate hash-compares our results against DuckDB running
  * ANSI-ish SQL on the same parquet (SURVEY.md §5). Anything derived from a
  * hash function must therefore use a hash BOTH engines can compute
  * bit-identically. Spark's `xxhash64`/`hash` and DuckDB's `hash()` are
  * different algorithms, so we standardize on **md5**, which both engines
  * expose with identical output, and take the first 15 hex chars (60 bits,
  * fits in a signed int64 in both engines):
  *
  *   Spark :  conv(substring(md5(s), 1, 15), 16, 10) :: long
  *   DuckDB:  CAST('0x' || substring(md5(s), 1, 15) AS BIGINT)
  *
  * md5 is slower than xxhash64 but runs inside whole-stage codegen via the
  * built-in `Md5`/`Conv` expressions; for the 100 TB fast path the engine
  * also exposes `fast_hash` (xxhash64) for pipelines that don't need oracle
  * portability (e.g. salting, repartitioning).
  */
object Portable {

  /** 60-bit portable hash of a string column. */
  def phash(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent hash family member `seed`. */
  def phash(seed: Int, c: Column): Column =
    phash(concat(lit(seed.toString), lit("|"), c))

  /** SQL-expression fragment for the same hash (for use inside
    * higher-order-function lambdas, where `s` is a lambda variable). */
  def phashSql(s: String): String =
    s"CAST(conv(substring(md5($s), 1, 15), 16, 10) AS BIGINT)"

  /** The DuckDB rendering of [[phashSql]] — used when generating oracle SQL. */
  def phashDuck(s: String): String =
    s"CAST('0x' || substring(md5($s), 1, 15) AS BIGINT)"

  /** Non-portable fast path (xxhash64): use for salting/bucketing where the
    * value never reaches an oracle-checked result. */
  def fastHash(cols: Column*): Column = xxhash64(cols: _*)

  /** JVM-side evaluation of the same 60-bit hash — used to bake identical
    * numeric constants (e.g. LSH hyperplanes) into both the Spark plan and
    * the generated oracle SQL. */
  def phashJvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.substring(0, 15)
    java.lang.Long.parseLong(hex, 16)
  }
}
