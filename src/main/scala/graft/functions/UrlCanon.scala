package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization for crawl dedup — the same raw page arrives as
  * `HTTPS://Site.com:443/a/?b=2&a=1&utm_source=x#frag` and
  * `https://site.com/a?a=1&b=2`; byte-exact dedup treats them as two
  * documents. The canonical form (the standard crawl-frontier recipe):
  *
  *  1. scheme and host lowercase;
  *  2. fragment dropped;
  *  3. default port dropped (`:80` for http, `:443` for https);
  *  4. trailing slashes of the path dropped;
  *  5. tracking params dropped — name (lowercased) `utm_*`, `gclid`,
  *     `fbclid`;
  *  6. remaining query params sorted lexicographically (full
  *     `k=v` token, code-unit order — == byte order for ASCII params,
  *     the contract);
  *  7. reassembled `scheme://host[:port]path[?sorted-params]` with the
  *     `?` omitted when no params survive.
  *
  * A value without `://` is passed through verbatim (not a URL — the
  * operator never guesses). The q100 oracle states the identical seven
  * steps in DuckDB regex/list SQL, so canonicalization is hash-gated on
  * both engines, not just spec'd. Everything between the defined cut
  * points (userinfo, %-escapes, path dots) passes through untouched —
  * canonicalization must never ALTER content, only normalize framing.
  */
object UrlCanon {

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val name = (if (eq >= 0) param.substring(0, eq) else param)
      .toLowerCase(java.util.Locale.ROOT)
    name.startsWith("utm_") || name == "gclid" || name == "fbclid"
  }

  /** JVM kernel (called from codegen): canonicalize one URL. */
  def canonicalize(u: UTF8String): UTF8String = {
    val s = u.toString
    val si = s.indexOf("://")
    if (si <= 0) return u
    val scheme = s.substring(0, si).toLowerCase(java.util.Locale.ROOT)
    // only a '#' AFTER the authority start is a fragment — a '#' before
    // '://' ("see item #5 at https://x.com") must not invert the cut
    // points (it used to throw StringIndexOutOfBounds)
    val hashIdx = s.indexOf('#', si + 3)
    val rest = if (hashIdx >= 0) s.substring(si + 3, hashIdx) else s.substring(si + 3)
    val qIdx = rest.indexOf('?')
    val beforeQ = if (qIdx >= 0) rest.substring(0, qIdx) else rest
    val query = if (qIdx >= 0) rest.substring(qIdx + 1) else null
    val slashIdx = beforeQ.indexOf('/')
    val hp0 = if (slashIdx >= 0) beforeQ.substring(0, slashIdx) else beforeQ
    // lowercase the HOST only — userinfo before '@' is case-sensitive
    // content (credentials), never normalized (q100's oracle fixture has
    // no userinfo, so its whole-hostport lower() states the same thing)
    val atIdx = hp0.lastIndexOf('@')
    var hostport = hp0.substring(0, atIdx + 1) +
      hp0.substring(atIdx + 1).toLowerCase(java.util.Locale.ROOT)
    val path0 = if (slashIdx >= 0) beforeQ.substring(slashIdx) else ""
    if (scheme == "http" && hostport.endsWith(":80"))
      hostport = hostport.substring(0, hostport.length - 3)
    if (scheme == "https" && hostport.endsWith(":443"))
      hostport = hostport.substring(0, hostport.length - 4)
    var pEnd = path0.length
    while (pEnd > 0 && path0.charAt(pEnd - 1) == '/') pEnd -= 1
    val path = path0.substring(0, pEnd)
    val params: Array[String] =
      if (query == null) Array.empty
      else query.split("&").filter(p => p.nonEmpty && !isTracking(p))
    scala.util.Sorting.quickSort(params)
    val qs = if (params.isEmpty) "" else "?" + params.mkString("&")
    UTF8String.fromString(scheme + "://" + hostport + path + qs)
  }

  def apply(c: Column): Column =
    ColumnBridge.column(CanonicalUrl(ColumnBridge.expression(c)))
}

/** `canonical_url(s)`: string → string — see [[UrlCanon]]. */
case class CanonicalUrl(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"canonical_url expects string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "canonical_url"
  override def nullSafeEval(v: Any): Any =
    UrlCanon.canonicalize(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCanon.canonicalize($c)")
  override protected def withNewChildInternal(c: Expression): CanonicalUrl =
    copy(child = c)
}
