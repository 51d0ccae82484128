package graft.functions

import java.util.Locale

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.GraftColumnBridge.{toColumn, toExpr}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization — the normalization every crawl pipeline runs
  * before URL-level dedup (`dedup_url`), so the same page fetched as
  * `HTTP://Example.COM:80/a%7Eb?utm_source=x&id=1#frag` and
  * `http://example.com/a~b?id=1` collapses to one key.
  *
  * The chain (RFC 3986 §6 syntax-based normalization, plus the
  * tracking-param strip every production canonicalizer adds):
  *
  *  1. trim, strip the fragment (`#...` — never sent to the server);
  *  2. lowercase the scheme and host (authority after any userinfo,
  *     which stays case-sensitive per the RFC);
  *  3. strip the scheme's default port (`:80` http, `:443` https);
  *  4. drop tracking query params: keys with the `utm_` prefix plus
  *     gclid / fbclid / msclkid / mc_eid, preserving the order of the
  *     survivors and dropping the `?` when none survive. Bare `ref`
  *     is deliberately NOT stripped (ADVICE r16): unlike the ad-click
  *     ids it is often content-bearing — `?ref=<branch>` on code
  *     hosts selects a different page — and collapsing on it would
  *     silently drop genuinely distinct documents. A deployment that
  *     knows its corpus can extend the key set; the default errs
  *     toward keeping distinct pages distinct;
  *  5. percent-decode UNRESERVED escapes only (`%41`→A … alnum, `-`,
  *     `.`, `_`, `~`) in the path and query — reserved escapes like
  *     `%2F` stay encoded (decoding them would CHANGE the URL).
  *
  * Pure and total: null→null, a string with no `://` gets only the
  * fragment/decode steps (no authority to normalize). Idempotent —
  * canonical(canonical(u)) == canonical(u) — so re-running the dedup
  * over an already-canonical corpus is a no-op (spec-pinned).
  */
object UrlCanon {

  private val TrackingKeys = Set("gclid", "fbclid", "msclkid", "mc_eid")

  private def isUnreserved(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'

  private def hex(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** Decode `%XX` escapes whose decoded character is unreserved;
    * everything else (reserved escapes, bare `%`, bad hex) passes
    * through verbatim. */
  private[graft] def decodeUnreserved(s: String): String = {
    if (s.indexOf('%') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length) {
        val h = hex(s.charAt(i + 1)); val l = hex(s.charAt(i + 2))
        if (h >= 0 && l >= 0 && isUnreserved(((h << 4) | l).toChar)) {
          sb.append(((h << 4) | l).toChar); i += 3
        } else { sb.append(c); i += 1 }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    // match on the key's DECODED form: the output query decodes
    // unreserved escapes afterwards, so a `%75tm_source` that slipped
    // the filter would decode into a literal tracking key and break
    // idempotence (canonical(canonical(u)) must equal canonical(u))
    val key = decodeUnreserved(if (eq < 0) param else param.substring(0, eq))
    key.startsWith("utm_") || TrackingKeys.contains(key)
  }

  /** Strip tracking params from a raw query string (split BEFORE any
    * decode — a `%26` must never become a fake separator), preserving
    * survivor order; empty result → null (the `?` is dropped). */
  private def cleanQuery(query: String): String = {
    val kept = query.split("&", -1).filterNot(isTracking)
    if (kept.isEmpty || kept.forall(_.isEmpty)) null
    else kept.mkString("&")
  }

  /** The full chain. Called per row from the codegen'd
    * [[UrlCanonicalize]] expression; also usable directly. */
  def canonical(raw: String): String = {
    if (raw == null) return null
    var u = raw.trim
    val frag = u.indexOf('#')
    if (frag >= 0) u = u.substring(0, frag)
    val ss = u.indexOf("://")
    // a real scheme is ALPHA (ALPHA/DIGIT/+/-/.)* — a "://" found
    // inside a path or query (no valid scheme before it) means the
    // string has no authority to normalize
    def schemeOk: Boolean = {
      val c0 = u.charAt(0)
      ((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z')) &&
        (1 until ss).forall { i =>
          val c = u.charAt(i)
          (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
            (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'
        }
    }
    if (ss <= 0 || !schemeOk) return decodeUnreserved(u)
    val scheme = u.substring(0, ss).toLowerCase(Locale.ROOT)
    val authStart = ss + 3
    var authEnd = authStart
    while (authEnd < u.length &&
      u.charAt(authEnd) != '/' && u.charAt(authEnd) != '?') authEnd += 1
    var auth = {
      val a = u.substring(authStart, authEnd)
      val at = a.lastIndexOf('@') // userinfo stays case-sensitive
      if (at < 0) a.toLowerCase(Locale.ROOT)
      else a.substring(0, at + 1) + a.substring(at + 1).toLowerCase(Locale.ROOT)
    }
    if (scheme == "http" && auth.endsWith(":80")) auth = auth.dropRight(3)
    else if (scheme == "https" && auth.endsWith(":443")) auth = auth.dropRight(4)
    val rest = u.substring(authEnd)
    val q = rest.indexOf('?')
    val path = decodeUnreserved(if (q < 0) rest else rest.substring(0, q))
    val query = if (q < 0) null else cleanQuery(rest.substring(q + 1))
    val sb = new java.lang.StringBuilder(u.length)
    sb.append(scheme).append("://").append(auth).append(path)
    if (query != null) sb.append('?').append(decodeUnreserved(query))
    sb.toString
  }

  /** Column helper: `urlCanonicalize($"url")`. */
  def urlCanonicalize(c: Column): Column = toColumn(UrlCanonicalize(toExpr(c)))
}

/** Native Catalyst wrapper for [[UrlCanon.canonical]]: string→string,
  * null-intolerant, codegen via a static call so the projection stays
  * inside whole-stage codegen (no UDF boxing, no Option wrapping —
  * the same pattern Spark's own regexp/url expressions use for
  * JVM-library-backed string work). Registered in SQL as
  * `url_canonicalize` (GraftExtensions). */
case class UrlCanonicalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "url_canonicalize"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.simpleString}")

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(UrlCanon.canonical(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.UrlCanon.canonical($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalize =
    copy(child = newChild)
}
