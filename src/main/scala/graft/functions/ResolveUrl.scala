package graft.functions

import java.net.URI

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `resolve_url(base: string, href: string): string` — RFC-3986 reference
  * resolution + URL normalization for link-graph ingest, as a native codegen
  * expression.
  *
  * On real Common-Crawl HTML most anchors are relative, so an edge extractor
  * that keeps raw `href` strings silently produces a wrong graph; every href
  * must be resolved against the page url. Returns NULL (row dropped by the
  * caller's filter) for non-http(s) schemes (`javascript:`, `mailto:`,
  * `data:`, ...), fragment-only links, and malformed URIs.
  *
  * Normalization: dot-segment removal (RFC 3986 §5.2.4 via `URI.resolve` +
  * `normalize`), scheme/host lowercased, default ports (80/443) stripped,
  * fragment stripped, empty path → "/", query preserved.
  */
case class ResolveUrl(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType.isInstanceOf[StringType] && right.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName requires (string, string)")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "resolve_url"

  override protected def nullSafeEval(base: Any, href: Any): Any =
    UrlKernel.resolve(base.asInstanceOf[UTF8String], href.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"""
         |${ev.value} = graft.functions.UrlKernel.resolve($b, $h);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): ResolveUrl =
    copy(left = newLeft, right = newRight)
}

object UrlKernel {

  /** @return the normalized absolute url, or null to drop the link. */
  def resolve(base: UTF8String, href: UTF8String): UTF8String = {
    val out = resolveStr(base.toString, href.toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  def resolveStr(base: String, href: String): String = {
    var h = href.trim
    val frag = h.indexOf('#')
    if (frag >= 0) h = h.substring(0, frag)
    if (h.isEmpty) return null // fragment-only / empty: a self-link, dropped
    // explicit non-http(s) schemes are not links into the web graph
    val colon = h.indexOf(':')
    if (colon > 0 && h.substring(0, colon).forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.')
        && h.charAt(0).isLetter) {
      val scheme = h.substring(0, colon).toLowerCase
      if (scheme != "http" && scheme != "https") return null
    }
    try {
      val resolved = new URI(base).resolve(h).normalize()
      val scheme = resolved.getScheme
      if (scheme == null) return null
      val sl = scheme.toLowerCase
      if (sl != "http" && sl != "https") return null
      val host = resolved.getHost
      if (host == null) return null
      val port = resolved.getPort
      val defaultPort = (sl == "http" && port == 80) || (sl == "https" && port == 443)
      val portStr = if (port == -1 || defaultPort) "" else s":$port"
      val rawPath = resolved.getRawPath
      var path = if (rawPath == null || rawPath.isEmpty) "/" else rawPath
      // URI.normalize leaves ".." segments that overshoot the root; RFC 3986
      // §5.2.4 removes them (browser behavior)
      while (path.startsWith("/../")) path = path.substring(3)
      if (path == "/..") path = "/"
      val query = Option(resolved.getRawQuery).map("?" + _).getOrElse("")
      sl + "://" + host.toLowerCase + portStr + path + query
    } catch {
      case _: Exception => null // malformed href or base: drop the link
    }
  }
}
