package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization (RFC 3986 §6) as a native codegen expression —
  * the crawl-frontier primitive beside WARC ingest (q169): a frontier
  * dedups on CANONICAL urls or it re-crawls `HTTP://Example.com/a/../b`
  * and `http://example.com/b` as two pages, and every host-level rollup
  * (politeness budgets, centrality priors) keys on the canonical host.
  *
  * The canonical form, precisely (each rule mirrored in the q211
  * oracle):
  *   1. scheme and host lowercased (§6.2.2.1);
  *   2. default port stripped (:80 for http, :443 for https);
  *   3. path dot-segments resolved against a stack (§5.2.4): `.`
  *      dropped, `..` pops; a trailing `.`/`..` leaves a trailing
  *      slash; `..` above the root is REFUSED (a path escaping its
  *      authority is malformed, not clamp-able);
  *   4. percent-escape hex uppercased (§6.2.2.1), every `%` validated
  *      as `%HH` — an invalid escape is refused loudly;
  *   5. fragment stripped (it never reaches the server);
  *   6. empty path → `/` (§6.2.3).
  * Query strings keep their order and content (reordering changes
  * semantics on real servers) apart from rule 4.
  *
  * Loud on: missing/unsupported scheme (only http/https), empty host,
  * invalid percent escape, root-escaping `..` — the house refusal
  * stance: a canonicalizer that "recovers" mints a frontier key that
  * collides or splits silently.
  */
case class UrlCanonicalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"url_canonicalize needs string, got ${dt.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    UrlCanonicalize.canonicalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expressions.UrlCanonicalize.canonicalize($c)")

  override protected def withNewChildInternal(c: Expression): UrlCanonicalize =
    copy(child = c)

  override def prettyName: String = "url_canonicalize"
}

object UrlCanonicalize {

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Rule 4 over any component: validate and uppercase %HH escapes. */
  private def normEscapes(s: String, what: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (i + 2 >= s.length)
          throw new IllegalArgumentException(
            s"url_canonicalize: truncated percent escape in $what of <$s>")
        val (h1, h2) = (s.charAt(i + 1), s.charAt(i + 2))
        if (!isHex(h1) || !isHex(h2))
          throw new IllegalArgumentException(
            s"url_canonicalize: invalid percent escape '%$h1$h2' in $what")
        sb.append('%').append(Character.toUpperCase(h1))
          .append(Character.toUpperCase(h2))
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Rule 3: §5.2.4 dot-segment resolution. Input starts with '/'. */
  private def resolveDots(path: String): String = {
    val segs = path.split("/", -1).drop(1) // leading '/' yields segs[0]=""
    val stack = scala.collection.mutable.ArrayBuffer.empty[String]
    var trailingSlash = path.endsWith("/")
    segs.foreach {
      case "." => trailingSlash = true
      case ".." =>
        if (stack.isEmpty)
          throw new IllegalArgumentException(
            s"url_canonicalize: path escapes the root: <$path>")
        stack.remove(stack.length - 1); trailingSlash = true
      case s => stack += s; trailingSlash = s.isEmpty
    }
    val joined = "/" + stack.mkString("/")
    if (trailingSlash && !joined.endsWith("/")) joined + "/" else joined
  }

  /** Static entry shared by eval and generated code. */
  def canonicalize(u: UTF8String): UTF8String = {
    val s = u.toString
    val schemeEnd = s.indexOf("://")
    if (schemeEnd <= 0)
      throw new IllegalArgumentException(s"url_canonicalize: no scheme in <$s>")
    val scheme = s.substring(0, schemeEnd).toLowerCase
    if (scheme != "http" && scheme != "https")
      throw new IllegalArgumentException(
        s"url_canonicalize: unsupported scheme '$scheme'")
    var rest = s.substring(schemeEnd + 3)
    // rule 5: the fragment never reaches the server
    val hash = rest.indexOf('#')
    if (hash >= 0) rest = rest.substring(0, hash)
    val pathStart = {
      val p = rest.indexOf('/'); val q = rest.indexOf('?')
      if (p < 0 && q < 0) rest.length else if (p < 0) q else if (q < 0) p
      else math.min(p, q)
    }
    var authority = rest.substring(0, pathStart).toLowerCase
    if (authority.isEmpty)
      throw new IllegalArgumentException(s"url_canonicalize: empty host in <$s>")
    // rule 2: default ports
    val defPort = if (scheme == "http") ":80" else ":443"
    if (authority.endsWith(defPort))
      authority = authority.substring(0, authority.length - defPort.length)
    val tail = rest.substring(pathStart)
    val qMark = tail.indexOf('?')
    val rawPath = if (qMark < 0) tail else tail.substring(0, qMark)
    val query = if (qMark < 0) "" else tail.substring(qMark)
    // rule 6 then 3 then 4
    val path0 = if (rawPath.isEmpty) "/" else rawPath
    val path = normEscapes(resolveDots(path0), "path")
    UTF8String.fromString(
      scheme + "://" + authority + path + normEscapes(query, "query"))
  }
}
