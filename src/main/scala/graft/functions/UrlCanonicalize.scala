package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization for web-corpus dedup: two raw URLs that differ
  * only in scheme/host case, a default port, query-parameter order, or a
  * fragment are the SAME page — canonicalizing before exact dedup (d1)
  * collapses them. Rules applied (the common subset of the crawler
  * canonicalizers):
  *
  *   - scheme and host lowercased (path/query case preserved)
  *   - default ports stripped (`:80` for http, `:443` for https)
  *   - query parameters sorted by key (stable on ties — duplicate keys
  *     keep their relative order), empty query dropped
  *   - fragment dropped
  *
  * Deterministic string→string; codegen emits a static call (the body
  * stays a single JVM method, same pattern as [[ZOrder2]]). Malformed
  * input (no `://`) passes through unchanged — quarantine upstream.
  */
case class UrlCanonicalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_url_canon"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      UrlCanonicalize.canonicalize(input.asInstanceOf[UTF8String].toString))

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => {
      val cls = UrlCanonicalize.getClass.getName.stripSuffix("$") + "$.MODULE$"
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$cls.canonicalize($c.toString()))"
    })

  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalize =
    copy(child = newChild)
}

object UrlCanonicalize {
  def canonicalize(url: String): String = {
    val schemeEnd = url.indexOf("://")
    if (schemeEnd < 0) return url
    val scheme = url.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    val rest = url.substring(schemeEnd + 3)
    // authority runs to the first '/', '?' or '#'
    val authEnd0 = rest.indexWhere(c => c == '/' || c == '?' || c == '#')
    val authEnd = if (authEnd0 < 0) rest.length else authEnd0
    var authority = rest.substring(0, authEnd).toLowerCase(java.util.Locale.ROOT)
    val defaultPort = scheme match {
      case "http" => ":80"
      case "https" => ":443"
      case _ => null
    }
    if (defaultPort != null && authority.endsWith(defaultPort))
      authority = authority.substring(0, authority.length - defaultPort.length)
    val tail = rest.substring(authEnd)
    // split off fragment, then query
    val hashIdx = tail.indexOf('#')
    val noFrag = if (hashIdx < 0) tail else tail.substring(0, hashIdx)
    val qIdx = noFrag.indexOf('?')
    val path = if (qIdx < 0) noFrag else noFrag.substring(0, qIdx)
    val query = if (qIdx < 0) "" else noFrag.substring(qIdx + 1)
    val sortedQuery =
      if (query.isEmpty) ""
      else {
        val params = query.split("&", -1).filter(_.nonEmpty)
        // stable sort by key only — duplicate keys keep arrival order
        val sorted = params.sortBy(p => {
          val eq = p.indexOf('='); if (eq < 0) p else p.substring(0, eq)
        })
        if (sorted.isEmpty) "" else "?" + sorted.mkString("&")
      }
    scheme + "://" + authority + path + sortedQuery
  }
}
