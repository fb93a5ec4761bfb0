package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Outlink extraction — `html_links(html)` returns every `<a>` tag's
 * `href` value, in document order. The companion of
 * [[HtmlToText]] on the crawl front door: text extraction feeds the
 * content operators, link extraction feeds the LINK GRAPH (domain
 * ranking, crawl frontier dedup via `url_normalize`, spam-neighborhood
 * analysis with [[graft.pipeline.Graph]]).
 *
 * Semantics (pinned, single pass over the markup):
 *
 *  - an anchor is `<a` or `<A` followed by a whitespace character; the
 *    tag ends at the first `>` (the same `<[^>]*>` approximation as
 *    [[HtmlToText]]); an unterminated final anchor is scanned through
 *    end-of-input and still yields a completed quoted value;
 *  - within the tag, the FIRST case-insensitive `href` attribute wins:
 *    `href = "v"`, `href='v'`, or unquoted `href=v` (value ends at
 *    whitespace or `>`); spaces around `=` are allowed;
 *  - the value is emitted RAW — no entity decode, no resolution against
 *    a base URL (compose with `url_normalize`/`registered_domain`
 *    downstream; relative links need the page's own URL anyway);
 *  - anchors with no (or an empty) `href` are skipped; a document with
 *    no anchors yields the empty array, never NULL;
 *  - the scan does NOT skip `<script>`/comment content (it reads raw
 *    markup) — crawl HTML that embeds markup in scripts should be
 *    measured as-is or pre-stripped, a documented contract.
 *
 * Custom Expression (with codegen) for the usual reason: a static-kernel
 * call through UTF8String keeps extraction inside the scan's whole-stage
 * codegen. On fixtures that plant anchors in the canonical
 * `<a href="...">` spelling, the oracle replays the extraction as a
 * single RE2 `regexp_extract_all`.
 */
case class HtmlLinks(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TopnTypeChecks.check(child.dataType == StringType,
      s"html_links requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    HtmlLinks.links(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.HtmlLinks.links($a);")

  override protected def withNewChildInternal(c: Expression): HtmlLinks =
    copy(child = c)
  override def prettyName: String = "html_links"
}

object HtmlLinks {

  /** Core kernel, shared by interpreted eval and generated code. */
  def links(u: UTF8String): GenericArrayData = {
    val s = u.toString
    val n = s.length
    val out = new java.util.ArrayList[Any]()
    var i = 0
    while (i < n) {
      val lt = s.indexOf('<', i)
      if (lt < 0) i = n
      else if (lt + 2 < n && (s.charAt(lt + 1) == 'a' || s.charAt(lt + 1) == 'A')
          && Character.isWhitespace(s.charAt(lt + 2))) {
        val gt = s.indexOf('>', lt)
        val end = if (gt < 0) n else gt
        val href = findHref(s, lt + 2, end)
        if (href != null && href.nonEmpty) out.add(UTF8String.fromString(href))
        i = if (gt < 0) n else gt + 1
      } else i = lt + 1
    }
    new GenericArrayData(out.toArray)
  }

  /** First `href` attribute value inside `[from, end)`, or null —
    * shared with [[HtmlAnchors]] so the two surfaces cannot drift. */
  private[expressions] def findHref(s: String, from: Int, end: Int): String = {
    var i = from
    while (i + 4 <= end) {
      if (s.regionMatches(true, i, "href", 0, 4)
          // attribute name boundary: preceded by whitespace
          && (i == from || Character.isWhitespace(s.charAt(i - 1)))) {
        var j = i + 4
        while (j < end && Character.isWhitespace(s.charAt(j))) j += 1
        if (j < end && s.charAt(j) == '=') {
          j += 1
          while (j < end && Character.isWhitespace(s.charAt(j))) j += 1
          if (j >= end) return null
          val c = s.charAt(j)
          if (c == '"' || c == '\'') {
            val close = s.indexOf(c, j + 1)
            return if (close < 0 || close > end) null
            else s.substring(j + 1, close)
          }
          var k = j
          while (k < end && !Character.isWhitespace(s.charAt(k))) k += 1
          return s.substring(j, k)
        }
      }
      i += 1
    }
    null
  }
}
