package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Anchor extraction with text — `html_anchors(html)` returns every `<a>`
 * tag's `(href, text)` pair, in document order. The third member of the
 * crawl front door ([[HtmlToText]] for content, [[HtmlLinks]] for the bare
 * link graph): anchor TEXT is the classic relevance/label signal for the
 * link's TARGET — per-target-domain anchor-term statistics (via the topn
 * sketch), anchor-based quality priors, and link-spam phrase detection all
 * start here.
 *
 * Semantics (pinned; href detection is IDENTICAL to [[HtmlLinks]] — the
 * two kernels share `findHref` — so `html_anchors(...).href` and
 * `html_links(...)` agree element for element on every input):
 *
 *  - an anchor opens at `<a`/`<A` followed by whitespace, its tag ends at
 *    the first `>`; the first `href` attribute wins, emitted RAW (no
 *    entity decode, no base resolution); anchors with no or empty `href`
 *    yield no pair;
 *  - the anchor's text runs from the tag's `>` to the first
 *    case-insensitive `</a` close (name boundary: optional whitespace
 *    then `>`, the [[HtmlToText]] close-tag doctrine); inner tags
 *    (`<b>`, `<img ...>`, ...) are stripped with the same `<[^>]*>`
 *    approximation, entities are NOT decoded, whitespace runs collapse to
 *    one space and the result is trimmed;
 *  - an unterminated anchor (no close tag) takes its text to end of
 *    input; a nested `<a ...>` open before the close is stripped like any
 *    inner tag (its own href is NOT re-extracted — nested anchors are
 *    invalid HTML, pinned); the outer scan resumes after the close tag;
 *  - a document with no anchors yields the empty array, never NULL.
 *
 * Custom Expression (with codegen) for the [[HtmlLinks]] reason: one
 * static-kernel pass per document inside whole-stage codegen. On planted
 * fixtures in the canonical `<a href="u">t</a>` spelling with tag-free
 * text, the oracle replays extraction as one RE2 `regexp_extract_all` per
 * field.
 */
case class HtmlAnchors(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TopnTypeChecks.check(child.dataType == StringType,
      s"html_anchors requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = HtmlAnchors.Type

  override def nullSafeEval(v: Any): Any =
    HtmlAnchors.anchors(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.HtmlAnchors.anchors($a);")

  override protected def withNewChildInternal(c: Expression): HtmlAnchors =
    copy(child = c)
  override def prettyName: String = "html_anchors"
}

object HtmlAnchors {

  val Type: DataType = ArrayType(
    StructType(Seq(
      StructField("href", StringType, nullable = false),
      StructField("text", StringType, nullable = false))),
    containsNull = false)

  /** Core kernel, shared by interpreted eval and generated code. */
  def anchors(u: UTF8String): GenericArrayData = {
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
        val tagEnd = if (gt < 0) n else gt
        val href = findHref(s, lt + 2, tagEnd)
        val bodyStart = if (gt < 0) n else gt + 1
        val close = findClose(s, bodyStart)
        val bodyEnd = if (close < 0) n else close
        if (href != null && href.nonEmpty) {
          val text = stripAndCollapse(s, bodyStart, bodyEnd)
          out.add(new GenericInternalRow(Array[Any](
            UTF8String.fromString(href), UTF8String.fromString(text))))
        }
        // resume after the close tag's '>' (or at end when unterminated)
        i = if (close < 0) n
        else {
          val cgt = s.indexOf('>', close)
          if (cgt < 0) n else cgt + 1
        }
      } else i = lt + 1
    }
    new GenericArrayData(out.toArray)
  }

  /** First case-insensitive `</a` whose name ends at optional whitespace
    * + `>` (or end of input), scanning from `from`; -1 when absent. */
  private def findClose(s: String, from: Int): Int = {
    val n = s.length
    var i = from
    while (i + 2 < n) {
      if (s.charAt(i) == '<' && s.charAt(i + 1) == '/'
          && (s.charAt(i + 2) == 'a' || s.charAt(i + 2) == 'A')) {
        var j = i + 3
        while (j < n && Character.isWhitespace(s.charAt(j))) j += 1
        if (j >= n || s.charAt(j) == '>') return i
      }
      i += 1
    }
    -1
  }

  /** `[from, end)` with `<...>` spans removed (an unterminated `<` drops
    * the rest), whitespace runs collapsed to one space, trimmed. */
  private def stripAndCollapse(s: String, from: Int, end: Int): String = {
    val sb = new java.lang.StringBuilder(end - from)
    var i = from
    var pendingSpace = false
    while (i < end) {
      val c = s.charAt(i)
      if (c == '<') {
        val gt = s.indexOf('>', i)
        i = if (gt < 0 || gt >= end) end else gt + 1
      } else {
        if (Character.isWhitespace(c)) pendingSpace = true
        else {
          if (pendingSpace && sb.length > 0) sb.append(' ')
          sb.append(c)
          pendingSpace = false
        }
        i += 1
      }
    }
    sb.toString
  }

  /** First `href` attribute value inside `[from, end)`, or null —
    * [[HtmlLinks]]' kernel, shared so the two surfaces cannot drift. */
  private def findHref(s: String, from: Int, end: Int): String =
    HtmlLinks.findHref(s, from, end)
}
