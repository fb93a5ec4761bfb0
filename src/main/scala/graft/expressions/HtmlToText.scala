package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * HTML-to-text extraction — the front door of a crawl pipeline: every
 * downstream operator here consumes a `text` column, and this turns raw
 * HTML bytes into that column in one codegen'd projection (scan →
 * extract → [[NormalizeText]] → line/quality passes, no shuffle).
 *
 * Semantics (public HTML5 grammar, single pass over the markup):
 *
 *  - `<!-- ... -->` comments and the content of `<script>`, `<style>`,
 *    `<noscript>`, `<template>` elements are dropped (case-insensitive;
 *    an unterminated construct drops through end-of-input, matching the
 *    "everything until the matching close tag" tokenizer rule);
 *  - block-level tags (open or close: p, div, br, hr, li, ul, ol,
 *    h1-h6, tr, td, th, table, thead, tbody, blockquote, pre, section,
 *    article, header, footer, nav, main) emit a line break; all other
 *    tags vanish WITHOUT inserting space (`bo<b>ld</b>` -> `bold`);
 *    a tag's end is the first `>` — attribute values containing `>` cut
 *    the tag short (the same `<[^>]*>` approximation every regex-based
 *    extractor applies);
 *  - character references decode ONCE, no re-scan (the HTML5 rule):
 *    the core named set (`&amp; &lt; &gt; &quot; &apos;`), numeric
 *    decimal `&#NNN;` and hex `&#xHH;` code points, and `&nbsp;` — which
 *    maps to a PLAIN SPACE, not U+00A0, the standard extractor
 *    practicality (documented divergence from the letter of the spec);
 *    an unrecognized `&...;` stays literal text;
 *  - whitespace is normalized exactly as the regex chain
 *    `[ \t\r]+ -> " "`, `" *\n *" -> "\n"`, `"\n+" -> "\n"`, then
 *    leading/trailing spaces and newlines are stripped — one clean line
 *    per block element, ready for [[graft.pipeline.Lines]]' line-level
 *    boilerplate pass.
 *
 * Custom Expression (with codegen) rather than a UDF for the usual
 * reason: a static-kernel call through UTF8String keeps the extraction
 * inside the scan's whole-stage codegen with no row boxing. The oracle
 * replays the same semantics on well-formed fixtures as a RE2
 * regexp_replace chain (strip script/style/comments, block tags to
 * newline, `<[^>]*>` to empty, literal entity replaces with `&amp;`
 * LAST — equivalent to decode-once on inputs whose entities come from
 * the planted set).
 */
case class HtmlToText(child: Expression)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    TopnTypeChecks.check(child.dataType == StringType,
      s"html_to_text requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = StringType

  override def nullSafeEval(v: Any): Any =
    HtmlToText.extract(v.asInstanceOf[UTF8String])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.HtmlToText.extract($a);")

  override protected def withNewChildInternal(c: Expression): HtmlToText = copy(child = c)
  override def prettyName: String = "html_to_text"
}

object HtmlToText {

  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "hr", "li", "ul", "ol",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "tr", "td", "th", "table", "thead", "tbody",
    "blockquote", "pre", "section", "article",
    "header", "footer", "nav", "main")

  private val SkipContent: Set[String] =
    Set("script", "style", "noscript", "template")

  private val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> " ")

  /** Core kernel, shared by interpreted eval and generated code. */
  def extract(u: UTF8String): UTF8String = {
    val s = u.toString
    val n = s.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '<') {
        if (s.regionMatches(i, "<!--", 0, 4)) {
          val end = s.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val name = tagName(s, i)
          val gt = s.indexOf('>', i)
          if (name.nonEmpty && !isClosing(s, i) && SkipContent.contains(name)) {
            val close = indexOfCloseTag(s, name, if (gt < 0) n else gt + 1)
            if (close < 0) i = n
            else {
              val cgt = s.indexOf('>', close)
              i = if (cgt < 0) n else cgt + 1
            }
          } else if (gt < 0) {
            i = n // dangling '<...': tag junk through end-of-input
          } else {
            if (BlockTags.contains(name)) out.append('\n')
            i = gt + 1
          }
        }
      } else if (c == '&') {
        val semi = s.indexOf(';', i + 1)
        val decoded =
          if (semi < 0 || semi > i + 10) None
          else decodeEntity(s.substring(i + 1, semi))
        decoded match {
          case Some(t) => out.append(t); i = semi + 1
          case None => out.append('&'); i += 1
        }
      } else {
        out.append(c)
        i += 1
      }
    }
    UTF8String.fromString(normalizeWs(out.toString))
  }

  /** Lower-cased tag name following `<` or `</` at position `lt`. */
  private def tagName(s: String, lt: Int): String = {
    var k = lt + 1
    if (k < s.length && s.charAt(k) == '/') k += 1
    val start = k
    while (k < s.length && (s.charAt(k).isLetter || s.charAt(k).isDigit)) k += 1
    s.substring(start, k).toLowerCase(java.util.Locale.ROOT)
  }

  private def isClosing(s: String, lt: Int): Boolean =
    lt + 1 < s.length && s.charAt(lt + 1) == '/'

  private def indexOfIgnoreCase(s: String, needle: String, from: Int): Int = {
    var i = math.max(from, 0)
    val last = s.length - needle.length
    while (i <= last) {
      if (s.regionMatches(true, i, needle, 0, needle.length)) return i
      i += 1
    }
    -1
  }

  /** Find `</name` where the tag name actually ends there — the next char must
    * be '>', whitespace, or '/', so `</scripts>` cannot close `<script>`. */
  private def indexOfCloseTag(s: String, name: String, from: Int): Int = {
    val needle = "</" + name
    var i = from
    while (i >= 0) {
      i = indexOfIgnoreCase(s, needle, i)
      if (i >= 0) {
        val after = i + needle.length
        if (after >= s.length) return i
        val c = s.charAt(after)
        if (c == '>' || c == '/' || Character.isWhitespace(c)) return i
        i += 1
      }
    }
    -1
  }

  /** Decode one character reference body (between `&` and `;`), or None
    * to leave the ampersand literal. */
  private def decodeEntity(body: String): Option[String] = {
    NamedEntities.get(body).orElse {
      if (body.length >= 2 && body.charAt(0) == '#') {
        val (digits, radix) =
          if (body.charAt(1) == 'x' || body.charAt(1) == 'X') (body.substring(2), 16)
          else (body.substring(1), 10)
        try {
          val cp = java.lang.Integer.parseInt(digits, radix)
          if (Character.isValidCodePoint(cp) && cp > 0)
            Some(new String(Character.toChars(cp)))
          else None
        } catch { case _: NumberFormatException => None }
      } else None
    }
  }

  /** The whitespace chain the scaladoc pins — spelled as the same
    * regexes the oracle runs, so the two cannot drift. */
  private def normalizeWs(s: String): String =
    s.replaceAll("[ \t\r]+", " ")
      .replaceAll(" *\n *", "\n")
      .replaceAll("\n+", "\n")
      .replaceAll("^[ \n]+|[ \n]+$", "")
}
