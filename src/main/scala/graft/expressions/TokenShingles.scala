package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Distinct word n-gram shingles of a text column in a single pass:
 * `token_shingles(text, n)` ≡
 * `array_distinct(transform(sequence(...), i -> concat_ws(' ', tokens[i..i+n-1])))`
 * over `split(trim(text), '\\s+')` — but ~20x faster than the interpreted
 * higher-order-function composition (one tokenize, one LinkedHashSet
 * dedup, no per-element lambda evaluation).
 *
 * Tokenization parity is load-bearing for the DuckDB oracle: trim strips
 * 0x20 only (like SQL TRIM, not Java String#trim), and the split is Java
 * `\s+` regex semantics (a leading non-space whitespace yields a leading
 * empty token), identical to Spark's built-in `split`.
 */
case class TokenShingles(child: Expression, n: Int)
  extends UnaryExpression {

  require(n >= 1, s"token_shingles: n must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    TopnTypeChecks.check(child.dataType == StringType,
      s"token_shingles requires STRING, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = TokenShingles.shingles(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.expressions.TokenShingles.shingles($a, $n);")

  override protected def withNewChildInternal(c: Expression): TokenShingles =
    copy(child = c)
  override def prettyName: String = "token_shingles"
}

object TokenShingles {

  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** Core kernel, shared by interpreted eval and generated code. */
  def shingles(input: UTF8String, n: Int): GenericArrayData = {
    var s = input.toString
    // SQL TRIM semantics: strip 0x20 only
    var start = 0
    var end = s.length
    while (start < end && s.charAt(start) == ' ') start += 1
    while (end > start && s.charAt(end - 1) == ' ') end -= 1
    s = s.substring(start, end)

    val toks = ws.split(s, -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])

    val seen = new java.util.LinkedHashSet[String]((toks.length - n + 1) * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) {
      out(k) = UTF8String.fromString(it.next())
      k += 1
    }
    new GenericArrayData(out)
  }
}
