package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * tokenization, quality scoring, language identification, fingerprinting.
 *
 * All of these are *compositions of built-in Spark SQL functions* — they
 * stay inside whole-stage codegen, push down through Catalyst untouched, and
 * scale linearly with no shuffle (pure map-side projections). Every formula
 * is mirrored 1:1 in DuckDB SQL by SparkEntry.oracleSql so results are
 * bit-identical cross-engine.
 */
object TextAnalysis {

  /** Whitespace tokenizer (the BPE-ish regex split used throughout). */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Count of sentence/clause punctuation characters. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.!?,;:]", ""))

  private val StopwordsEn = Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")

  def stopwordCount(text: Column): Column =
    size(filter(tokens(text), w => w.isin(StopwordsEn.map(x => x: Any): _*)))

  /**
   * Composite quality score in [0,1]: rewards reasonable length, low
   * punctuation density, and natural stopword rate. Formula is fixed and
   * mirrored exactly in the DuckDB oracle — arithmetic op order matters for
   * IEEE-identical doubles; change both together.
   */
  def qualityScore(text: Column): Column = {
    val nTok = tokenCount(text).cast("double")
    val nChar = length(text).cast("double")
    val punctRatio = punctCount(text).cast("double") / nChar
    val stopRatio = stopwordCount(text).cast("double") / nTok
    least(nTok / lit(100.0), lit(1.0)) * lit(0.3) +
      (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))) * lit(0.3) +
      least(stopRatio * lit(5.0), lit(1.0)) * lit(0.4)
  }

  /** Per-language marker-word sets for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny and deterministic. */
  private val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is"),
    "fr" -> Seq("le", "la", "les", "et", "de"),
    "es" -> Seq("el", "los", "las", "es", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"))

  def langScore(text: Column, lang: String): Column = {
    val markers = LangMarkers.toMap.apply(lang)
    size(filter(tokens(text), w => w.isin(markers.map(x => x: Any): _*)))
  }

  /**
   * Language-ID heuristic: argmax of marker-word hit counts with a fixed
   * priority order (en > fr > es > de) on ties, 'und' when nothing matches.
   */
  def languageId(text: Column): Column = {
    val en = langScore(text, "en")
    val fr = langScore(text, "fr")
    val es = langScore(text, "es")
    val de = langScore(text, "de")
    when(en + fr + es + de === 0, lit("und"))
      .when(en >= greatest(fr, es, de), lit("en"))
      .when(fr >= greatest(es, de), lit("fr"))
      .when(es >= de, lit("es"))
      .otherwise(lit("de"))
  }

  /** Canonical document fingerprint: md5 of case-folded,
    * whitespace-collapsed text. Identical docs modulo spacing/case share a
    * fingerprint — the cheap exact-dedup key. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /**
   * Evaluate `c` once per row and pass the bound result to `f`.
   *
   * Spark's higher-order functions re-evaluate any *unbound* subtree inside
   * the lambda body once per array element, and (being CodegenFallback)
   * get no common-subexpression elimination across reference sites — an
   * expression like `element_at(split(text), i)` inside a `transform` would
   * re-run the split for every element. Routing the expensive subtree
   * through a 1-element `transform` makes it a bound lambda variable:
   * evaluated exactly once per row.
   */
  def bindOnce(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /**
   * Word n-gram shingles (default n=3), distinct. The unit of the
   * n-gram-Jaccard near-dup pipeline. Empty array when the doc has fewer
   * than n tokens. Backed by the single-pass [[graft.expressions.TokenShingles]]
   * expression (tokenization semantics identical to
   * `split(trim(text), "\\s+")`).
   */
  def wordShingles(text: Column, n: Int = 3): Column =
    org.apache.spark.sql.graftshim.GraftShim.column(
      graft.expressions.TokenShingles(
        org.apache.spark.sql.graftshim.GraftShim.expression(text), n))
}
