package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Gopher-style rule-based document quality filtering (Rae et al. 2021,
 * arXiv:2112.11446, Table A1 "quality filtering" heuristics; overlapping
 * with C4's, Raffel et al. 2020): cheap structural rules that remove the
 * bulk of machine-generated and boilerplate web text BEFORE any model-
 * based scoring spends compute on it. Complements the statistical signals
 * in [[TextAnalysis]] ([[TextAnalysis.qualityScore]],
 * [[TextAnalysis.repetitionStats]]) and [[LanguageModel]]'s perplexity
 * tier: rules first (pennies per TB), model scores on the survivors.
 *
 * Every rule is spelled in exact INTEGER arithmetic (cross-multiplied
 * rational thresholds — `5 * alpha_words >= 4 * n_words` instead of
 * `alpha_frac >= 0.8`), so the flags are bit-identical in any engine and
 * the driver's DuckDB oracle replays them verbatim.
 *
 * Scale shape: a pure per-row projection over built-in string/array
 * expressions — whole-stage codegen, no shuffle, no UDF; filters push
 * down ahead of every downstream operator.
 */
object Quality {

  /** The Gopher stop-word probe set (§A1.1: a document with fewer than
    * two of these is unlikely to be running English prose). */
  val StopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Per-document rule columns + verdict. Output: the id column, the raw
   * integer facts each rule judges (`n_words`, `sum_word_len`,
   * `alpha_words`, `n_lines`, `bullet_lines`, `ellipsis_lines`,
   * `hash_marks`, `ellipses`, `stop_hits`), one boolean per rule, and
   * `pass` (their conjunction).
   *
   * Rules (Gopher Table A1, thresholds as published):
   *  - `ok_word_count`: `minWords <= n_words <= maxWords`;
   *  - `ok_mean_word_len`: mean word length in [3, 10] characters;
   *  - `ok_bullet_lines`: <= 90% of lines start with a bullet ("- ", "* ");
   *  - `ok_ellipsis_lines`: <= 30% of lines end with "...";
   *  - `ok_symbol_ratio`: (# marks + ellipses) <= 10% of words;
   *  - `ok_alpha_words`: >= 80% of words contain an alphabetic char;
   *  - `ok_stop_words`: >= 2 distinct [[StopWords]] present.
   */
  def gopherFlags(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      stopWords: Seq[String] = StopWords): DataFrame = {
    require(minWords >= 1 && maxWords >= minWords,
      s"need 1 <= minWords <= maxWords, got [$minWords, $maxWords]")
    require(stopWords.size >= 2,
      s"the stop-word probe needs >= 2 words (rule: >= 2 present), got $stopWords")
    val spark = docs.sparkSession
    import spark.implicits._

    def charCount(c: Column, s: String): Column =
      (length(c) - length(call_function("replace", c, lit(s), lit("")))) / s.length

    val base = docs.select(
      col(idCol),
      TextAnalysis.tokens(col(textCol)).as("__toks"),
      split(col(textCol), "\n").as("__lines"),
      charCount(col(textCol), "#").cast("long").as("hash_marks"),
      charCount(col(textCol), "...").cast("long").as("ellipses"))

    val facts = base.select(
      col(idCol),
      size($"__toks").cast("long").as("n_words"),
      aggregate($"__toks", lit(0L), (acc, w) => acc + length(w))
        .as("sum_word_len"),
      size(filter($"__toks", w => w.rlike("[A-Za-z]"))).cast("long")
        .as("alpha_words"),
      size($"__lines").cast("long").as("n_lines"),
      size(filter($"__lines", l =>
        startswith(ltrim(l), lit("- ")) || startswith(ltrim(l), lit("* "))))
        .cast("long").as("bullet_lines"),
      size(filter($"__lines", l => endswith(rtrim(l), lit("..."))))
        .cast("long").as("ellipsis_lines"),
      $"hash_marks", $"ellipses",
      size(array_intersect(
        array_distinct(transform($"__toks", w => lower(w))),
        array(stopWords.map(lit): _*))).cast("long").as("stop_hits"))

    // exact integer comparisons only — no floats anywhere, so the flags
    // replay bit-identically in any engine
    facts.select(
      facts.columns.map(col) ++ Seq(
        ($"n_words" >= minWords && $"n_words" <= maxWords).as("ok_word_count"),
        ($"sum_word_len" >= lit(3L) * $"n_words" &&
          $"sum_word_len" <= lit(10L) * $"n_words").as("ok_mean_word_len"),
        (lit(10L) * $"bullet_lines" <= lit(9L) * $"n_lines").as("ok_bullet_lines"),
        (lit(10L) * $"ellipsis_lines" <= lit(3L) * $"n_lines").as("ok_ellipsis_lines"),
        (lit(10L) * ($"hash_marks" + $"ellipses") <= $"n_words").as("ok_symbol_ratio"),
        (lit(5L) * $"alpha_words" >= lit(4L) * $"n_words").as("ok_alpha_words"),
        ($"stop_hits" >= 2L).as("ok_stop_words")): _*)
      .withColumn("pass",
        $"ok_word_count" && $"ok_mean_word_len" && $"ok_bullet_lines" &&
          $"ok_ellipsis_lines" && $"ok_symbol_ratio" && $"ok_alpha_words" &&
          $"ok_stop_words")
  }

  /** Keep-list composition: the input rows passing every Gopher rule. */
  def gopherFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minWords: Long = 50L,
      maxWords: Long = 100000L,
      stopWords: Seq[String] = StopWords): DataFrame = {
    val keep = gopherFlags(docs, idCol, textCol, minWords, maxWords, stopWords)
      .filter(col("pass"))
      .select(col(idCol).as("__graft_quality_id"))
    docs.join(keep, docs(idCol) === col("__graft_quality_id"), "left_semi")
  }
}
