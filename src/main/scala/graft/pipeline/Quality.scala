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

  // --- Term-blocklist filtering (the C4 device) ----------------------------

  /** Word-boundary normalization shared by both sides of the blocklist
    * match: lowercase, then strip leading/trailing non-alphanumerics from
    * each token — so "Bad," and "(bad)" match the listed term "bad".
    * Spelled with the exact regex pair the DuckDB oracle replays. */
  private def normTokens(text: Column): Column =
    filter(
      transform(TextAnalysis.tokens(lower(text)), t =>
        regexp_replace(regexp_replace(t, "^[^a-z0-9]+", ""), "[^a-z0-9]+$", "")),
      t => t =!= "")

  /**
   * Per-document hits against a term blocklist — the C4 curation device
   * (Raffel et al. 2020 §2.2: drop any page containing a word from a
   * public blocklist), generalized to multi-word phrases. Matching is
   * case-insensitive on word boundaries ([[normTokens]]): a phrase hits
   * when its words appear as CONSECUTIVE normalized tokens. Overlapping
   * occurrences each count.
   *
   * Output: one row per input doc — (id, n_hits, n_terms, kept) with
   * `kept = n_hits == 0`.
   *
   * Scale shape: the corpus is scanned once and exploded to its
   * normalized n-grams only for the n values actually PRESENT in the
   * blocklist (collected driver-side — the list is human-curated, tiny
   * by construction, and AQE broadcasts it into the hash join); hits
   * reduce by doc id. Nothing here is corpus²; the blocklist side never
   * shuffles the corpus.
   */
  def blocklistHits(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: DataFrame,
      termCol: String = "term"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val normTerms = terms
      .select(array_join(normTokens(col(termCol)), " ").as("__term"))
      .filter($"__term" =!= "")
      .distinct()
    val ns = normTerms
      .select(size(split($"__term", " ")).as("n")).distinct()
      .as[Int].collect().sorted
    require(ns.nonEmpty, "blocklist has no usable terms after normalization")
    require(ns.last <= 8,
      s"blocklist phrases longer than 8 words (got ${ns.last}) — not a curated term list")

    // ONE tokenize + ONE explode for ALL gram widths: per-width union
    // branches would re-scan and re-tokenize the corpus once per width.
    // bindOnce keeps the tokenize+normalize subtree at one eval per row
    // across the per-width gram builders.
    val grams = docs.select(col(idCol).as("__doc_id"),
      explode(TextAnalysis.bindOnce(normTokens(col(textCol))) { toks =>
        concat(ns.map { n =>
          if (n == 1) toks
          else when(size(toks) >= n,
            transform(sequence(lit(0), size(toks) - n),
              i => array_join(slice(toks, i + 1, lit(n)), " ")))
            .otherwise(array().cast("array<string>"))
        }: _*)
      }).as("__term"))

    val hits = grams
      .join(normTerms, Seq("__term"))
      .groupBy($"__doc_id")
      .agg(count(lit(1)).as("n_hits"),
        countDistinct($"__term").as("n_terms"))

    docs.select(col(idCol).as("__doc_id"))
      .join(hits, Seq("__doc_id"), "left")
      .select($"__doc_id".as(idCol),
        coalesce($"n_hits", lit(0L)).as("n_hits"),
        coalesce($"n_terms", lit(0L)).as("n_terms"),
        ($"n_hits".isNull).as("kept"))
  }

  /**
   * The pure-projection spelling of the blocklist hit count for a FIXED
   * literal list — no join, no aggregation, so it runs inside Structured
   * Streaming projections, pushed filters, and scoreColumn-style gates.
   * Same normalization and phrase semantics as [[blocklistHits]]
   * (equality is pinned by CurationSpec); use the DataFrame tier when
   * the list lives in a table or grows beyond a comfortable literal.
   */
  def blocklistHitCount(text: Column, terms: Seq[String]): Column = {
    def normTerm(t: String): String = t.toLowerCase.trim.split("\\s+")
      .map(_.replaceAll("^[^a-z0-9]+", "").replaceAll("[^a-z0-9]+$", ""))
      .filter(_.nonEmpty).mkString(" ")
    val normed = terms.map(normTerm).filter(_.nonEmpty).distinct
    require(normed.nonEmpty, "blocklist has no usable terms after normalization")
    val byWidth = normed.groupBy(_.count(_ == ' ') + 1)
    require(byWidth.keys.max <= 8,
      s"blocklist phrases longer than 8 words (got ${byWidth.keys.max}) — not a curated term list")
    // bindOnce: the tokenize+normalize subtree evaluates ONCE per row,
    // not once per width (Spark HOF lambdas re-evaluate unbound subtrees).
    // NULL text pins to 0 hits (kept) — matching blocklistHits' left-join
    // semantics; without the guard, size(NULL) = -1 would leak through
    // the unigram branch.
    val counted = TextAnalysis.bindOnce(normTokens(text)) { toks =>
      byWidth.toSeq.sortBy(_._1).map { case (n, ts) =>
        val listed = typedlit(ts)
        val grams =
          if (n == 1) toks
          else when(size(toks) >= n,
            transform(sequence(lit(0), size(toks) - n),
              i => array_join(slice(toks, i + 1, lit(n)), " ")))
            .otherwise(array().cast("array<string>"))
        size(filter(grams, g => array_contains(listed, g))).cast("long")
      }.reduce(_ + _)
    }
    when(text.isNull, lit(0L)).otherwise(counted)
  }

  /** The filter composition: input rows with NO blocklist hit, via a
    * keyed anti join against the (hit-doc-sized) flag list. */
  def blocklistFilter(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: DataFrame,
      termCol: String = "term"): DataFrame = {
    val flagged = blocklistHits(docs, idCol, textCol, terms, termCol)
      .filter(!col("kept"))
      .select(col(idCol).as("__graft_blocked_id"))
    docs.join(flagged, docs(idCol) === col("__graft_blocked_id"), "left_anti")
  }
}
