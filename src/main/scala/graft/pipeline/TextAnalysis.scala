package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Unicode NFC normalization + control-character strip (the C4-style
    * cleanup pass; see [[graft.expressions.NormalizeText]] — codegen'd,
    * ASCII fast path, DuckDB-replayable via nfc_normalize). */
  def normalizeText(text: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.expressions.NormalizeText(GraftShim.expression(text)))
  }

  /** HTML-to-text extraction (see [[graft.expressions.HtmlToText]] —
    * codegen'd tag/script/style strip + entity decode, one line per block
    * element): the crawl front door feeding [[normalizeText]] and the
    * [[Lines]] boilerplate passes. */
  def htmlToText(html: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.expressions.HtmlToText(GraftShim.expression(html)))
  }

  /** Outlink extraction (see [[graft.expressions.HtmlLinks]] — every
    * `<a>` tag's raw `href`, document order): the link-graph front door
    * feeding [[Urls]] normalization and [[Graph]] ranking. */
  def htmlLinks(html: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.expressions.HtmlLinks(GraftShim.expression(html)))
  }

  /** Anchor extraction with text (see [[graft.expressions.HtmlAnchors]] —
    * every `<a>` tag's `(href, text)` pair, href rule shared with
    * [[htmlLinks]]): anchor text is the target-side relevance signal for
    * per-domain anchor-term statistics and link-spam phrase analysis. */
  def htmlAnchors(html: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.expressions.HtmlAnchors(GraftShim.expression(html)))
  }

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

  // --- PII redaction -------------------------------------------------------
  //
  // Regexes are written in the Java/RE2 COMMON subset (explicit character
  // classes, bounded quantifiers, \b word boundaries — no lookaround, no
  // lazy quantifiers) so the DuckDB oracle can run the identical pattern.
  // All four are pure regexp_replace/regexp_count compositions: map-side,
  // codegen'd, zero shuffle.

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[A-Za-z0-9./_%-]+"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  def emailCount(text: Column): Column = regexp_count(text, lit(EmailRe))
  def urlCount(text: Column): Column = regexp_count(text, lit(UrlRe))
  def ipv4Count(text: Column): Column = regexp_count(text, lit(Ipv4Re))
  def phoneCount(text: Column): Column = regexp_count(text, lit(PhoneRe))

  /**
   * Replace emails, URLs, IPv4 addresses and phone numbers with typed
   * placeholder tokens. Replacement order is fixed (email, URL, IP, phone)
   * and matters: an IP inside a URL is swallowed by the `<URL>` token. The
   * match counts above are taken on the ORIGINAL text, so overlapping
   * categories each count.
   */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text, EmailRe, "<EMAIL>"),
          UrlRe, "<URL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  // --- corpus report card ---------------------------------------------------

  /**
   * One-scan corpus report card — the datasheet numbers a curation run
   * publishes next to its shards (the practice the Pile / Dolma corpus
   * papers standardize): doc / token / char totals, exact-duplicate mass
   * via the dedup [[fingerprint]], empty-doc count, PII incidence, and
   * the [[languageId]] distribution. Output: (metric STRING, value
   * BIGINT) rows, one per metric — schema-stable as metrics are added,
   * and integer-only so the card is oracle-replayable bit-for-bit.
   *
   * Scale shape: ONE corpus scan into one global aggregate (map-side
   * partials; the COUNT DISTINCT fingerprint is the standard two-phase
   * distinct — the only corpus-sized shuffle, and it is exactly the
   * exact-dedup key count a curation run wants anyway), then a constant
   * `stack` of the 1-row result. Nothing driver-sized, nothing
   * vocabulary-sized.
   */
  def corpusReport(docs: DataFrame, textCol: String): DataFrame = {
    // a NULL text would count in docs_total but vanish from every other
    // metric (SUM skips nulls) — treat it as the empty document instead
    val t = coalesce(col(textCol), lit(""))
    // coalesce: SUM over zero rows is NULL, and the empty card is all-zero
    def flag(c: Column): Column =
      coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
    val one = docs.agg(
      count(lit(1)).as("docs_total"),
      coalesce(sum(length(t).cast("long")), lit(0L)).as("chars_total"),
      coalesce(sum(tokenCount(t).cast("long")), lit(0L)).as("tokens_total"),
      countDistinct(fingerprint(t)).as("fingerprints_distinct"),
      flag(length(trim(t)) === 0).as("docs_empty"),
      coalesce(sum(emailCount(t).cast("long")), lit(0L)).as("pii_email_hits"),
      flag(languageId(t) === "en").as("lang_en"),
      flag(languageId(t) === "fr").as("lang_fr"),
      flag(languageId(t) === "es").as("lang_es"),
      flag(languageId(t) === "de").as("lang_de"),
      flag(languageId(t) === "und").as("lang_und"))
      .withColumn("docs_exact_dup",
        col("docs_total") - col("fingerprints_distinct"))
    one.selectExpr(
      """stack(12,
        |  'chars_total', chars_total,
        |  'docs_empty', docs_empty,
        |  'docs_exact_dup', docs_exact_dup,
        |  'docs_total', docs_total,
        |  'fingerprints_distinct', fingerprints_distinct,
        |  'lang_de', lang_de,
        |  'lang_en', lang_en,
        |  'lang_es', lang_es,
        |  'lang_fr', lang_fr,
        |  'lang_und', lang_und,
        |  'pii_email_hits', pii_email_hits,
        |  'tokens_total', tokens_total) AS (metric, value)""".stripMargin)
  }

  // --- repetition / diversity quality signals ------------------------------

  /** Word bigrams as an array WITH duplicates (unlike [[wordShingles]],
    * which is a distinct set) — repetition signals need the multiset. */
  def wordBigrams(toks: Column): Column =
    zip_with(slice(toks, lit(1), size(toks) - 1), slice(toks, lit(2), size(toks) - 1),
      (a, b) => concat_ws(" ", a, b))

  /** Word trigrams with duplicates. */
  def wordTrigrams(toks: Column): Column =
    zip_with(zip_with(slice(toks, lit(1), size(toks) - 2), slice(toks, lit(2), size(toks) - 2),
      (a, b) => concat_ws(" ", a, b)), slice(toks, lit(3), size(toks) - 2),
      (ab, c) => concat_ws(" ", ab, c))

  /**
   * Per-document repetition signals in the Gopher / RefinedWeb family:
   *  - `distinct_token_frac`: |distinct tokens| / |tokens| (lexical
   *    diversity; boilerplate and keyword-stuffed docs score low),
   *  - `dup_trigram_frac`: fraction of trigram slots occupied by a trigram
   *    that already occurred in the doc (verbatim self-repetition),
   *  - `top_bigram_frac`: coverage of the single most frequent bigram
   *    (the "top n-gram coverage" rule).
   *
   * Rows with fewer than 3 tokens are dropped (no trigram is defined).
   *
   * Plan shape: ONE scan of the docs table. The array-local fractions are
   * computed in the pre-explode projection and ride along through the
   * bigram explode as extra grouping keys (they are functionally dependent
   * on doc_id, so widening the key changes nothing semantically — the same
   * single-scan idiom as [[Dedup.jaccardPairs]]'s size columns). The
   * bigram mode is then two hash aggregations keyed by doc —
   * embarrassingly parallel, no global shuffle hotspot, no join.
   */
  /**
   * Overlapping token-window chunking — the context-window primitive a
   * RAG index or a long-document training pipeline needs that
   * [[graft.pipeline.Sampling.packSequences]]' non-overlapping splits
   * cannot express: chunk k covers tokens [k·stride, k·stride + width)
   * for k in 0..floor((n-1)/stride), the final chunks shortening at the
   * document tail (`stride < width` gives the usual sliding overlap;
   * `stride == width` degenerates to disjoint windows). Output:
   * (doc_id, chunk_idx, n_chunk_tokens, chunk) with chunk text rebuilt
   * by single-space join, one row per chunk, documents in any order.
   *
   * Scale shape: one scan, per-row `explode(sequence(...))` bounded by
   * the per-document chunk count, slice + join as codegen'd array
   * built-ins — no shuffle, no state, nothing corpus-sized (the same
   * shuffle-free generate shape as [[Lines.tokenWindowLines]]).
   */
  def chunkTokens(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      width: Int,
      stride: Int): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    require(stride >= 1 && stride <= width,
      s"stride must be in [1, width]: got stride=$stride width=$width")
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(0),
          floor((size(col("__toks")) - 1) / lit(stride)).cast("int"))).as("chunk_idx"))
      .select(col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("__toks"), col("chunk_idx") * stride + 1, lit(width)).as("__c"))
      .select(col("doc_id"), col("chunk_idx"),
        size(col("__c")).cast("long").as("n_chunk_tokens"),
        array_join(col("__c"), " ").as("chunk"))
  }

  def repetitionStats(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    docs
      .select(col(idCol).as("doc_id"), tokens(col(textCol)).as("toks"))
      .withColumn("n_tokens", size(col("toks")))
      .filter(col("n_tokens") >= 3)
      // Stage ALL expensive array work in its own projection BELOW the
      // explode: the analyzer hoists non-generator expressions of an
      // explode-projection ABOVE the Generate node, where they would be
      // re-evaluated once per emitted bigram (~n_tokens× the work — a
      // measured 20× wall-time regression when inlined).
      .select(
        col("doc_id"),
        col("n_tokens"),
        (size(array_distinct(col("toks"))).cast("double") /
          col("n_tokens").cast("double")).as("distinct_token_frac"),
        ((col("n_tokens") - 2 - size(array_distinct(wordTrigrams(col("toks"))))).cast("double") /
          (col("n_tokens") - 2).cast("double")).as("dup_trigram_frac"),
        wordBigrams(col("toks")).as("bgs"))
      .select(col("doc_id"), col("n_tokens"), col("distinct_token_frac"),
        col("dup_trigram_frac"), explode(col("bgs")).as("bg"))
      .groupBy(col("doc_id"), col("n_tokens"), col("distinct_token_frac"),
        col("dup_trigram_frac"), col("bg"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("n_tokens"), col("distinct_token_frac"),
        col("dup_trigram_frac"))
      .agg(max(col("c")).as("maxc"))
      .select(
        col("doc_id"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("distinct_token_frac"),
        col("dup_trigram_frac"),
        (col("maxc").cast("double") / (col("n_tokens") - 1).cast("double"))
          .as("top_bigram_frac"))
  }

  /**
   * Per-document token-distribution (Shannon) entropy in EXACT 1e-6
   * fixed-point bits — the distribution-shape quality signal
   * [[repetitionStats]]' ratio facts don't capture (a doc repeating one
   * phrase and a doc cycling ten phrases can share a distinct-token
   * fraction yet differ sharply in entropy; low entropy = templated/
   * machine-generated text).
   *
   * Exact cross-engine spelling of H = log2(n) − (1/n)·Σ c·log2(c):
   * every log2 is the deterministic [[graft.expressions.FixedLog2]]
   * recurrence, each Σ term is floored to a 1e-6 integer BEFORE the sum
   * (order-independent integer addition — no float-summation-order
   * assumption), and the final division clamps the numerator at 0 (the
   * single-token-type knife edge where the two floors cross) so integer
   * division agrees in any engine. Output: (doc_id, n_tokens,
   * n_distinct, entropy_e6); docs with no tokens emit no row.
   *
   * Scale shape: one explode + two keyed hash aggregations (by
   * (doc, token), then by doc) — no window, no join, partial aggregation
   * map-side on both.
   */
  def tokenEntropy(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    def log2c(x: org.apache.spark.sql.Column) =
      org.apache.spark.sql.graftshim.GraftShim.column(
        graft.expressions.FixedLog2(
          org.apache.spark.sql.graftshim.GraftShim.expression(x)))
    docs
      .select(col(idCol).as("doc_id"), explode(tokens(col(textCol))).as("tok"))
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .select(col("doc_id"), col("c"),
        floor(lit(1e6) * col("c") * log2c(col("c").cast("double")))
          .cast("long").as("term"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("n_distinct"),
        sum(col("term")).as("s"))
      .withColumn("__lg_n", log2c(col("n").cast("double")))
      .select(col("doc_id"),
        col("n").cast("long").as("n_tokens"),
        col("n_distinct").cast("long").as("n_distinct"),
        expr("greatest(n * cast(floor(1e6 * __lg_n) as bigint) - s, 0L) div n")
          .as("entropy_e6"))
  }

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
