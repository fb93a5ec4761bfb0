package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Line-level (CCNet-style) boilerplate deduplication: count how many
 * DISTINCT documents each line occurs in, and strip lines whose document
 * frequency exceeds a threshold — navigation bars, cookie banners,
 * license headers and other boilerplate repeat across thousands of pages
 * while genuine prose lines rarely repeat at all (Wenzek et al. 2020,
 * arXiv:1911.00359, dedups on line hashes exactly this way before
 * LM-based filtering).
 *
 * Works over any (doc, position, line) decomposition: feed real
 * newline-split lines ([[explodeLines]]) or fixed token windows when the
 * corpus has no line structure. Determinism: lines are keyed by md5 so
 * the frequency shuffle moves 32-byte keys instead of full text, and the
 * cleaned text is rebuilt in exact position order — bit-identical in any
 * engine (the driver oracle replays it).
 *
 * Scale shape: one explode, one hash-aggregate keyed by line hash
 * (map-side partials; the df table is distinct-lines-sized and stays
 * distributed), one equi-join of the exploded lines back on the hash
 * (AQE picks the strategy), one per-doc aggregate. No window over the
 * corpus, no driver-side state.
 */
object Lines {

  /** Decompose documents into (id, line_idx, line) on a separator regex
    * (default: newlines). Empty documents produce one empty line, like
    * `split` in every engine. */
  def explodeLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      sepRegex: String = "\n"): DataFrame =
    docs.select(col(idCol).as("doc_id"),
      posexplode(split(col(textCol), sepRegex)).as(Seq("line_idx", "line")))

  /** Fixed token-window pseudo-lines for corpora without line structure:
    * consecutive `width`-token chunks of the whitespace tokenization
    * (final partial chunk included). The window udf-free spelling used by
    * the driver's `line_dedup` query. */
  def tokenWindowLines(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      width: Int): DataFrame = {
    require(width >= 1, s"width must be >= 1, got $width")
    docs
      .select(col(idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__toks"))
      .select(col("doc_id"), col("__toks"),
        explode(sequence(lit(0),
          floor((size(col("__toks")) - 1) / lit(width)).cast("int"))).as("line_idx"))
      .select(col("doc_id"), col("line_idx").cast("int").as("line_idx"),
        array_join(slice(col("__toks"),
          col("line_idx") * width + 1, lit(width)), " ").as("line"))
  }

  /**
   * Per-document boilerplate stats + cleaned text. Input: (doc_id,
   * line_idx, line) rows from [[explodeLines]] / [[tokenWindowLines]].
   * A line is boilerplate when it occurs in MORE THAN `maxDocFreq`
   * distinct documents. Output per doc: (doc_id, n_lines,
   * n_boilerplate_lines, clean_text) with `clean_text` the surviving
   * lines rejoined by `joiner` in original order (empty string when
   * everything was boilerplate).
   */
  def dedupLines(
      lines: DataFrame,
      maxDocFreq: Long,
      joiner: String = "\n"): DataFrame = {
    require(maxDocFreq >= 1, s"maxDocFreq must be >= 1, got $maxDocFreq")
    val spark = lines.sparkSession
    import spark.implicits._

    val hashed = lines.select(
      $"doc_id", $"line_idx", $"line", md5($"line").as("__h"))
    val docFreq = hashed
      .groupBy($"__h")
      .agg(count_distinct($"doc_id").as("__df"))

    hashed
      .join(docFreq, Seq("__h"))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        count(when($"__df" > maxDocFreq, 1)).as("n_boilerplate_lines"),
        // rebuild in position order from the unordered aggregate state:
        // sort the (idx, line) pairs, then join — deterministic at any
        // partitioning, same spelling the oracle replays
        array_join(
          transform(
            array_sort(collect_list(
              when($"__df" <= maxDocFreq, struct($"line_idx", $"line")))),
            s => s.getField("line")),
          joiner).as("clean_text"))
  }

  /** Composition most pipelines want: documents with boilerplate lines
    * stripped, one output row per input doc (empty `clean_text` when the
    * whole document was boilerplate). */
  def stripBoilerplate(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDocFreq: Long,
      sepRegex: String = "\n"): DataFrame =
    dedupLines(explodeLines(docs, idCol, textCol, sepRegex), maxDocFreq)
}
