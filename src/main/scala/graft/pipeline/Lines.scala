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

  /** Position-ordered text rebuild from unordered aggregate state: collect
    * the (position, part) pairs of rows passing `keep`, sort by position,
    * join. Deterministic at any partitioning — the single spelling shared
    * by every strip/rewrite operator ([[dedupLines]],
    * [[stripSketchBoilerplate]], [[Spans.dropDuplicatedSpans]]) so the
    * reassembly semantics cannot drift between them. */
  private[pipeline] def rebuildText(
      keep: Column, pos: Column, part: Column, joiner: String): Column =
    array_join(
      transform(
        array_sort(collect_list(when(keep, struct(pos.as("__i"), part.as("__p"))))),
        s => s.getField("__p")),
      joiner)

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
        rebuildText($"__df" <= maxDocFreq, $"line_idx", $"line", joiner)
          .as("clean_text"))
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

  /**
   * The BOUNDED-STATE tier of boilerplate removal: find the heavy-hitter
   * lines with the flagship topn sketch instead of materializing the full
   * line-frequency table. [[dedupLines]]'s frequency aggregation is
   * DISTINCT-LINES-sized — on a 100 TB crawl that is itself a
   * corpus-scale table, almost all of it singleton prose lines nobody
   * needs counted. Boilerplate is by definition a heavy hitter, which is
   * exactly the sketch's contract (space-saving: any line with true count
   * > N/counters survives; estimates only ever overcount, by at most
   * N/counters), so per-aggregation-state drops from |distinct lines| to
   * `counters`, at the cost of occurrence- (not distinct-document-)
   * frequency and approximate counts below the guarantee bar.
   *
   * Returns the heavy set itself: (line_h = md5 of the line text,
   * frequency) for the top `k` lines by total occurrence count with
   * frequency >= `minCount`, in the sketch's pinned (frequency desc,
   * hash asc) order. With `counters` >= distinct lines the counts are
   * exact and the result is engine-replayable — the driver oracle runs
   * that regime; production picks counters for the memory/precision
   * trade.
   */
  def sketchBoilerplate(
      lines: DataFrame,
      k: Int,
      minCount: Long,
      counters: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(minCount >= 2, s"minCount must be >= 2 (1 keeps every line), got $minCount")
    lines
      .select(md5(col("line")).as("__h"))
      .agg(graft.TopnFunctions.topn_add_agg(col("__h"), counters).as("__sk"))
      .select(explode(graft.TopnFunctions.topn(col("__sk"), lit(k))).as("r"))
      .select(col("r.item").as("line_h"), col("r.frequency").as("frequency"))
      .filter(col("frequency") >= minCount)
  }

  /**
   * [[dedupLines]]' output shape driven by the sketch-found heavy set: per
   * doc (doc_id, n_lines, n_boilerplate_lines, clean_text), where a line
   * is boilerplate iff its hash is in [[sketchBoilerplate]]'s top-k. The
   * heavy set is k rows — broadcast by construction — so the strip pass
   * is one scan with a broadcast join and one per-doc aggregation;
   * no corpus-sized frequency table anywhere.
   */
  def stripSketchBoilerplate(
      lines: DataFrame,
      k: Int,
      minCount: Long,
      counters: Int,
      joiner: String = "\n"): DataFrame = {
    val spark = lines.sparkSession
    import spark.implicits._
    val heavy = sketchBoilerplate(lines, k, minCount, counters)
      .select(col("line_h"))
    lines
      .select($"doc_id", $"line_idx", $"line", md5($"line").as("line_h"))
      .join(broadcast(heavy).withColumn("__hit", lit(1)), Seq("line_h"), "left")
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_lines"),
        count($"__hit").as("n_boilerplate_lines"),
        rebuildText($"__hit".isNull, $"line_idx", $"line", joiner)
          .as("clean_text"))
  }
}
