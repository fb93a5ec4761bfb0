package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Duplicated-span detection: the n-gram-granularity form of exact substring
 * deduplication (Lee et al. 2022, "Deduplicating Training Data Makes
 * Language Models Better" — there with suffix arrays; here fixed-width
 * token windows, the shape that distributes). A span is `n` consecutive
 * tokens starting every `stride` tokens; spans whose text recurs ANYWHERE
 * in the corpus (other documents or elsewhere in the same document) are
 * duplicated, and the single globally-first occurrence — smallest
 * (doc_id, position) — is the keeper.
 *
 * Memorization-prone verbatim repetition lives at this granularity, below
 * whole-document dedup: two distinct documents quoting the same boilerplate
 * paragraph never collide as documents but collide span-by-span here.
 *
 * Scale shape (100 TB): ONE scan of the docs table. Span hashes are
 * generated array-locally below the explode; global occurrence counts and
 * the keeper come from window aggregates PARTITIONed BY the span hash (one
 * shuffle on the 32-byte hash — no self-join, no second consumption of the
 * exploded subtree, so AQE cannot double-run the map side), then one hash
 * aggregation by doc_id. A span duplicated a million times lands its
 * bucket on one task but the work is linear in the bucket — there is no
 * pair generation at this tier.
 */
object Spans {

  /** Max tokens per document for the (doc_id, pos) packing: pos rides in
    * the low 20 bits, so keeper selection is a single BIGINT min that any
    * SQL engine reproduces with plain arithmetic. */
  val MaxPos: Int = 1 << 20

  /** The id column as a long, failing FAST on a non-numeric id: a silent
    * `cast("long")` turns a string id into NULL, which would then trip the
    * packing-range guard with a misleading "out of packing range: null"
    * instead of naming the real problem (wrong id type). */
  private def idAsLong(docs: DataFrame, idCol: String): org.apache.spark.sql.Column = {
    val raw = col(idCol)
    // try_cast, not cast: ANSI mode would otherwise throw a generic
    // CAST_INVALID_INPUT before this guard can name the column
    val casted = raw.try_cast(org.apache.spark.sql.types.LongType)
    val rawType = docs.schema(idCol).dataType
    // A fractional id (DOUBLE 1.5) try_casts fine but silently TRUNCATES,
    // which can collide two distinct ids in the (doc_id, pos) packing — the
    // exact corruption class this guard exists for. Require round-trip
    // equality for fractional input types (string ids keep the plain path:
    // a round-trip check would reject valid non-canonical spellings like
    // "01", and a string that parses as a long never truncates).
    import org.apache.spark.sql.types.{DecimalType, DoubleType, FloatType}
    val isFractional = rawType match {
      case DoubleType | FloatType => true
      case _: DecimalType => true
      case _ => false
    }
    val ok =
      if (isFractional) casted.isNotNull && casted.cast(rawType) === raw
      else casted.isNotNull
    when(raw.isNull || ok, casted)
      .otherwise(raise_error(format_string(
        s"Spans: id column '$idCol' has non-integral value '%s' — pass a " +
          "numeric id column", raw.cast("string"))))
  }

  /**
   * Per-document span-duplication stats:
   *  - `n_spans`: spans the document contributes,
   *  - `n_dup_spans`: spans whose text occurs >= 2 times corpus-wide
   *    (cross-document or within-document),
   *  - `n_kept_spans`: spans this document keeps under global
   *    first-occurrence retention (unique spans are trivially their own
   *    keeper, so `n_spans - n_kept_spans` is exactly the spans a
   *    span-level dedup pass would cut from this document).
   *
   * Documents with fewer than `n` tokens have no spans and are absent.
   * Requires non-negative doc ids (< 2^43) and documents under [[MaxPos]]
   * tokens; violations raise rather than silently mis-keying the keeper.
   */
  def spanStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 10,
      stride: Int = 5): DataFrame = {
    require(n >= 1, s"span width n must be >= 1, got $n")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = docs.sparkSession
    import spark.implicits._

    val toks = TextAnalysis.tokens(col(textCol))
    // All array work stays below the explode (the analyzer would hoist it
    // above the Generate node and re-run it per emitted span otherwise —
    // same idiom as TextAnalysis.repetitionStats).
    val spans = docs
      .select(idAsLong(docs, idCol).as("doc_id"), toks.as("toks"))
      .filter(size($"toks") >= n)
      .select($"doc_id",
        transform(sequence(lit(0), size($"toks") - n, lit(stride)),
          st => struct(st.as("pos"),
            md5(concat_ws(" ", slice($"toks", st + 1, lit(n)))).as("h"))).as("sp"))
      .select($"doc_id", explode($"sp").as("s"))
      .select($"doc_id", $"s.h".as("h"),
        // loud guard: a packed key collision would silently pick a wrong
        // keeper, so out-of-range inputs fail instead
        when($"doc_id".between(0L, (1L << 43) - 1) && $"s.pos" < MaxPos,
          $"doc_id" * MaxPos + $"s.pos")
          .otherwise(raise_error(format_string(
            "spanStats: doc_id/pos out of packing range: %d/%d",
            $"doc_id", $"s.pos"))).as("packed"))

    val byHash = Window.partitionBy($"h")
    spans
      .select($"doc_id", $"packed",
        count(lit(1)).over(byHash).as("n_occ"),
        min($"packed").over(byHash).as("keep_key"))
      .groupBy($"doc_id")
      .agg(
        count(lit(1)).as("n_spans"),
        sum(when($"n_occ" >= 2, 1L).otherwise(0L)).as("n_dup_spans"),
        sum(when($"packed" === $"keep_key", 1L).otherwise(0L)).as("n_kept_spans"))
  }

  /**
   * The REWRITE that [[spanStats]] only measures: cut every duplicated
   * span except its globally-first occurrence and rebuild the text —
   * span-granularity exact substring deduplication (Lee et al. 2022's
   * retention rule at token-window resolution).
   *
   * The document is packed into consecutive NON-overlapping `n`-token
   * chunks (overlap would make removal ambiguous); the final partial
   * chunk (< n tokens) is never a dedup candidate and is always kept —
   * short tails are not the memorization risk, and cutting a 2-token tail
   * that happens to equal another tail would mangle unrelated documents.
   * A full chunk survives iff its text is globally unique or this
   * occurrence is the smallest (doc_id, chunk_idx). Rebuilt text joins
   * surviving chunks with single spaces (tokenization already collapses
   * whitespace, so this is the same normalization every hash in this file
   * applies).
   *
   * Output per input doc: (doc_id, n_spans, n_dropped_spans, clean_text)
   * — n_spans counts FULL chunks; every input doc appears, empty docs
   * with empty clean_text.
   *
   * Scale shape: identical to [[spanStats]] — one scan, chunking below
   * the explode, one 32-byte-hash-partitioned window, one per-doc hash
   * aggregation that reassembles position-ordered text from unordered
   * aggregate state (the [[Lines.dedupLines]] idiom). No self-join, no
   * second consumption of the exploded subtree.
   */
  def dropDuplicatedSpans(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 10): DataFrame = {
    require(n >= 1, s"span width n must be >= 1, got $n")
    val spark = docs.sparkSession
    import spark.implicits._

    val toks = TextAnalysis.tokens(col(textCol))
    val chunks = docs
      .select(idAsLong(docs, idCol).as("doc_id"), toks.as("toks"))
      .select($"doc_id",
        // chunk ci covers tokens [ci*n+1, ci*n+n]; empty docs emit one
        // empty chunk (kept, like `split`'s empty-string element)
        transform(
          sequence(lit(0),
            greatest(floor((size($"toks") - 1) / lit(n)), lit(0)).cast("int")),
          ci => struct(ci.as("ci"),
            array_join(slice($"toks", ci * n + 1, lit(n)), " ").as("chunk"),
            (size($"toks") >= (ci + 1) * n).as("full"))).as("cs"))
      .select($"doc_id", explode($"cs").as("c"))
      .select($"doc_id", $"c.ci".as("ci"), $"c.chunk".as("chunk"),
        // partial/empty chunks get a per-row unique key so the hash
        // window sees them as singletons (always kept, never counted)
        when($"c.full", md5($"c.chunk"))
          .otherwise(format_string("P%d:%d", $"doc_id", $"c.ci")).as("h"),
        $"c.full".as("full"),
        when($"doc_id".between(0L, (1L << 43) - 1) && $"c.ci" < MaxPos,
          $"doc_id" * MaxPos + $"c.ci")
          .otherwise(raise_error(format_string(
            "dropDuplicatedSpans: doc_id/chunk out of packing range: %d/%d",
            $"doc_id", $"c.ci"))).as("packed"))

    val byHash = Window.partitionBy($"h")
    chunks
      .select($"doc_id", $"ci", $"chunk", $"full", $"packed",
        count(lit(1)).over(byHash).as("n_occ"),
        min($"packed").over(byHash).as("keep_key"))
      .withColumn("keep", !$"full" || $"n_occ" === 1 || $"packed" === $"keep_key")
      .groupBy($"doc_id")
      .agg(
        sum(when($"full", 1L).otherwise(0L)).as("n_spans"),
        sum(when($"full" && !$"keep", 1L).otherwise(0L)).as("n_dropped_spans"),
        Lines.rebuildText($"keep", $"ci", $"chunk", " ").as("clean_text"))
  }

  /**
   * Exact-substring deduplication at ARBITRARY alignment — the ExactSubstr
   * device of Lee et al. 2022 (arXiv:2107.06499 §4.1: remove every
   * duplicated substring of >= `n` tokens from all but one occurrence),
   * re-expressed without suffix arrays. [[dropDuplicatedSpans]] only cuts
   * duplicates that happen to align to its fixed n-token chunk grid; a
   * duplicated passage entering two documents at different offsets
   * straddles both grids and survives it. This tier closes that hole:
   *
   *  - every n-token window at STRIDE 1 is hashed, so a duplicated run of
   *    length L >= n contributes L-n+1 colliding windows REGARDLESS of
   *    alignment;
   *  - per window hash, the globally-first occurrence — smallest
   *    (doc_id, pos), the [[spanStats]] packing — is the keeper;
   *  - a TOKEN is dropped iff it is covered by some non-keeper duplicated
   *    window. For a duplicated run of length L >= n in a non-first
   *    occurrence, the windows lying fully inside the run cover exactly
   *    its L tokens (any boundary-straddling window mixes unique context
   *    and stays a singleton), so removal is token-exact on maximal
   *    duplicated runs — the retention rule of the paper at window
   *    resolution.
   *
   * Output per input doc: (doc_id, n_tokens, n_dropped_tokens,
   * clean_text); every doc appears, untouched docs with their
   * whitespace-normalized text (tokens rejoined by single spaces — the
   * same normalization every hash here applies).
   *
   * Scale shape (100 TB): stride-1 windows cost one 32-byte hash row per
   * token (n× denser than [[spanStats]]' strided windows but NOT n× the
   * bytes — each row is a hash, not a token slice). One scan generates
   * them below the explode; ONE hash-partitioned window over `h` finds
   * count + keeper with no self-join; the non-keeper dup rows that
   * survive the filter are duplication-sized, not corpus-sized, and fold
   * into per-doc sorted start lists (one keyed aggregation). The rebuild
   * joins those lists back to the docs table by id — AQE broadcasts the
   * drop side in the common sparse-duplication case, so the corpus is
   * re-read but never shuffled. Before the per-token coverage test, the
   * starts are merged into disjoint intervals (one per MAXIMAL duplicated
   * run), so a fully-duplicated pathological doc costs O(L) with one
   * interval, not O(L²) against L raw starts.
   */
  def dropDuplicatedSubstrings(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 50): DataFrame = {
    require(n >= 2, s"window width n must be >= 2, got $n")
    val spark = docs.sparkSession
    import spark.implicits._

    val base = docs.select(idAsLong(docs, idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))

    val wins = strideOneWindows(base, n)
      .select($"doc_id", $"pos", $"h",
        when($"doc_id".between(0L, (1L << 43) - 1) && $"pos" < MaxPos,
          $"doc_id" * MaxPos + $"pos")
          .otherwise(raise_error(format_string(
            "dropDuplicatedSubstrings: doc_id/pos out of packing range: %d/%d",
            $"doc_id", $"pos"))).as("packed"))

    val byHash = Window.partitionBy($"h")
    val drops = wins
      .select($"doc_id", $"pos", $"packed",
        count(lit(1)).over(byHash).as("n_occ"),
        min($"packed").over(byHash).as("keep_key"))
      .filter($"n_occ" >= 2 && $"packed" =!= $"keep_key")
      .groupBy($"doc_id")
      .agg(sort_array(collect_list($"pos")).as("drop_starts"))

    rebuildWithoutCoveredTokens(base, drops, n)
  }

  /**
   * Span-level test-set decontamination: drop from every TRAINING
   * document exactly the token runs it shares (as >= `n`-token
   * substrings, at any alignment) with the TEST/held-out corpus, keeping
   * the rest of the document. The surgical sibling of
   * [[graft.pipeline.Dedup.contamination]]'s doc-level removal: where
   * that tier discards a 10k-token document over one leaked benchmark
   * passage, this one excises the passage — the hygiene/yield trade
   * large pipelines actually want for long documents.
   *
   * Same window device as [[dropDuplicatedSubstrings]], different
   * predicate: a train token is dropped iff covered by a stride-1
   * n-token window whose hash occurs ANYWHERE in the test corpus (no
   * keeper — the test set keeps its copy by definition, so every
   * colliding train window drops). Removal is token-exact on maximal
   * shared runs, by the same boundary argument.
   *
   * Output per TRAIN doc: (doc_id, n_tokens, n_dropped_tokens,
   * clean_text) — every train doc appears; test docs are not output.
   *
   * Scale shape (100 TB train corpus): the train side is scanned once
   * and its windows never self-join; the test side (an eval benchmark —
   * tiny by construction) reduces to DISTINCT window hashes, which AQE
   * broadcasts into the semi join, making the whole match map-side. The
   * drop lists and rebuild join are identical to
   * [[dropDuplicatedSubstrings]] (duplication-sized, corpus re-read but
   * never shuffled).
   */
  def scrubSharedSubstrings(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 8): DataFrame = {
    require(n >= 2, s"window width n must be >= 2, got $n")
    val spark = train.sparkSession
    import spark.implicits._

    def windows(df: DataFrame) = strideOneWindows(
      df.select(idAsLong(df, idCol).as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("toks")), n)

    val base = train.select(idAsLong(train, idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
    val testHashes = windows(test).select($"h").distinct()
    val drops = windows(train)
      .join(testHashes, Seq("h"), "left_semi")
      .groupBy($"doc_id")
      .agg(sort_array(collect_list($"pos")).as("drop_starts"))

    rebuildWithoutCoveredTokens(base, drops, n)
  }

  /** Shared stride-1 window generator over a (doc_id, toks) base: one
    * md5-hashed n-token window per token position, (doc_id, pos, h) —
    * the hashing spelling BOTH substring tiers' DuckDB oracles replay
    * verbatim, kept in exactly one place so the tiers cannot drift. */
  private def strideOneWindows(base: DataFrame, n: Int): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    base
      .filter(size($"toks") >= n)
      .select($"doc_id",
        transform(sequence(lit(0), size($"toks") - n),
          st => struct(st.as("pos"),
            md5(concat_ws(" ", slice($"toks", st + 1, lit(n)))).as("h"))).as("sp"))
      .select($"doc_id", explode($"sp").as("s"))
      .select($"doc_id", $"s.pos".as("pos"), $"s.h".as("h"))
  }

  /** Shared rebuild: merge sorted window starts into disjoint covered
    * intervals (window at s covers [s, s+n-1]; starts closer than n fuse
    * into one maximal-run interval — a fully-covered doc costs O(L) with
    * one interval, not O(L²) against L raw starts), then keep exactly the
    * uncovered tokens. */
  private def rebuildWithoutCoveredTokens(
      base: DataFrame, drops: DataFrame, n: Int): DataFrame = {
    val spark = base.sparkSession
    import spark.implicits._
    val emptyIvs = array().cast("array<struct<s:int,e:int>>")
    val merged = aggregate(
      coalesce($"drop_starts", array().cast("array<int>")),
      emptyIvs,
      (acc, s) => {
        val last = element_at(acc, -1)
        when(size(acc) === 0 || last.getField("e") < s - 1,
          concat(acc, array(struct(s.as("s"), (s + lit(n) - 1).as("e")))))
          .otherwise(concat(slice(acc, lit(1), size(acc) - 1),
            array(struct(last.getField("s").as("s"),
              greatest(last.getField("e"), s + lit(n) - 1).as("e")))))
      })

    base.join(drops, Seq("doc_id"), "left")
      .withColumn("__ivs", merged)
      .withColumn("__kept", filter($"toks",
        (t, j) => !exists($"__ivs",
          iv => j >= iv.getField("s") && j <= iv.getField("e"))))
      .select($"doc_id",
        size($"toks").cast("long").as("n_tokens"),
        (size($"toks") - size($"__kept")).cast("long").as("n_dropped_tokens"),
        array_join($"__kept", " ").as("clean_text"))
  }
}
