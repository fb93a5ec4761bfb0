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
      .select(col(idCol).cast("long").as("doc_id"), toks.as("toks"))
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
}
