package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Count-based n-gram language-model scoring — the CCNet-style "how
 * surprising is this document under a reference corpus" quality signal
 * used to rank web text for LLM training (filter the gibberish tail,
 * keep the fluent middle).
 *
 * The model is a plain bigram table: P(w2 | w1) = (c(w1 w2) + alpha) /
 * (ctx(w1) + alpha * V), add-alpha smoothed, where ctx(w1) counts w1 in
 * bigram-left position and V is the corpus token vocabulary. Documents
 * are scored by their mean conditional probability (and its -log2, in
 * bits) over all token bigrams.
 *
 * Scale design (the 100 TB story):
 *  - The model is three DataFrames (bigram counts, context counts, a
 *    1-row vocab size) — built with two hash aggregations over one scan
 *    of the reference corpus, reusable across scoring jobs, persistable
 *    as parquet like any table. No driver-side state: vocab size rides
 *    along as a broadcast 1-row cross join, so the whole pipeline stays
 *    lazy end-to-end.
 *  - Scoring is explode → two equi-joins keyed by bigram / context →
 *    one hash aggregation keyed by doc. A reference model built from a
 *    curated corpus (the CCNet setup) is small — Catalyst/AQE broadcasts
 *    it and scoring becomes one shuffle (the per-doc agg). Self-scoring
 *    a 100 TB corpus keeps both joins as shuffled hash joins on evenly
 *    distributed token keys.
 *
 * Cross-engine determinism (the driver hashes results against DuckDB):
 * per-bigram probabilities use only +, *, / on integer-valued doubles —
 * each IEEE-754 correctly-rounded, so bit-identical in any engine — and
 * are fixed-pointed via floor(p * 1e9) BEFORE the per-doc sum, making
 * the aggregate an order-independent integer sum. A transcendental
 * (log2) in the summed term would not survive cross-engine comparison;
 * [[surpriseBits]] derives bits from the already-deterministic mean
 * instead.
 */
object LanguageModel {

  /** Bigram LM: bigram counts, left-context counts, 1-row vocab size. */
  final case class BigramModel(bigrams: DataFrame, contexts: DataFrame, vocab: DataFrame)

  /** Adjacent-token bigrams as "w1 w2" strings (tokens are \s+-split so
    * the space separator is unambiguous); empty array below 2 tokens. */
  def bigrams(text: Column): Column = {
    val toks = TextAnalysis.tokens(text)
    val n = size(toks)
    when(n >= 2,
      zip_with(slice(toks, lit(1), n - 1), slice(toks, lit(2), n - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
  }

  /**
   * Train a bigram model over `textCol`: one scan, two hash aggregations
   * (bigram counts; context counts), plus a distinct-token count for the
   * smoothing denominator. Counts are occurrence counts (not per-doc
   * distinct) — the standard MLE estimator.
   */
  def trainBigrams(corpus: DataFrame, textCol: String): BigramModel = {
    val bg = corpus.select(explode(bigrams(col(textCol))).as("bigram"))
    val bigramCounts = bg.groupBy("bigram").agg(count(lit(1)).as("c_bigram"))
    val contextCounts = bg
      .select(split(col("bigram"), " ").getItem(0).as("w1"))
      .groupBy("w1").agg(count(lit(1)).as("c_context"))
    val vocab = corpus
      .select(explode(TextAnalysis.tokens(col(textCol))).as("tok"))
      .agg(count_distinct(col("tok")).as("v"))
    BigramModel(bigramCounts, contextCounts, vocab)
  }

  /**
   * Score documents under a [[BigramModel]]: per doc, the number of
   * bigrams, the order-independent fixed-point sum of smoothed
   * conditional probabilities (`sum_p_e9` = sum of floor(P(w2|w1)*1e9)),
   * and its exact integer mean `mean_p_e9`. Unseen bigrams/contexts
   * count 0 (left joins), so a foreign-corpus document degrades to the
   * alpha/(alpha*V) floor rather than erroring. Docs under 2 tokens have
   * no bigrams and are absent from the output (nothing to score).
   *
   * Output: (doc_id, n_bigrams, sum_p_e9, mean_p_e9), one row per
   * scoreable doc.
   */
  def scoreDocs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      model: BigramModel,
      alpha: Double = 1.0): DataFrame = {
    require(alpha > 0, s"alpha must be > 0, got $alpha")
    val exploded = docs.select(
      col(idCol).as("doc_id"),
      explode(bigrams(col(textCol))).as("bigram"))
      .withColumn("w1", split(col("bigram"), " ").getItem(0))

    val p = (coalesce(col("c_bigram"), lit(0L)).cast("double") + lit(alpha)) /
      (coalesce(col("c_context"), lit(0L)).cast("double") + lit(alpha) * col("v").cast("double"))

    exploded
      .join(model.bigrams, Seq("bigram"), "left")
      .join(model.contexts, Seq("w1"), "left")
      .crossJoin(broadcast(model.vocab))
      .select(col("doc_id"), floor(p * lit(1.0e9)).as("p_e9"))
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("p_e9")).as("sum_p_e9"))
      .withColumn("mean_p_e9", expr("sum_p_e9 div n_bigrams"))
  }

  /** Convenience: mean surprise in bits, -log2(mean probability), from
    * [[scoreDocs]] output. A monotone per-row transform of the already
    * cross-engine-deterministic fixed-point mean — the familiar
    * perplexity-style spelling (lower = more predictable text). */
  def surpriseBits(scored: DataFrame): DataFrame =
    scored.withColumn("surprise_bits",
      -log2(greatest(col("mean_p_e9").cast("double"), lit(1.0)) / lit(1.0e9)))

  /**
   * Persist a trained model as three parquet tables under `path`. At
   * scale the reference model is trained ONCE (on the curated corpus)
   * and every scoring job loads the same counts — retraining per job
   * would silently shift every score.
   */
  def save(model: BigramModel, path: String): Unit = {
    model.bigrams.write.mode("overwrite").parquet(s"$path/bigrams")
    model.contexts.write.mode("overwrite").parquet(s"$path/contexts")
    model.vocab.write.mode("overwrite").parquet(s"$path/vocab")
  }

  /** Load a model persisted by [[save]]. Counts round-trip exactly.
    * Fails fast on layout drift — names AND types: a counts table with
    * matching names but drifted types (e.g. int-narrowed c_bigram) would
    * otherwise load silently and mis-score or fail mid-job. */
  def load(path: String, spark: org.apache.spark.sql.SparkSession): BigramModel = {
    import org.apache.spark.sql.types.{LongType, StringType}
    val m = BigramModel(
      spark.read.parquet(s"$path/bigrams"),
      spark.read.parquet(s"$path/contexts"),
      spark.read.parquet(s"$path/vocab"))
    def typed(df: org.apache.spark.sql.DataFrame,
        cols: (String, org.apache.spark.sql.types.DataType)*): Boolean =
      df.schema.fields.map(f => f.name -> f.dataType).sortBy(_._1)
        .sameElements(cols.sortBy(_._1))
    require(typed(m.vocab, "v" -> LongType) &&
      typed(m.bigrams, "bigram" -> StringType, "c_bigram" -> LongType) &&
      typed(m.contexts, "w1" -> StringType, "c_context" -> LongType),
      s"not a LanguageModel.save layout at $path (need string keys and " +
        s"long counts; got bigrams=${m.bigrams.schema.simpleString}, " +
        s"contexts=${m.contexts.schema.simpleString}, " +
        s"vocab=${m.vocab.schema.simpleString})")
    m
  }
}
