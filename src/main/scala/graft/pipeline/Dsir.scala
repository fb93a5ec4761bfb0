package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data selection via importance resampling, after Xie et al. 2023
 * (arXiv:2302.03169, "Data Selection for Language Models via Importance
 * Resampling"): score every raw document by how much more likely its
 * tokens are under a *target* distribution (a trusted/curated slice) than
 * under the raw-corpus distribution, then keep the top-weighted documents.
 * The paper hashes n-grams into a fixed bucket space; this implementation
 * keeps raw unigrams with add-one smoothing — same estimator family, and
 * the feature table stays distributed so an unbounded vocabulary never has
 * to fit on the driver.
 *
 * Per-document weight: sum over token OCCURRENCES of the per-word
 * log-likelihood ratio
 *
 *   lr(w) = ln( ((c_target(w)+1) * (N_raw + V)) /
 *               ((c_raw(w)+1)    * (N_target + V)) )
 *
 * with c_* the word counts in each slice, N_* the slice token totals, and
 * V the raw vocabulary size (the target slice is a subset of raw, so one
 * smoothing vocabulary serves both). Each per-word ratio is floored to
 * 1e-6 fixed point BEFORE the per-doc sum, so the aggregate is an
 * order-independent integer sum — bit-identical across engines and
 * shuffle schedules.
 *
 * Scale shape (100 TB): two scans of the docs table (count, then score) —
 * the train-then-apply shape of [[LanguageModel]]. The word-stats
 * aggregation is one shuffle keyed by word with map-side partial
 * aggregation; its result is vocabulary-sized, so the totals cross-join
 * and the scoring join both broadcast. Scoring is then one hash
 * aggregation by doc_id of longs. No driver-side data beyond the
 * single-row totals.
 */
object Dsir {

  /**
   * Per-document importance weights: (doc_id, n_tokens, is_target,
   * weight_e6) where weight_e6 is the fixed-point log-likelihood-ratio
   * sum described above. `isTarget` marks the curated slice (evaluated
   * against `docs`' columns); it must select at least one token.
   */
  def importanceWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val exploded = docs
      .select(col(idCol).as("doc_id"), isTarget.as("is_target"),
        explode(TextAnalysis.tokens(col(textCol))).as("w"))

    // one shuffle by word; result is |vocab| rows
    val wordStats = exploded
      .groupBy($"w")
      .agg(count(lit(1)).as("c_raw"),
        sum(when($"is_target", 1L).otherwise(0L)).as("c_target"))

    val totals = wordStats
      .agg(sum($"c_raw").as("n_raw"), sum($"c_target").as("n_target"),
        count(lit(1)).as("v"))

    // Exact-integer inputs; the single ln() sees an identically-computed
    // IEEE double in any engine, and the 1e-6 floor happens per WORD so
    // the doc-level sum is an integer.
    val lr = wordStats.crossJoin(broadcast(totals))
      .select($"w",
        floor(lit(1e6) * log(
          (($"c_target".cast("double") + lit(1.0)) *
            ($"n_raw".cast("double") + $"v".cast("double"))) /
            (($"c_raw".cast("double") + lit(1.0)) *
              ($"n_target".cast("double") + $"v".cast("double")))))
          .cast("long").as("lr_e6"))

    exploded
      .join(broadcast(lr), "w")
      .groupBy($"doc_id")
      .agg(max($"is_target").as("is_target"),
        count(lit(1)).as("n_tokens"),
        sum($"lr_e6").as("weight_e6"))
  }

  /**
   * The resampling step: keep the `k` raw (non-target) documents with the
   * highest importance weight, ties broken by doc_id. Deterministic
   * top-k — the heavy-tailed Gumbel perturbation of the paper is a
   * one-line `+ gumbelNoise(seed)` away, left out to keep selection
   * replayable.
   */
  def selectTopK(weights: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    weights.filter(!col("is_target"))
      .orderBy(col("weight_e6").desc, col("doc_id"))
      .limit(k)
  }
}
