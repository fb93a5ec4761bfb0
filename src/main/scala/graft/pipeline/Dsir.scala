package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Data selection via importance resampling, after Xie et al. 2023
 * (arXiv:2302.03169, "Data Selection for Language Models via Importance
 * Resampling"): score every raw document by how much more likely its
 * tokens are under a *target* distribution (a trusted/curated slice) than
 * under the raw-corpus distribution, then keep the top-weighted documents.
 *
 * Two tiers, same estimator family:
 *
 *  - [[importanceWeightsHashed]] — the paper's own device: hash every
 *    token into a FIXED bucket space of `numBuckets` features, so the
 *    feature-stats table is bounded by construction (numBuckets rows, a
 *    few KB) no matter how large the vocabulary grows. This is the
 *    100 TB tier: a raw web corpus has an unbounded unigram vocabulary
 *    (misspellings, ids, urls — 10^8..10^9 distinct tokens), and any plan
 *    that materializes per-word statistics inherits that cardinality.
 *  - [[importanceWeights]] — raw unigrams with add-one smoothing, exact
 *    per-word ratios. The vocabulary-sized stats table stays distributed
 *    (never a forced broadcast, never on the driver); the scoring join is
 *    keyed by word and AQE picks the join strategy from the table's real
 *    size at runtime.
 *
 * Per-document weight: sum over token OCCURRENCES of the per-feature
 * log-likelihood ratio, in BASE-2 units:
 *
 *   lr(f) = log2( ((c_target(f)+1) * (N_raw + V)) /
 *                 ((c_r(f)+1)      * (N_target + V)) )
 *
 * with c_* the feature counts in each slice, N_* the slice token totals,
 * and V the smoothing vocabulary: the observed distinct-feature count for
 * the raw-unigram tier, the fixed `numBuckets` for the hashed tier (every
 * bucket is a feature by construction, occupied or not). The target slice
 * is a subset of raw, so one smoothing vocabulary serves both. An empty
 * target slice is tolerated: every ratio degrades to the same well-defined
 * negative constant family (c_target=0, N_target=0), uniformly
 * down-weighting everything rather than failing. Base-2 instead of the
 * paper's natural log is a uniform 1/ln2 rescale of every weight —
 * rank-identical selection.
 *
 * Determinism: each per-feature ratio is floored to 1e-6 fixed point
 * BEFORE the per-doc sum, so the aggregate is an order-independent integer
 * sum — stable across shuffle schedules and partitionings. The log itself
 * is [[graft.expressions.FixedLog2]] — the square-and-compare recurrence
 * in pure IEEE arithmetic, bit-identical on every platform and replayed
 * op-for-op by the oracle's unrolled CTE chain — so there is NO
 * transcendental anywhere in a floored, summed term (the [[LanguageModel]]
 * doctrine; no libm, no cross-platform caveat).
 *
 * Scale shape (100 TB): two scans of the docs table (count, then score) —
 * the train-then-apply shape of [[LanguageModel]]. The feature-stats
 * aggregation is one shuffle keyed by feature with map-side partial
 * aggregation. The one-row totals broadcast (bounded by construction);
 * the per-feature lr table joins back by key with NO broadcast hint —
 * bounded at `numBuckets` rows in the hashed tier, and AQE-sized in the
 * raw tier. Scoring is then one hash aggregation by doc_id of longs. No
 * driver-side data beyond the single-row totals.
 */
object Dsir {

  /**
   * Portable deterministic token bucket in [0, numBuckets): the first 15
   * hex chars of md5(token) — a 60-bit non-negative integer — reduced mod
   * `numBuckets`. Every step (md5 → lowercase hex, hex-prefix to int,
   * modulo of non-negatives) computes identically in Spark and standard
   * SQL engines, so bucketed statistics are oracle-replayable; see
   * [[featureBucketSql]] for the engine-neutral spelling generated from
   * the same constants.
   */
  def featureBucket(token: Column, numBuckets: Int): Column = {
    require(numBuckets >= 2 && numBuckets <= (1 << 30),
      s"numBuckets must be in [2, 2^30], got $numBuckets")
    conv(substring(md5(token), 1, 15), 16, 10).cast("long") % numBuckets
  }

  /** [[graft.expressions.FixedLog2]] as a Column — the deterministic
    * IEEE-only log2 shared by [[Dsir]] and [[Bm25]]. */
  private[pipeline] def fixedLog2(x: Column): Column = {
    import org.apache.spark.sql.graftshim.GraftShim
    GraftShim.column(graft.expressions.FixedLog2(GraftShim.expression(x)))
  }

  /** The identical bucket computation as engine-neutral SQL over
    * `tokenExpr` (hex-string cast, DuckDB/standard), for oracle
    * construction — same constants as [[featureBucket]] so the two
    * spellings cannot drift. */
  def featureBucketSql(tokenExpr: String, numBuckets: Int): String = {
    require(numBuckets >= 2 && numBuckets <= (1 << 30),
      s"numBuckets must be in [2, 2^30], got $numBuckets")
    s"(CAST(('0x' || substr(md5($tokenExpr), 1, 15)) AS BIGINT) % $numBuckets)"
  }

  /**
   * Per-document importance weights over HASHED features — the bounded,
   * any-vocabulary tier. Output columns, in order: (doc_id, is_target,
   * n_tokens, weight_e6) where weight_e6 is the fixed-point
   * log-likelihood-ratio sum described above. `isTarget` marks the
   * curated slice (evaluated against `docs`' columns). Hash collisions
   * merge words into one feature — the paper's accepted trade; grow
   * `numBuckets` to taste (the stats table is numBuckets rows regardless
   * of corpus size).
   */
  def importanceWeightsHashed(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      numBuckets: Int = 1 << 13): DataFrame =
    weightsByFeature(docs, idCol, textCol, isTarget,
      w => featureBucket(w, numBuckets), fixedVocab = Some(numBuckets.toLong))

  /**
   * Per-document importance weights over raw unigram features — exact
   * per-word ratios, observed-vocabulary smoothing. Same output columns:
   * (doc_id, is_target, n_tokens, weight_e6). The word-stats table is
   * vocabulary-sized and stays fully distributed; prefer
   * [[importanceWeightsHashed]] when the vocabulary is unbounded.
   */
  def importanceWeights(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column): DataFrame =
    weightsByFeature(docs, idCol, textCol, isTarget, identity, fixedVocab = None)

  /** Shared estimator core: explode tokens, map each through `feature`,
    * aggregate per-feature counts, score per-feature ratios, sum per doc.
    * `fixedVocab` pins the smoothing V (hashed tier); None counts the
    * observed distinct features (raw tier). */
  private def weightsByFeature(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      feature: Column => Column,
      fixedVocab: Option[Long]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._

    val exploded = docs
      .select(col(idCol).as("doc_id"), isTarget.as("is_target"),
        explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .select($"doc_id", $"is_target", feature($"w").as("f"))

    // one shuffle by feature; bounded at numBuckets rows when hashed
    val featStats = exploded
      .groupBy($"f")
      .agg(count(lit(1)).as("c_raw"),
        sum(when($"is_target", 1L).otherwise(0L)).as("c_target"))

    val totals = featStats
      .agg(sum($"c_raw").as("n_raw"), sum($"c_target").as("n_target"),
        fixedVocab.map(lit(_)).getOrElse(count(lit(1))).as("v"))

    // Exact-integer inputs; the per-feature log2 is the deterministic
    // FixedLog2 recurrence (no libm), and the 1e-6 floor happens per
    // FEATURE so the doc-level sum is an order-independent integer sum.
    val ratio =
      (($"c_target".cast("double") + lit(1.0)) *
        ($"n_raw".cast("double") + $"v".cast("double"))) /
        (($"c_raw".cast("double") + lit(1.0)) *
          ($"n_target".cast("double") + $"v".cast("double")))
    val lr = featStats.crossJoin(broadcast(totals))
      .select($"f",
        floor(lit(1e6) * fixedLog2(ratio)).cast("long").as("lr_e6"))

    // keyed join, no broadcast hint: AQE picks the strategy from the lr
    // table's actual size (numBuckets rows hashed; vocab-sized raw)
    exploded
      .join(lr, "f")
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
