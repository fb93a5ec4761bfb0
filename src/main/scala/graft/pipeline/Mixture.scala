package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

/**
 * Temperature-scaled corpus mixing weights — the multinomial
 * alpha-sampling recipe used by multilingual and multi-source LM
 * training (Conneau & Lample 2019, arXiv:1901.07291 §3.1; XLM-R,
 * arXiv:1911.02116 §3; the same device reweights GPT-3's datasets):
 * sample group i with probability p_i proportional to q_i^alpha, where
 * q_i is the group's natural share. alpha < 1 flattens the mixture —
 * low-resource groups are upsampled, the head is tamed — and alpha = 1
 * is the natural distribution.
 *
 * Since p_i ∝ q_i^alpha = (n_i / N)^alpha ∝ n_i^alpha, only n_i^alpha
 * is needed, computed WITHOUT libm pow (whose last-ulp platform
 * differences would flake the fixed-point oracle) as
 * 2^(alpha · log2 n_i) through the [[graft.expressions.FixedLog2]] /
 * [[graft.expressions.FixedExp2]] pair: every step is IEEE
 * exact-or-correctly-rounded with a fixed op sequence, so any engine
 * produces bit-identical doubles and the 1e-6 floors below are
 * deterministic. alpha is a rational alphaNum/alphaDen so the scale
 * multiply is two correctly-rounded ops, not a decimal literal parse.
 *
 * Output (one row per group, [[temperatureWeights]]):
 *  - `grp`            — the group key
 *  - `n`              — the group's weight (row count, or sum of
 *                       `weightCol` — e.g. token counts)
 *  - `share_ppm`      — floor(1e6 · n / N): natural share, parts/million
 *  - `temp_share_ppm` — floor(1e6 · w_i / Σw): the temperature share
 *  - `rate_ppm`       — floor(1e6 · temp_share / share): the resampling
 *                       rate vs natural (> 1e6 = upsample). NULL when
 *                       share_ppm is 0 (group too small to resolve in
 *                       ppm — the caller decides a floor rate).
 *
 * `rate_ppm / 10000` is directly the integer percent that
 * [[Sampling.mixCorpus]] (rates <= 100) and [[Sampling.upsampleCorpus]]
 * (rates > 100) consume, closing the loop: measure → weight → resample
 * in one deterministic pass.
 *
 * Scale shape: ONE hash aggregate keyed by group (map-side partials)
 * reduces the corpus to G rows, and the corpus is scanned exactly once —
 * the two totals are unpartitioned window sums over the G-row aggregate
 * (a single-partition stage, deliberately: G is the number of corpus
 * sources, bounded in the hundreds, and a window keeps the plan one
 * linear chain where an agg-and-rejoin spelling would replicate the
 * corpus scan into every total's subtree). All the log/exp/floor work
 * runs on G rows.
 *
 * Determinism fine print: Σw is summed as the INTEGER w_e6 =
 * floor(1e6 · w_i) (a BIGINT sum is order-independent where a double
 * sum is not); every ratio is a single correctly-rounded double divide
 * of integer-valued doubles, floored to ppm.
 */
object Mixture {

  private def fixedLog2(x: Column): Column =
    GraftShim.column(graft.expressions.FixedLog2(GraftShim.expression(x)))

  private def fixedExp2(x: Column): Column =
    GraftShim.column(graft.expressions.FixedExp2(GraftShim.expression(x)))

  /** floor(1e6 · num / den) on integer-valued double inputs — the shared
    * ppm spelling. Exact whenever num <= 2^53/1e6 (~9e9: any doc-counted
    * corpus; a token-weighted run beyond ~9e9 tokens per group rounds
    * the product) — but DETERMINISM never depends on exactness: both
    * engines compute the same correctly-rounded product and quotient at
    * any magnitude, so the floors cannot diverge. */
  private def ppm(num: Column, den: Column): Column =
    floor((lit(1000000.0) * num.cast("double")) / den.cast("double")).cast("long")

  /**
   * Per-group temperature sampling weights; see the object doc for the
   * column contract. `weightCol` defaults to row counting; pass e.g. a
   * token-count column to weight by tokens. alphaNum/alphaDen must be
   * positive and alpha = alphaNum/alphaDen <= 1 (temperature sampling
   * flattens; alpha > 1 would sharpen and overflow the ppm bounds for
   * huge groups).
   */
  def temperatureWeights(
      df: DataFrame,
      groupCol: String,
      alphaNum: Int,
      alphaDen: Int,
      weightCol: Option[String] = None): DataFrame = {
    require(alphaNum > 0 && alphaDen > 0 && alphaNum <= alphaDen,
      s"alpha must be a positive rational <= 1, got $alphaNum/$alphaDen")
    val w = weightCol.map(c => sum(col(c).cast("long")))
      .getOrElse(count(lit(1))).as("n")
    // n must be positive for log2; a zero-weight group cannot be sampled
    // anyway, so it is dropped (mirrored by HAVING in the SQL spelling)
    val counts = df.groupBy(col(groupCol).as("grp")).agg(w)
      .filter(col("n") > 0L)

    // the G-row single-partition stage carrying both totals (see the
    // scale-shape doc for why a window beats an agg-and-rejoin here)
    val all = org.apache.spark.sql.expressions.Window
      .partitionBy().rowsBetween(Long.MinValue, Long.MaxValue)

    // n^alpha = 2^(alpha * log2 n): deterministic cross-engine, see doc.
    val x = (lit(alphaNum.toDouble) * fixedLog2(col("n").cast("double"))) /
      lit(alphaDen.toDouble)
    counts
      .withColumn("__w_e6",
        floor(lit(1000000.0) * fixedExp2(x)).cast("long"))
      .select(
        col("grp"),
        col("n"),
        ppm(col("n"), sum(col("n")).over(all)).as("share_ppm"),
        ppm(col("__w_e6"), sum(col("__w_e6")).over(all)).as("temp_share_ppm"))
      .withColumn("rate_ppm",
        when(col("share_ppm") === 0L, lit(null).cast("long"))
          .otherwise(ppm(col("temp_share_ppm"), col("share_ppm"))))
  }

  /**
   * [[temperatureWeights]]' rates as the integer-percent map
   * [[Sampling.mixCorpus]] (rates below 100) and
   * [[Sampling.upsampleCorpus]] (rates above 100, fractional epochs)
   * consume — pct = floor(rate_ppm / 10000), clamped to `maxPct` so an
   * adversarially tiny group cannot demand unbounded replication (the
   * usual "epochs per source" cap; 1000 = 10 epochs). NULL rates
   * (groups too small for their natural share to resolve in ppm) fall
   * back to `maxPct` — by construction such a group is microscopically
   * underrepresented, so the cap IS its intended rate.
   *
   * A G-row driver-side collect, bounded by the group count — the same
   * bounded-collect pattern as IVF centroids; the corpus itself never
   * moves.
   */
  def ratePercents(weights: DataFrame, maxPct: Int = 1000): Map[String, Int] = {
    require(maxPct >= 0, s"maxPct must be >= 0, got $maxPct")
    weights
      .select(col("grp").cast("string"),
        least(
          coalesce((col("rate_ppm") / lit(10000L)).cast("long"),
            lit(maxPct.toLong)),
          lit(maxPct.toLong)).cast("int"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
  }

  /**
   * The identical computation as an engine-neutral WITH-chain fragment
   * for oracle construction, generated from the same recurrences
   * ([[graft.expressions.FixedLog2.sqlCtes]] /
   * [[graft.expressions.FixedExp2.sqlCtes]]) so the two spellings cannot
   * drift. `srcCte` must expose the rows; `groupExpr` / `weightExpr` are
   * SQL over them (`weightExpr = "1"` counts rows). Returns (stagesSql,
   * finalCteName); the final CTE has columns (grp, n, share_ppm,
   * temp_share_ppm, rate_ppm).
   */
  def temperatureSqlCtes(
      srcCte: String,
      groupExpr: String,
      weightExpr: String,
      alphaNum: Int,
      alphaDen: Int): (String, String) = {
    require(alphaNum > 0 && alphaDen > 0 && alphaNum <= alphaDen,
      s"alpha must be a positive rational <= 1, got $alphaNum/$alphaDen")
    def ppmSql(num: String, den: String): String =
      s"CAST(FLOOR((1000000.0 * CAST($num AS DOUBLE)) / CAST($den AS DOUBLE)) AS BIGINT)"
    val (lgStages, lgFin) = graft.expressions.FixedLog2.sqlCtes(
      "mxl", "mx_counts", "CAST(n AS DOUBLE)", Seq("grp", "n"))
    val (exStages, exFin) = graft.expressions.FixedExp2.sqlCtes(
      "mxe", "mx_x",
      s"(CAST($alphaNum AS DOUBLE) * lg) / CAST($alphaDen AS DOUBLE)",
      Seq("grp", "n"))
    val stages =
      s"""mx_counts AS (
        |  SELECT $groupExpr AS grp, CAST(SUM(CAST(($weightExpr) AS BIGINT)) AS BIGINT) AS n
        |  FROM $srcCte GROUP BY 1 HAVING SUM(CAST(($weightExpr) AS BIGINT)) > 0),
        |$lgStages,
        |mx_x AS (SELECT grp, n, lg FROM $lgFin),
        |$exStages,
        |mx_scored AS (
        |  SELECT grp, n, CAST(FLOOR(1000000.0 * ex) AS BIGINT) AS w_e6 FROM $exFin),
        |mx_tot AS (
        |  SELECT CAST(SUM(n) AS BIGINT) AS n_total, CAST(SUM(w_e6) AS BIGINT) AS w_total
        |  FROM mx_scored),
        |mx_weights AS (
        |  SELECT grp, n,
        |         ${ppmSql("n", "n_total")} AS share_ppm,
        |         ${ppmSql("w_e6", "w_total")} AS temp_share_ppm
        |  FROM mx_scored CROSS JOIN mx_tot),
        |mx_final AS (
        |  SELECT grp, n, share_ppm, temp_share_ppm,
        |         CASE WHEN share_ppm = 0 THEN NULL
        |              ELSE ${ppmSql("temp_share_ppm", "share_ppm")} END AS rate_ppm
        |  FROM mx_weights)""".stripMargin
    (stages, "mx_final")
  }
}
