package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic corpus selection operators: per-domain caps and exact
 * global top-fraction thresholds — the two selection shapes every
 * large-scale curation pipeline applies after scoring.
 *
 * Both are exact and replayable: selection is a pure function of the data
 * (no randomness, documented tie rules), so a re-run, a repartition, or
 * another engine produces the identical keep set and the driver's DuckDB
 * oracle can replay it row for row.
 */
object Selection {

  import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}

  /** The types [[selectTopFraction]]'s exact long threshold walk accepts:
    * widening casts only — a float score would TRUNCATE, silently
    * collapsing distinct scores into ties. */
  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /**
   * Per-group cap by explicit priority: keep the `k` rows of each
   * `groupCol` value with the HIGHEST `priority` (all of them when the
   * group is smaller), ties broken by ascending id — "keep the 1000
   * longest / highest-quality documents per domain", the standard
   * per-source cap that stops one crawl domain from dominating a corpus.
   * Output: the input row plus its 1-based `cap_rank`.
   *
   * The hash-random flavor of this cap is [[Sampling.samplePerGroup]]
   * (priority = portable hash rank); this is the priority-ordered flavor.
   *
   * Scale shape: one hash-partitioned window per group (row_number over
   * (priority desc, id) within the group) — groups spread across the
   * cluster, no global sort, no driver state. Heavy skew (one group = the
   * corpus) degrades to that group's partition, the usual window caveat.
   */
  def topKPerGroup(
      df: DataFrame,
      idCol: String,
      groupCol: String,
      k: Int,
      priority: Column): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(!df.columns.contains("cap_rank"),
      "input already has a 'cap_rank' column; rename it — topKPerGroup " +
        "appends 'cap_rank'")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(priority.desc, col(idCol))
    df.withColumn("cap_rank", row_number().over(w))
      .filter(col("cap_rank") <= k)
  }

  /**
   * EXACT global top-`pct`% selection by an integer score WITHOUT sorting
   * the corpus: keep the ceil(pct·n/100) highest-scoring rows, ties at
   * the threshold broken by ascending id — "keep the best 20% by quality
   * score" as a deterministic, engine-replayable set.
   *
   * The naive spelling (`ORDER BY score DESC LIMIT k`, or a row_number
   * over an unpartitioned window) funnels the corpus through one
   * partition/the driver. This is the scale-correct two-phase shape:
   *
   *   1. histogram: `groupBy(score).count()` — one hash-aggregate shuffle;
   *      the table is DISTINCT-SCORE-sized, not corpus-sized (bounded by
   *      the score resolution, e.g. <= 1e6 rows for e6 fixed-point);
   *   2. running count down the histogram (descending score) via the
   *      scale-safe [[graft.operators.PrefixSum.runningSum]] — no
   *      single-partition window even when every score is distinct;
   *   3. threshold row (score T, #ties to keep m) = first histogram row
   *      whose running count reaches k — a bounded `limit(1)`;
   *   4. keep = one broadcast-filter scan (`score > T`), plus the first m
   *      ties by id order — ranked by a second prefix sum over the
   *      TIE SUBSET only (usually tiny; never the corpus).
   *
   * The corpus is scanned twice (count, then select) and never shuffled
   * by score beyond the histogram aggregation. `scoreCol` must be
   * integral (long-valued) — for float scores, fix the resolution first
   * (e.g. `floor(score * 1e6)`), which is also what makes the selection
   * engine-replayable. NULL scores are unrankable: such rows are excluded
   * from both the population count n and the keep set (document the
   * imputation and fill them upstream if they should compete). Output:
   * the input rows that survive, unchanged.
   */
  def selectTopFraction(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      pct: Int): DataFrame = {
    require(pct >= 1 && pct <= 100, s"pct must be in [1, 100], got $pct")
    require(isIntegral(df.schema(scoreCol).dataType),
      s"selectTopFraction needs an integral score column (the exact " +
        s"threshold walk is defined on longs); '$scoreCol' is " +
        s"${df.schema(scoreCol).dataType.simpleString} — a float cast " +
        s"would silently truncate distinct scores into ties. Scale to " +
        s"fixed point first (e.g. (score * 1e6).cast(\"long\")).")
    val score = col(scoreCol).cast("long")
    val ranked = df.filter(score.isNotNull)

    // 1. distinct-score histogram. The descending walk orders by the
    // BITWISE COMPLEMENT of the score: ~s = -s-1 is a strictly decreasing
    // bijection over the whole signed-64 range, where a plain negation
    // overflows at Long.MinValue (-MinValue wraps to MinValue and would
    // sort the lowest score first).
    val hist = ranked.groupBy(score.as("__s")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__neg", bitwise_not(col("__s")))

    // 2. running count from the highest score down
    val cum = graft.operators.PrefixSum.runningSum(hist, "__neg", "__cnt", "__cum")

    // 3. threshold: first row (walking scores downward) where the running
    // count reaches k = ceil(pct*n/100); m = how many ties at T to keep.
    // All joins below are against this ONE row.
    val nRow = cum.agg(max(col("__cum")).as("__n"))
    val tRow = cum.crossJoin(broadcast(nRow))
      .withColumn("__k", expr(s"($pct * __n + 99) DIV 100"))
      .filter(col("__cum") >= col("__k"))
      .orderBy(col("__s").desc)
      .limit(1)
      .select(col("__s").as("__t"),
        (col("__k") - (col("__cum") - col("__cnt"))).as("__m"))

    // 4. one scan: everything strictly above the threshold...
    val above = ranked.crossJoin(broadcast(tRow))
      .filter(score > col("__t"))
      .drop("__t", "__m")
    // ...plus the first m ties by id order (prefix sum over the tie
    // subset only — its size is the tie count, not the corpus)
    val ties = ranked.crossJoin(broadcast(tRow))
      .filter(score === col("__t"))
      .withColumn("__one", lit(1L))
    val tiesKept = graft.operators.PrefixSum
      .runningSum(ties, idCol, "__one", "__rank")
      .filter(col("__rank") <= col("__m"))
      .drop("__t", "__m", "__one", "__rank")

    above.unionByName(tiesKept)
  }

  /**
   * CCNet-style head/middle/tail corpus bucketing (arXiv:1911.00359 §4.4
   * splits by LM perplexity terciles): label every document `head`
   * (top `headPct`% by score), `middle` (next `middlePct`%), or `tail`
   * (the rest), with the EXACT [[selectTopFraction]] rule — k =
   * ceil(pct·n/100), ties by (score desc, id) — so bucket membership is
   * deterministic at any tie structure. Pass a score where HIGHER is
   * better (for perplexity/surprise, negate it). NULL scores land in
   * `tail`. The two keep sets nest by construction (same rule, larger
   * k), so the labels partition the corpus.
   *
   * Scale shape: ONE distinct-score histogram + ONE O(#partitions)
   * prefix sum serve BOTH thresholds (the r20 change — the composed
   * two-[[selectTopFraction]] spelling built each twice; the running
   * count's range-shuffle files are reused across the two threshold
   * reads, so the histogram is paid once). The corpus is never globally
   * sorted and never windowed; per-row bucketing compares against the
   * two broadcast 1-row thresholds, and only the TIE rows at each
   * threshold (tie-count-sized, not corpus-sized) pay an id-rank prefix
   * sum and a join back. Membership is EXACTLY the composed spelling's —
   * same ceil-k, same (score desc, id asc) tie rule, nested by
   * construction — CurationSpec pins equality on adversarial tie data.
   */
  def assignFractionBuckets(
      df: DataFrame,
      idCol: String,
      scoreCol: String,
      headPct: Int,
      middlePct: Int): DataFrame = {
    require(headPct >= 1 && middlePct >= 1 && headPct + middlePct <= 100,
      s"need headPct, middlePct >= 1 with sum <= 100; got $headPct + $middlePct")
    require(!df.columns.contains("bucket"),
      "input already has a 'bucket' column; rename it — " +
        "assignFractionBuckets appends it")
    require(isIntegral(df.schema(scoreCol).dataType),
      s"assignFractionBuckets needs an integral score column (the exact " +
        s"threshold walk is defined on longs); '$scoreCol' is " +
        s"${df.schema(scoreCol).dataType.simpleString} — scale to fixed " +
        "point first (e.g. (score * 1e6).cast(\"long\")).")
    Seq("__graft_th", "__graft_hm", "__graft_tm", "__graft_mm",
      "__graft_hid", "__graft_mid").foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a '$c' column; rename it — " +
          "assignFractionBuckets uses it internally")
    }
    val score = col(scoreCol).cast("long")
    val ranked = df.filter(score.isNotNull)
    // shared descending-walk running count (selectTopFraction's exact
    // spelling: bitwise_not is the overflow-safe descending bijection)
    val hist = ranked.groupBy(score.as("__s")).agg(count(lit(1)).as("__cnt"))
      .withColumn("__neg", bitwise_not(col("__s")))
    val cum = graft.operators.PrefixSum.runningSum(hist, "__neg", "__cnt", "__cum")
    val nRow = cum.agg(max(col("__cum")).as("__n"))
    // threshold row for pct: first histogram row (walking scores down)
    // whose running count reaches k = ceil(pct*n/100) — the max __s among
    // qualifying rows. Spelled as an AGGREGATE (not orderBy+limit) so an
    // empty ranked set yields ONE null-valued row: the crossJoin below
    // must not drop the NULL-score rows that still need 'tail'.
    def tRow(pct: Int, t: String, m: String): DataFrame = cum
      .crossJoin(broadcast(nRow))
      .withColumn("__k", expr(s"($pct * __n + 99) DIV 100"))
      .filter(col("__cum") >= col("__k"))
      .agg(max_by(struct(col("__s").as("t"),
        (col("__k") - (col("__cum") - col("__cnt"))).as("m")), col("__s")).as("r"))
      .select(col("r.t").as(t), col("r.m").as(m))
    val headT = tRow(headPct, "__graft_th", "__graft_hm")
    val hmT = tRow(headPct + middlePct, "__graft_tm", "__graft_mm")
    // kept ties at a threshold: the first m tie rows by id order — the
    // selectTopFraction tie prefix sum, over the tie subset only
    def keptTies(tT: DataFrame, t: String, m: String, out: String): DataFrame = {
      val ties = ranked.crossJoin(broadcast(tT))
        .filter(score === col(t)).withColumn("__one", lit(1L))
      graft.operators.PrefixSum.runningSum(ties, idCol, "__one", "__rank")
        .filter(col("__rank") <= col(m))
        .select(col(idCol).as(out))
    }
    val hTies = keptTies(headT, "__graft_th", "__graft_hm", "__graft_hid")
    val mTies = keptTies(hmT, "__graft_tm", "__graft_mm", "__graft_mid")
    df.crossJoin(broadcast(headT)).crossJoin(broadcast(hmT))
      .join(hTies, col(idCol) === col("__graft_hid"), "left")
      .join(mTies, col(idCol) === col("__graft_mid"), "left")
      .withColumn("bucket",
        when(score > col("__graft_th") || col("__graft_hid").isNotNull,
          lit("head"))
          .when(score > col("__graft_tm") || col("__graft_mid").isNotNull,
            lit("middle"))
          .otherwise(lit("tail")))
      .drop("__graft_th", "__graft_hm", "__graft_tm", "__graft_mm",
        "__graft_hid", "__graft_mid")
  }

  /**
   * EXACT nearest-rank percentiles of an integer column with NO global
   * sort — the datasheet numbers (doc-length p50/p90/p99, tokens per
   * doc, scores) computed the way [[selectTopFraction]] computes its
   * threshold: percentile p is the smallest value v such that at least
   * `ceil(p * n / 100)` rows have value <= v (the standard nearest-rank
   * method; exact integer arithmetic, deterministic under ties, so the
   * DuckDB oracle replays it row for row — interpolating quantile
   * sketches cannot be hash-compared and a global ORDER BY costs a
   * corpus-wide range shuffle).
   *
   * Output: (pct, value, target_rank, total_rows), one row per requested
   * percentile, NULL-valued rows excluded from both n and the ranking.
   *
   * Scale shape: one distinct-VALUE histogram (the only corpus-sized
   * shuffle; its size is the value cardinality, not the row count), the
   * two-pass [[graft.operators.PrefixSum]] running count over it, then a
   * broadcast of the |pcts|-row target table into a non-equi join —
   * each histogram row checks a handful of targets, a linear scan, and
   * the final agg is |pcts| groups.
   */
  def exactPercentiles(
      df: DataFrame,
      valueCol: String,
      pcts: Seq[Int]): DataFrame = {
    require(pcts.nonEmpty, "pcts must be non-empty")
    require(pcts.forall(p => p >= 1 && p <= 100),
      s"percentiles must be in [1, 100], got $pcts")
    require(pcts.distinct.size == pcts.size, s"duplicate percentiles in $pcts")
    require(isIntegral(df.schema(valueCol).dataType),
      s"'$valueCol' must be an integral type (byte/short/int/long): the " +
        s"exact rank walk would truncate a float, got " +
        df.schema(valueCol).dataType.sql)

    val spark = df.sparkSession
    import spark.implicits._
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("long").as("__graft_v"))
      .agg(count(lit(1)).as("__graft_c"))
    val run = graft.operators.PrefixSum
      .runningSum(hist, "__graft_v", "__graft_c", outCol = "__graft_run")
    val targets = pcts.sorted.toDF("pct")
      .crossJoin(broadcast(hist.agg(sum(col("__graft_c")).as("__graft_n"))))
      .select(col("pct").cast("long").as("pct"),
        expr("(pct * __graft_n + 99L) DIV 100L").as("target_rank"),
        col("__graft_n").as("total_rows"))
    run
      .join(broadcast(targets), col("__graft_run") >= col("target_rank"))
      .groupBy(col("pct"), col("target_rank"), col("total_rows"))
      .agg(min(col("__graft_v")).as("value"))
      .select(col("pct"), col("value"), col("target_rank"), col("total_rows"))
  }
}
