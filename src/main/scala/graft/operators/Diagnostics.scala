package graft.operators

import graft.TopnFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Plan-tuning diagnostics built on the flagship sketch — the
 * measurements an operator consults before choosing the skew knobs this
 * library exposes (`Rollups.saltedTopnAdd`'s salt buckets, AQE skew-join
 * thresholds, `Selection.topKPerGroup` caps).
 */
object Diagnostics {

  /**
   * Key-skew profile of a would-be shuffle key: the top-`k` heaviest key
   * values with exact-below-eviction frequencies and their corpus share
   * in exact ppm — ONE pass, state bounded at `counters` entries no
   * matter the key cardinality (the reference operator doing the
   * diagnostic job it was built for: a `groupBy(key).count().orderBy`
   * profile of a 100 TB table shuffles the corpus to learn what the
   * sketch learns map-side).
   *
   * Output: (key, freq, share_e6, total_rows), pinned (freq desc, key
   * asc) order. `share_e6 = freq * 1e6 DIV total_rows` — exact integer
   * arithmetic, so the row is hash-stable cross-engine. Reading it:
   * share_e6 of the top key ~ 1e6/P (P = shuffle partitions) means one
   * reducer owns that key's whole mass — salt it or raise AQE's
   * skew-join factor; many near-equal small shares mean the key is fine.
   *
   * NULL keys count into `total_rows` but not into the sketch (the
   * reference's NULL-skip contract) — a heavily-NULL key column is its
   * own finding: the shares visibly fail to add up.
   */
  def keySkewReport(
      df: DataFrame,
      keyCol: String,
      k: Int = 20,
      counters: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // fail at build time in THIS operator's vocabulary — otherwise k >
    // counters only surfaces at action time as GRAFT_K_EXCEEDS_COUNTERS,
    // framed in sketch terms the profiler's caller never wrote
    require(k <= counters,
      s"keySkewReport: k ($k) must be <= counters ($counters) — the report " +
        "can only surface keys the sketch retains")
    df.agg(
        TopnFunctions.topn_add_agg(col(keyCol).cast("string"), counters).as("__sk"),
        count(lit(1)).as("__n"))
      .select(explode(TopnFunctions.topn(col("__sk"), lit(k))).as("__r"),
        col("__n"))
      .select(col("__r.item").as("key"),
        col("__r.frequency").as("freq"),
        // DECIMAL(38) intermediate: freq * 1e6 wraps BIGINT once a key
        // holds > ~9.2e12 rows — inside the 100 TB scale this profiles —
        // and a wrapped share on exactly the hot key defeats the tool
        expr("CAST(CAST(__r.frequency AS DECIMAL(38,0)) * 1000000 DIV __n AS BIGINT)")
          .as("share_e6"),
        col("__n").as("total_rows"))
  }

  /**
   * Burst detection: per-key event-rate anomalies — the periods where a
   * key's event count spikes more than `k` standard deviations above
   * its OWN baseline (crawl-host burst, log-spike, abuse-rate shapes).
   * A key's baseline spans every period between its first and last
   * activity INCLUSIVE — silent periods count as zeros (a host active
   * once a month is not "average 100/period" because it was only
   * observed once) — without ever materializing zero rows.
   *
   * All arithmetic is EXACT INTEGER moments — no float mean/stddev, so
   * the report is hash-stable cross-engine and unaffected by
   * distributed summation order. The spike test cross-multiplies the
   * z-score out of division entirely:
   * {{{
   *   (n*c - s)^2 > k^2 * (n*ssq - s^2)   and   n*c > s
   * }}}
   * (n = span periods, c = the period's count, s = total events,
   * ssq = sum of squared period counts; all in DECIMAL(38,0) — the
   * squares wrap BIGINT at ~3e9 events per key, far below real hot-key
   * mass). Single-period keys have zero variance and can never flag.
   *
   * Output: one row per flagged (key, period) —
   * `(keyCols..., period_start_us, n_events, span_periods,
   * total_events)`, exact integers throughout.
   *
   * Scale shape: ONE groupBy (key, period) collapses the corpus, one
   * groupBy (key) over period rows (bounded by |keys| x timeline) for
   * the moments, one keyed equi join back — no window over the corpus,
   * no driver state, hot keys cost their period count, not their event
   * count.
   */
  def rateAnomalies(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      periodSeconds: Long,
      k: Int = 3): DataFrame = {
    require(keyCols.nonEmpty, "rateAnomalies: keyCols must be non-empty")
    require(periodSeconds > 0,
      s"rateAnomalies: periodSeconds must be positive, got $periodSeconds")
    require(k >= 1, s"rateAnomalies: k must be >= 1, got $k")
    keyCols.find(c => c.startsWith("__graft_") ||
        Seq("period_start_us", "n_events", "span_periods", "total_events")
          .contains(c)).foreach { c =>
      throw new IllegalArgumentException(
        s"rateAnomalies: key column '$c' collides with an internal or " +
          "output column; rename it")
    }
    val keyC = keyCols.map(col)
    val perPeriod = events
      .select((keyC :+
        Sessions.periodIndex(events, tsCol, periodSeconds).as("__graft_p")): _*)
      .groupBy((keyC :+ col("__graft_p")): _*)
      .agg(count(lit(1)).as("__graft_c"))
    anomaliesFromCounts(perPeriod, keyCols, periodSeconds, k)
  }

  /** [[rateAnomalies]]' moments + spike test over already-aggregated
    * per-period counts (columns `keyCols..., __graft_p, __graft_c`) —
    * shared with the streaming maintainer's committed-store reader. */
  private[graft] def anomaliesFromCounts(
      perPeriod: DataFrame,
      keyCols: Seq[String],
      periodSeconds: Long,
      k: Int): DataFrame = {
    val keyC = keyCols.map(col)
    val pus = periodSeconds * 1000000L
    val moments = perPeriod
      .groupBy(keyC: _*)
      .agg(
        (max(col("__graft_p")) - min(col("__graft_p")) + 1L).as("__graft_n"),
        sum(col("__graft_c")).as("__graft_s"),
        sum(col("__graft_c") * col("__graft_c")).as("__graft_ssq"))
    val d = "CAST(%s AS DECIMAL(38,0))"
    val nD = d.format("__graft_n")
    val cD = d.format("__graft_c")
    val sD = d.format("__graft_s")
    val qD = d.format("__graft_ssq")
    perPeriod.join(moments, keyCols)
      .filter(expr(
        s"($nD * $cD - $sD) > 0 AND " +
          s"($nD * $cD - $sD) * ($nD * $cD - $sD) > " +
          s"${k.toLong * k} * ($nD * $qD - $sD * $sD)"))
      .select((keyC :+
        (col("__graft_p") * pus).as("period_start_us") :+
        col("__graft_c").as("n_events") :+
        col("__graft_n").as("span_periods") :+
        col("__graft_s").as("total_events")): _*)
  }
}
