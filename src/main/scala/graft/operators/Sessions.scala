package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampNTZType

/**
 * Gap-based sessionization of an event stream: group each key's events
 * into sessions separated by more than `gapSeconds` of inactivity — the
 * standard shape behind per-user activity analysis, crawl-politeness
 * windows, and interaction-trace segmentation for agent training data.
 *
 * Scale shape: ONE shuffle by key, one per-key ordered window pass
 * (`lag` for the gap test, a running sum for the session ordinal) — a
 * key's partition holds that key's events only, so parallelism is key
 * cardinality, never corpus size, and there is no global window cliff.
 * A single pathologically hot key serializes its own history into one
 * task — the irreducible cost of any per-entity ordered rebuild; profile
 * with [[Diagnostics.keySkewReport]] before keying on a low-cardinality
 * column. [[stats]]' follow-up aggregation groups by (key, session), a
 * superset of the window's partitioning key, so its reshuffle stays
 * balanced wherever the window was.
 *
 * Determinism: rows are ordered by (ts, `orderCols`...) within a key —
 * pass a unique tie-break (an event id) whenever timestamps can collide,
 * or the gap test and the session ordinal both inherit an unspecified
 * tie order.
 */
object Sessions {

  /** Microseconds per second — gap arithmetic is exact integer micros,
    * matching parquet's timestamp precision. */
  private val MicrosPerSecond = 1000000L

  /** Epoch micros for either timestamp flavor: parquet files written
    * without isAdjustedToUTC read back as TIMESTAMP_NTZ, which
    * `unix_micros` rejects — interpret NTZ wall time in the session time
    * zone (value-preserving under the UTC sessions this library runs). */
  private[graft] def tsMicros(df: DataFrame, tsCol: String): Column =
    df.schema(tsCol).dataType match {
      case TimestampNTZType => unix_micros(col(tsCol).cast("timestamp"))
      case _                => unix_micros(col(tsCol))
    }

  /**
   * Assign session ordinals: the input plus
   *
   *  - `session_seq` — 1-based ordinal of the session within its key
   *    (a new session starts when the gap SINCE THE PREVIOUS EVENT
   *    exceeds `gapSeconds`, strictly);
   *  - `is_session_start` — true on each session's first event.
   *
   * `tsCol` must be timestamp-typed (micros precision); `keyCols` rows
   * with NULL keys group together like any Spark window partition.
   */
  def assign(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      gapSeconds: Long,
      orderCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty, "assign: keyCols must be non-empty")
    require(gapSeconds > 0, s"assign: gapSeconds must be positive, got $gapSeconds")
    Seq("__graft_tu", "__graft_prev", "session_seq", "is_session_start")
      .foreach { c =>
        require(!events.columns.contains(c),
          s"input already has a '$c' column; rename it — Sessions.assign " +
            "emits/uses it")
      }
    val ord = (col("__graft_tu") +: orderCols.map(col)).map(_.asc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(ord: _*)
    events
      .withColumn("__graft_tu", tsMicros(events, tsCol))
      .withColumn("__graft_prev", lag(col("__graft_tu"), 1).over(w))
      .withColumn("is_session_start",
        col("__graft_prev").isNull ||
          col("__graft_tu") - col("__graft_prev") > gapSeconds * MicrosPerSecond)
      .withColumn("session_seq",
        sum(when(col("is_session_start"), 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__graft_tu", "__graft_prev")
  }

  /**
   * Per-session rollup over [[assign]]: one row per (key..., session)
   * with `session_seq`, `session_start`, `session_end`, `n_events`,
   * `duration_us` (exact integer micros), and — when `valueCol` is set —
   * `value_sum` (the column's Spark SUM; pre-cast to DECIMAL for an
   * exact, order-independent total).
   */
  def stats(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      gapSeconds: Long,
      valueCol: Option[String] = None,
      orderCols: Seq[String] = Nil): DataFrame = {
    val assigned = assign(events, keyCols, tsCol, gapSeconds, orderCols)
    val tu = tsMicros(events, tsCol)
    val base = Seq(
      min(col(tsCol)).as("session_start"),
      max(col(tsCol)).as("session_end"),
      count(lit(1)).as("n_events"),
      (max(tu) - min(tu)).as("duration_us"))
    val aggs = base ++ valueCol.map(c => sum(col(c)).as("value_sum"))
    assigned
      .groupBy((keyCols.map(col) :+ col("session_seq")): _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Ordered-step funnel: how many keys reach each step of `steps` IN
   * ORDER — step i+1 counts only when it happens STRICTLY after the
   * key's earliest in-order completion of step i (the classic
   * conversion-funnel semantics; events at the exact same timestamp do
   * not advance the funnel). Output: one row per step,
   * `(step_idx, step, n_keys)`, `step_idx` 0-based in `steps` order.
   *
   * Scale shape: the earliest-completion times build by ITERATED
   * CONDITIONAL MIN — one key-equi join + hash agg per step, funnel
   * length many (a handful), each keyed on the funnel key. No window
   * over the corpus, no per-key event-list materialization: a key with
   * a billion events costs the same per-step hash-agg pass as any
   * other. The final count is a single one-row aggregate.
   */
  def funnelCounts(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      stepCol: String,
      steps: Seq[String]): DataFrame = {
    countsFromTimes(
      stepTimes(events, keyCols, tsCol, stepCol, steps, "funnelCounts"), steps)
  }

  /** [[funnelCounts]]' reporting tail over a per-key step-time table
    * (columns `__graft_t0 .. __graft_tN`) — shared with the streaming
    * maintainer's committed-state reader. */
  private[graft] def countsFromTimes(
      times: DataFrame, steps: Seq[String]): DataFrame = {
    val counts = times.agg(
      count(col("__graft_t0")).as("__graft_c0"),
      steps.indices.tail.map(i =>
        count(col(s"__graft_t$i")).as(s"__graft_c$i")): _*)
    counts
      .select(posexplode(array(steps.indices.map(i =>
        col(s"__graft_c$i")): _*)).as(Seq("step_idx", "n_keys")))
      .select(col("step_idx").cast("long").as("step_idx"),
        element_at(
          array(steps.map(lit): _*), col("step_idx").cast("int") + 1)
          .as("step"),
        col("n_keys"))
  }

  /** The funnel's per-key earliest in-order completion times: one row
    * per key that reached step 0, columns `keyCols... , __graft_t0 ..
    * __graft_tN` (epoch micros; `__graft_ti` NULL where the key never
    * advanced past step i-1). Built by iterated conditional min — one
    * key-equi join + hash agg per step, never a corpus-wide window. */
  private def stepTimes(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      stepCol: String,
      steps: Seq[String],
      op: String): DataFrame = {
    require(keyCols.nonEmpty, s"$op: keyCols must be non-empty")
    require(steps.nonEmpty, s"$op: steps must be non-empty")
    require(steps.distinct.size == steps.size,
      s"$op: steps must be distinct, got $steps")
    keyCols.find(c => c == "__graft_step" || c == "__graft_tu" ||
        c.matches("__graft_t\\d+")).foreach { c =>
      throw new IllegalArgumentException(
        s"$op: key column '$c' collides with an internal column; rename it")
    }
    val keyC = keyCols.map(col)
    val e = events.select(
      (keyC :+ col(stepCol).as("__graft_step") :+
        tsMicros(events, tsCol).as("__graft_tu")): _*)
    val base = e.filter(col("__graft_step") === steps.head)
      .groupBy(keyC: _*).agg(min(col("__graft_tu")).as("__graft_t0"))
    steps.zipWithIndex.tail.foldLeft(base) { case (acc, (s, i)) =>
      val nxt = e.filter(col("__graft_step") === s)
        .join(acc.select((keyC :+ col(s"__graft_t${i - 1}")): _*), keyCols)
        .filter(col("__graft_tu") > col(s"__graft_t${i - 1}"))
        .groupBy(keyC: _*).agg(min(col("__graft_tu")).as(s"__graft_t$i"))
      acc.join(nxt, keyCols, "left")
    }
  }

  /**
   * Per-transition funnel latency: for each adjacent step pair of the
   * same ordered funnel as [[funnelCounts]], how many keys converted
   * and how long conversion took — exact integer micros between the
   * key's earliest in-order completions of the two steps. Output: one
   * row per transition, `(step_idx, step_from, step_to, n_converted,
   * min_latency_us, avg_latency_us, max_latency_us)` with `step_idx`
   * the 1-based index of the DESTINATION step and `avg_latency_us` the
   * floored integer mean (`sum DIV count`; all three latency columns
   * NULL when nothing converted).
   *
   * Scale shape: [[funnelCounts]]'s iterated-conditional-min chain
   * produces one row per step-0 key; every transition's count/min/sum/
   * max then folds in a SINGLE one-row aggregate pass over that table
   * (not one pass per transition). Exact integer arithmetic throughout
   * — the sum is exact in BIGINT up to ~9.2e18 total micros.
   */
  def funnelTransitions(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      stepCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.size >= 2,
      s"funnelTransitions: need at least 2 steps, got $steps")
    val full = stepTimes(events, keyCols, tsCol, stepCol, steps,
      "funnelTransitions")
    val lat = steps.indices.tail.map(i =>
      (col(s"__graft_t$i") - col(s"__graft_t${i - 1}")).as(s"__graft_l$i"))
    val aggs = steps.indices.tail.flatMap { i =>
      val l = col(s"__graft_l$i")
      Seq(count(l).as(s"__graft_n$i"), min(l).as(s"__graft_min$i"),
        sum(l).as(s"__graft_sum$i"), max(l).as(s"__graft_max$i"))
    }
    full.select(lat: _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(posexplode(array(steps.indices.tail.map(i =>
          struct(col(s"__graft_n$i").as("count"),
            col(s"__graft_min$i").as("mn"),
            col(s"__graft_sum$i").as("sm"),
            col(s"__graft_max$i").as("mx"))): _*))
        .as(Seq("__graft_pos", "__graft_s")))
      .select(
        (col("__graft_pos") + 1).cast("long").as("step_idx"),
        element_at(array(steps.dropRight(1).map(lit): _*),
          col("__graft_pos").cast("int") + 1).as("step_from"),
        element_at(array(steps.tail.map(lit): _*),
          col("__graft_pos").cast("int") + 1).as("step_to"),
        col("__graft_s.count").as("n_converted"),
        col("__graft_s.mn").as("min_latency_us"),
        when(col("__graft_s.count") > 0,
          expr("__graft_s.sm DIV __graft_s.count")).as("avg_latency_us"),
        col("__graft_s.mx").as("max_latency_us"))
  }

  /**
   * WINDOWED funnel: how many keys complete the first `i` steps IN
   * ORDER with every later step inside `windowSeconds` of the SAME
   * step-0 event (the deadline runs from the chain's first step — the
   * classic "converted within 24h of first visit" semantics). Output
   * matches [[funnelCounts]]: one row per step, `(step_idx, step,
   * n_keys)`, where a key counts at step i if ANY of its step-0 events
   * starts a chain reaching step i before its deadline.
   *
   * Exactness: with the deadline fixed by the chain's FIRST event,
   * greedy earliest-successor chaining is optimal (any chain's step-i
   * time is an upper bound for greedy's, and both face the same
   * deadline — the exchange argument; NOTE this would be FALSE for
   * per-hop windows, where taking a later predecessor can extend a
   * later deadline).
   *
   * Scale shape: one row per STEP-0 EVENT (not per event), then
   * `steps.size - 1` [[AsofJoin.earliestFollowing]] passes — each a
   * single per-key window shuffle, no range join, no pair explosion;
   * dead chains are set aside before each hop so the window never
   * sorts NULL timestamps. Right sides are deduplicated to (key, ts)
   * per the as-of uniqueness contract.
   */
  def funnelWindowedCounts(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      stepCol: String,
      steps: Seq[String],
      windowSeconds: Long): DataFrame = {
    require(keyCols.nonEmpty, "funnelWindowedCounts: keyCols must be non-empty")
    require(steps.size >= 2,
      s"funnelWindowedCounts: need at least 2 steps, got $steps")
    require(steps.distinct.size == steps.size,
      s"funnelWindowedCounts: steps must be distinct, got $steps")
    require(windowSeconds > 0,
      s"funnelWindowedCounts: windowSeconds must be positive, got $windowSeconds")
    keyCols.find(_.startsWith("__graft_")).foreach { c =>
      throw new IllegalArgumentException(
        s"funnelWindowedCounts: key column '$c' collides with an internal " +
          "column; rename it")
    }
    val keyC = keyCols.map(col)
    def stepRows(s: String, tsName: String) = events
      .filter(col(stepCol) === s)
      .select((keyC :+ col(tsCol).as(tsName)): _*)
      .distinct()
    // one row per step-0 event; the deadline rides along in micros
    val base = stepRows(steps.head, "__graft_wt0")
      .withColumn("__graft_dl",
        unixLike(col("__graft_wt0")) + windowSeconds * MicrosPerSecond)
    val chained = steps.zipWithIndex.tail.foldLeft(base) { case (acc, (s, i)) =>
      val alive = acc.filter(col(s"__graft_wt${i - 1}").isNotNull)
      val dead = acc.filter(col(s"__graft_wt${i - 1}").isNull)
        .withColumn(s"__graft_wt$i",
          lit(null).cast(acc.schema(s"__graft_wt${i - 1}").dataType))
      val hopped = AsofJoin.earliestFollowing(
          alive, stepRows(s, s"__graft_rt$i"), keyCols,
          s"__graft_wt${i - 1}", s"__graft_rt$i", Seq(s"__graft_rt$i"),
          strict = true)
        .withColumn(s"__graft_wt$i",
          when(unixLike(col(s"__graft_rt$i")) <= col("__graft_dl"),
            col(s"__graft_rt$i")))
        .drop(s"__graft_rt$i")
      hopped.unionByName(dead)
    }
    val counts = chained.agg(
      count_distinct(when(col("__graft_wt0").isNotNull,
        struct(keyC: _*))).as("__graft_c0"),
      steps.indices.tail.map(i =>
        count_distinct(when(col(s"__graft_wt$i").isNotNull,
          struct(keyC: _*))).as(s"__graft_c$i")): _*)
    counts
      .select(posexplode(array(steps.indices.map(i =>
        col(s"__graft_c$i")): _*)).as(Seq("step_idx", "n_keys")))
      .select(col("step_idx").cast("long").as("step_idx"),
        element_at(
          array(steps.map(lit): _*), col("step_idx").cast("int") + 1)
          .as("step"),
        col("n_keys"))
  }

  /** Epoch micros of a timestamp column value (either flavor), usable
    * on derived columns where [[tsMicros]]' schema lookup cannot see
    * the type: NTZ values cast to TIMESTAMP interpret wall time in the
    * session zone — the same convention as [[tsMicros]]. */
  private def unixLike(c: Column): Column = unix_micros(c.cast("timestamp"))

  /**
   * Engagement stickiness (the DAU/MAU family): per `periodDays`-day
   * epoch-aligned period, the distinct active keys, the total active
   * key-days, and `stickiness_e6` = average-daily-actives / period
   * actives in exact parts-per-million —
   * `active_key_days * 1e6 DIV (periodDays * n_active_keys)`. A key
   * active every day of the period contributes 1e6/n of weight; a
   * corpus of one-day drive-bys scores near 1e6/periodDays.
   *
   * All integer arithmetic (counts and one exact DIV) — hash-stable
   * cross-engine. Scale shape: ONE distinct over (key, day) collapses
   * the corpus, then a single hash agg per period; `count_distinct` at
   * period granularity expands only the already-collapsed day pairs.
   */
  def stickiness(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      periodDays: Int = 28,
      daySeconds: Long = 86400L): DataFrame = {
    require(keyCols.nonEmpty, "stickiness: keyCols must be non-empty")
    require(periodDays >= 1, s"stickiness: periodDays must be >= 1, got $periodDays")
    require(daySeconds > 0, s"stickiness: daySeconds must be positive, got $daySeconds")
    keyCols.find(c => c.startsWith("__graft_") ||
        Seq("period_start_us", "n_active_keys", "active_key_days",
          "stickiness_e6").contains(c)).foreach { c =>
      throw new IllegalArgumentException(
        s"stickiness: key column '$c' collides with an internal or output " +
          "column; rename it")
    }
    val keyC = keyCols.map(col)
    val pus = daySeconds * MicrosPerSecond * periodDays
    val days = events
      .select((keyC :+ periodIndex(events, tsCol, daySeconds)
        .as("__graft_day")): _*)
      .distinct()
      // floor of day/periodDays for either sign, same convention as
      // periodIndex
      .withColumn("__graft_per",
        expr(s"(__graft_day - pmod(__graft_day, $periodDays)) DIV $periodDays"))
    days
      .groupBy((col("__graft_per") * pus).as("period_start_us"))
      .agg(
        count_distinct(struct(keyC: _*)).as("n_active_keys"),
        count(lit(1)).as("active_key_days"))
      .select(col("period_start_us"), col("n_active_keys"),
        col("active_key_days"),
        expr(s"active_key_days * 1000000L DIV " +
          s"(${periodDays}L * n_active_keys)").as("stickiness_e6"))
  }

  /**
   * Cohort retention: bucket each key by the epoch-aligned period of
   * its FIRST activity (`periodSeconds`-wide periods counted from the
   * unix epoch — convention-free, unlike week-start-sensitive
   * `date_trunc`), then count how many of that cohort's keys were
   * active in each later period. Output: one row per observed
   * `(cohort, offset)`, `(cohort_start_us, period_offset, n_keys)` —
   * `cohort_start_us` the cohort period's start in epoch micros,
   * `period_offset` in whole periods (0 = the cohort period itself,
   * where every key is active by construction).
   *
   * Scale shape: distinct-(key, period) first — the corpus collapses
   * to at most |keys| x |periods in the timeline| rows before anything
   * else touches it — then ONE per-key window min for the cohort and a
   * hash agg; a key's window partition holds only its active periods
   * (bounded by timeline length, never event count). Counting rows of
   * the distinct pairs IS the exact distinct-key count — no
   * count_distinct shuffle. Floor-division via `pmod` so pre-epoch
   * timestamps land in the right period.
   */
  def retentionCohorts(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      periodSeconds: Long): DataFrame = {
    require(keyCols.nonEmpty, "retentionCohorts: keyCols must be non-empty")
    require(periodSeconds > 0,
      s"retentionCohorts: periodSeconds must be positive, got $periodSeconds")
    require(!keyCols.contains("period_idx") && !keyCols.contains("__graft_c"),
      "retentionCohorts: key columns 'period_idx'/'__graft_c' collide with " +
        "internal columns; rename them")
    val keyC = keyCols.map(col)
    val pairs = events
      .select((keyC :+
        periodIndex(events, tsCol, periodSeconds).as("period_idx")): _*)
      .distinct()
    cohortsFromPairs(pairs, keyCols, periodSeconds)
  }

  /** Epoch-aligned period ordinal of `tsCol`. The pmod-floor keeps
    * pre-epoch values in period -1, not 0 (truncation-toward-zero would
    * fold them into period 0); the division runs in DECIMAL, never
    * double (double `/` rounds epoch micros past 2^53) — the numerator
    * is an exact multiple of the period, so the decimal quotient is the
    * exact integer for every representable timestamp. */
  private[graft] def periodIndex(
      df: DataFrame, tsCol: String, periodSeconds: Long): Column = {
    val pus = periodSeconds * MicrosPerSecond
    val tu = tsMicros(df, tsCol)
    ((tu - pmod(tu, lit(pus))).cast("decimal(25,0)") /
      lit(pus).cast("decimal(25,0)")).cast("long")
  }

  /** The cohort report over already-distinct `(keyCols..., period_idx)`
    * pairs — [[retentionCohorts]]' second half, shared with the
    * streaming maintainer's committed-store reader. */
  private[graft] def cohortsFromPairs(
      pairs: DataFrame,
      keyCols: Seq[String],
      periodSeconds: Long): DataFrame = {
    val pus = periodSeconds * MicrosPerSecond
    val w = Window.partitionBy(keyCols.map(col): _*)
    pairs
      .withColumn("__graft_c", min(col("period_idx")).over(w))
      .groupBy((col("__graft_c") * pus).as("cohort_start_us"),
        (col("period_idx") - col("__graft_c")).as("period_offset"))
      .agg(count(lit(1)).as("n_keys"))
  }

  /**
   * Consecutive step paths within sessions: sessionize with [[assign]],
   * then emit every run of `pathLen` consecutive `stepCol` values
   * inside a session as one `path` string (values joined by `>`), one
   * row per window position — the feed for "what do users DO" top-path
   * reporting (`topn_add_agg(path)` over the result keeps the report
   * one bounded sketch regardless of corpus size). Output: the key
   * columns plus `session_seq` and `path`.
   *
   * Scale shape: [[assign]]'s one shuffle by key, then `pathLen - 1`
   * `lead`s over the SAME per-key window (one window pass, no second
   * shuffle — (key, session_seq) ordering is a refinement of the
   * key partitioning). Sessions shorter than `pathLen` emit nothing.
   */
  def sessionPaths(
      events: DataFrame,
      keyCols: Seq[String],
      tsCol: String,
      stepCol: String,
      gapSeconds: Long,
      pathLen: Int,
      orderCols: Seq[String] = Nil): DataFrame = {
    require(pathLen >= 2, s"sessionPaths: pathLen must be >= 2, got $pathLen")
    require(!events.columns.contains("path"),
      "input already has a 'path' column; rename it — sessionPaths emits it")
    require(!events.columns.contains("__graft_full"),
      "input already has a '__graft_full' column; rename it — sessionPaths " +
        "uses it internally")
    val assigned = assign(events, keyCols, tsCol, gapSeconds, orderCols)
    val ord = (tsMicros(events, tsCol) +: orderCols.map(col)).map(_.asc)
    val w = Window
      .partitionBy((keyCols.map(col) :+ col("session_seq")): _*)
      .orderBy(ord: _*)
    val parts = col(stepCol) +: (1 until pathLen).map(i =>
      lead(col(stepCol), i).over(w))
    // path and the tail test come from the SAME projection — a filter
    // between two projections that each mention lead(...) would make
    // Spark re-evaluate the second window over the already-filtered
    // rows, shifting every lead. EVERY position must be non-null, not
    // just the tail: concat_ws skips NULLs, so a NULL stepCol mid-window
    // would otherwise emit a silently shortened path ("A>C" for A,∅,C)
    // where the SQL spelling s0||'>'||s1||'>'||s2 yields NULL and drops
    // the row
    assigned
      .select((keyCols.map(col) :+ col("session_seq") :+
        concat_ws(">", parts: _*).as("path") :+
        parts.map(_.isNotNull).reduce(_ && _).as("__graft_full")): _*)
      .filter(col("__graft_full"))
      .drop("__graft_full")
  }
}
