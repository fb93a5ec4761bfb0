package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * As-of join — enrich every left row with the LATEST right row at or
 * before its timestamp, matched on equal keys: "which state/snapshot was
 * in force when this observation happened". The classic temporal-join
 * primitive a training-data pipeline needs to stamp examples with the
 * config, model version, or crawl snapshot that produced them, and the
 * standard funnel question over an events stream (which `view` preceded
 * this `click`).
 *
 * Spark has no native ASOF JOIN; the naive spellings are a range join
 * (`l.ts >= r.ts` inequality -> BroadcastNestedLoopJoin, O(L x R) pairs
 * per key before the per-row argmax) or a per-left-row MAX subquery
 * (self join + second shuffle). This is the UNION-TRICK spelling
 * instead: tag both sides, union them, and run ONE per-key window
 * ordered by (ts, side) that carries `last(right payload, ignoreNulls)`
 * forward — every left row picks up the most recent preceding right row
 * in a single shuffle with NO join and no pair explosion at any key
 * cardinality. At 100 TB this is the difference between a linear pass
 * and a quadratic one: the window partition for a key holds that key's
 * rows only, sorted once, streamed once.
 *
 * Semantics are pinned by the side flag's sort position at EQUAL
 * timestamps: inclusive (default) sorts right rows first, so a right row
 * stamped at exactly `t` applies to a left row at `t`; `strict = true`
 * sorts them after, so only strictly earlier right rows match. Rows with
 * no preceding match keep NULL payload columns (LEFT OUTER semantics).
 *
 * Determinism contract: `right` must be unique per (keys, ts) — two
 * right rows on the same key and timestamp have no defined "latest", and
 * the window's tie order is not stable. Pre-aggregate the right side
 * (e.g. `groupBy(key, ts).agg(max_by(...))`) when the source can
 * collide; the `asof_latest_view` driver query does exactly that.
 */
object AsofJoin {

  /**
   * For every `left` row, the most recent `right` row with equal
   * `keyCols` and `rightTsCol` <= (inclusive) / < (`strict`) the left
   * row's `leftTsCol`, its `payloadCols` appended to the left row (NULL
   * when no match). Timestamp columns must be mutually comparable
   * (same type on both sides); payload names must not collide with left
   * columns — rename on the right side first.
   *
   * `maxGapSeconds` bounds the match's age — the ATTRIBUTION-WINDOW
   * variant ("credit this purchase to a click within the last hour"): a
   * preceding right row older than the bound yields NULL payloads,
   * exactly as if it did not exist. The bound is applied AFTER the same
   * single window pass (the carried payload remembers its own
   * timestamp), so the plan shape is unchanged — never a range join.
   */
  def latestPreceding(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      payloadCols: Seq[String],
      strict: Boolean = false,
      maxGapSeconds: Option[Long] = None): DataFrame =
    directional(left, right, keyCols, leftTsCol, rightTsCol, payloadCols,
      strict, maxGapSeconds, forward = false, op = "latestPreceding")

  /**
   * The FORWARD mirror of [[latestPreceding]]: for every `left` row,
   * the EARLIEST `right` row with equal `keyCols` and `rightTsCol` >=
   * (inclusive) / > (`strict`) the left row's `leftTsCol` — "the next
   * purchase after this signup", "the first error after this deploy".
   * Same single-shuffle union-trick plan (the per-key window simply
   * looks forward), same LEFT OUTER NULL semantics, same right-side
   * uniqueness contract, and `maxGapSeconds` bounds how far AHEAD the
   * match may be (a later right row beyond the bound yields NULL
   * payloads, exactly as if it did not exist).
   */
  def earliestFollowing(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      payloadCols: Seq[String],
      strict: Boolean = false,
      maxGapSeconds: Option[Long] = None): DataFrame =
    directional(left, right, keyCols, leftTsCol, rightTsCol, payloadCols,
      strict, maxGapSeconds, forward = true, op = "earliestFollowing")

  private def directional(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      payloadCols: Seq[String],
      strict: Boolean,
      maxGapSeconds: Option[Long],
      forward: Boolean,
      op: String): DataFrame = {
    maxGapSeconds.foreach(g => require(g >= 0,
      s"$op: maxGapSeconds must be >= 0, got $g"))
    require(keyCols.nonEmpty, s"$op: keyCols must be non-empty")
    require(payloadCols.nonEmpty,
      s"$op: payloadCols must be non-empty — an as-of join " +
        "with no payload is a filter, not a join")
    payloadCols.foreach(c => require(!left.columns.contains(c),
      s"$op: payload column '$c' collides with a left " +
        "column; rename it on the right side first"))
    keyCols.foreach { c =>
      require(left.columns.contains(c), s"left side lacks key column '$c'")
      require(right.columns.contains(c), s"right side lacks key column '$c'")
    }
    Seq("__graft_ts", "__graft_side", "__graft_pay", "__graft_row",
        "__graft_rts", "__graft_m").foreach {
      c =>
        require(!left.columns.contains(c) && !right.columns.contains(c),
          s"input already has a '$c' column; rename it — " +
            s"$op uses it internally")
    }
    require(!payloadCols.contains("__graft_rts"),
      s"$op: '__graft_rts' is reserved")
    // the side flag's sort position at equal ts IS the strictness knob
    // (and it mirrors with direction: at equal ts an inclusive match
    // needs the right row INSIDE the left row's frame)
    val rightSide = if (forward != strict) 1 else 0
    // under a gap bound the carried payload remembers its own timestamp
    val payCols =
      if (maxGapSeconds.isDefined)
        payloadCols.map(col) :+ col(rightTsCol).as("__graft_rts")
      else payloadCols.map(col)
    val payType = right.select(payCols: _*).schema
    val rowType = left.schema
    val lTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTsCol).as("__graft_ts"),
        lit(1 - rightSide).as("__graft_side"),
        lit(null).cast(payType).as("__graft_pay"),
        struct(left.columns.map(col): _*).as("__graft_row")): _*)
    val rTagged = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTsCol).as("__graft_ts"),
        lit(rightSide).as("__graft_side"),
        struct(payCols: _*).as("__graft_pay"),
        lit(null).cast(rowType).as("__graft_row")): _*)
    val wBase = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__graft_ts").asc, col("__graft_side").asc)
    val carried =
      if (forward)
        first(col("__graft_pay"), ignoreNulls = true)
          .over(wBase.rowsBetween(Window.currentRow, Window.unboundedFollowing))
      else
        last(col("__graft_pay"), ignoreNulls = true)
          .over(wBase.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    val matched = lTagged.unionByName(rTagged)
      .withColumn("__graft_m", carried)
      .filter(col("__graft_row").isNotNull)
    val payOut = maxGapSeconds match {
      case None => payloadCols.map(c => col(s"__graft_m.`$c`").as(c))
      case Some(g) =>
        // micros comparison handles TIMESTAMP and TIMESTAMP_NTZ alike
        // (the NTZ cast interprets wall time in the session zone, the
        // same convention as Sessions.tsMicros)
        val ageUs =
          if (forward)
            unix_micros(col("__graft_m.__graft_rts").cast("timestamp")) -
              unix_micros(col("__graft_ts").cast("timestamp"))
          else
            unix_micros(col("__graft_ts").cast("timestamp")) -
              unix_micros(col("__graft_m.__graft_rts").cast("timestamp"))
        val fresh = col("__graft_m").isNotNull && ageUs <= g * 1000000L
        payloadCols.map(c => when(fresh, col(s"__graft_m.`$c`")).as(c))
    }
    matched.select(left.columns.map(c => col(s"__graft_row.`$c`").as(c)) ++
      payOut: _*)
  }
}
