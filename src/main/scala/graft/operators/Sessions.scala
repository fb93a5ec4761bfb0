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
}
