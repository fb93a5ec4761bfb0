package graft

import org.apache.spark.sql.graftshim.GraftShim

/**
 * Session configuration for the topn sketch family.
 *
 * Mirrors the reference's GUC `topn.number_of_counters` (default 1000,
 * validated range 1..14,913,080 — reference: topn.c:49, 167-179, 72). The
 * reference reads the GUC live at every prune/create site, so a sketch built
 * under one setting and re-read under another prunes to the current value
 * (exercised by sql/union_agg.sql:8,26). We reproduce that by resolving the
 * conf when each expression is *built* (analysis time), i.e. per query.
 */
object GraftConf {

  val NumberOfCountersKey = "spark.topn.numberOfCounters"
  val DefaultNumberOfCounters = 1000

  /** Reference upper bound: JSONB_MAX_PAIRS at the reference's build time. */
  val MaxNumberOfCounters = 14913080

  def numberOfCounters: Int = {
    val raw = GraftShim.getConf(NumberOfCountersKey, DefaultNumberOfCounters.toString)
    val n =
      try raw.toInt
      catch {
        case _: NumberFormatException =>
          throw GraftErrors.confNotInteger(NumberOfCountersKey, raw)
      }
    if (n < 1 || n > MaxNumberOfCounters) {
      throw GraftErrors.countersOutOfRange(
        NumberOfCountersKey, n, MaxNumberOfCounters)
    }
    n
  }
}
