package graft

import graft.operators.Diagnostics
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Burst detection (rateAnomalies): hand-computed moment fixtures incl.
  * the exact-boundary case, zero-variance and single-period immunity,
  * and the silent-period-as-zero baseline; keySkewReport guards. */
class DiagnosticsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  /** (key, periodIdx, count) -> events at 10s periods, `count` rows in
    * the period's first second. */
  private def ev(rows: (Long, Long, Int)*) =
    rows.flatMap { case (k, p, c) =>
      (0 until c).map(i => (k, ts(p * 10L)))
    }.toDF("key", "t")

  private def run(df: org.apache.spark.sql.DataFrame, k: Int) =
    Diagnostics.rateAnomalies(df, Seq("key"), "t", 10L, k)
      .select($"key", $"period_start_us", $"n_events", $"span_periods",
        $"total_events")
      .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("a single spike flags at 2 sigma iff strictly above the boundary") {
    // one outlier among n periods sits at EXACTLY sqrt(n-1) sigma:
    // n=5 -> exactly 2 sigma -> NOT flagged (strictly-greater test);
    // n=6 -> sqrt(5) sigma -> flagged at k=2, not at k=3
    val five = ev((1L, 0L, 1), (1L, 1L, 1), (1L, 2L, 1), (1L, 3L, 10),
      (1L, 4L, 1))
    assert(run(five, 2) === Set.empty)
    val six = ev((1L, 0L, 1), (1L, 1L, 1), (1L, 2L, 1), (1L, 3L, 1),
      (1L, 4L, 10), (1L, 5L, 1))
    assert(run(six, 2) === Set((1L, 40L * 1000000L, 10L, 6L, 15L)))
    assert(run(six, 3) === Set.empty)
  }

  test("zero-variance and single-period keys never flag") {
    val const = ev((1L, 0L, 5), (1L, 1L, 5), (1L, 2L, 5))
    assert(run(const, 1) === Set.empty)
    val single = ev((2L, 7L, 1000))
    assert(run(single, 1) === Set.empty)
  }

  test("silent periods count as zeros in the baseline") {
    // two active periods 10 apart, 5 events each: with span zeros the
    // baseline is 10/11 per period and both spikes flag at 2 sigma;
    // were only observed periods counted, variance would be 0 -> no flag
    val sparse = ev((3L, 0L, 5), (3L, 10L, 5))
    assert(run(sparse, 2) === Set(
      (3L, 0L, 5L, 11L, 10L),
      (3L, 100L * 1000000L, 5L, 11L, 10L)))
  }

  test("rateAnomalies and keySkewReport guards fail fast") {
    val d = ev((1L, 0L, 1))
    intercept[IllegalArgumentException] {
      Diagnostics.rateAnomalies(d, Nil, "t", 10L)
    }
    intercept[IllegalArgumentException] {
      Diagnostics.rateAnomalies(d, Seq("key"), "t", 0L)
    }
    intercept[IllegalArgumentException] {
      Diagnostics.rateAnomalies(d, Seq("key"), "t", 10L, k = 0)
    }
    intercept[IllegalArgumentException] {
      Diagnostics.keySkewReport(d, "key", k = 30, counters = 20)
    }
    val bad = ev((1L, 0L, 1)).withColumnRenamed("key", "n_events")
    intercept[IllegalArgumentException] {
      Diagnostics.rateAnomalies(bad, Seq("n_events"), "t", 10L)
    }
  }

  test("rateAnomalies is invariant to input partition layout") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    def run(d: org.apache.spark.sql.DataFrame) =
      Diagnostics.rateAnomalies(d, Seq("user_id"), "ts", 86400L, k = 2)
        .select($"user_id", $"period_start_us", $"n_events")
        .as[(Long, Long, Long)].collect().toSet
    assert(run(events) === run(events.repartition(13, $"event_type")))
  }

  test("plan: one corpus groupBy, one keyed join, no window") {
    val events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val plan = Diagnostics.rateAnomalies(events, Seq("user_id"), "ts", 86400L)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
