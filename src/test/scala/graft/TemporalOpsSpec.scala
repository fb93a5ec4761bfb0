package graft

import graft.operators.{AsofJoin, Sessions}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Temporal operators: the union-trick as-of join (vs a brute-force
 * range-join-and-argmax twin, and plan-pinned join-free) and gap-based
 * sessionization (vs a transparent per-key replay).
 */
class TemporalOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: Long) = new java.sql.Timestamp(s * 1000L)

  test("latestPreceding equals brute-force range join + argmax (events data)") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val views = ev.filter($"event_type" === "view")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("view_event_id"))
      .select($"user_id", $"ts".as("view_ts"), $"view_event_id")
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")

    val got = AsofJoin.latestPreceding(
      clicks, views, Seq("user_id"), "ts", "view_ts",
      payloadCols = Seq("view_event_id", "view_ts"))

    // brute force: every (click, preceding view) pair, keep max view_ts
    val pairs = clicks.as("c").join(views.as("v"),
        $"c.user_id" === $"v.user_id" && $"v.view_ts" <= $"c.ts", "left")
      .groupBy($"c.event_id", $"c.user_id", $"c.ts")
      .agg(max($"v.view_ts").as("want_ts"))
    val want = pairs.as("p").join(views.as("v"),
        $"p.user_id" === $"v.user_id" && $"p.want_ts" === $"v.view_ts", "left")
      .select($"p.event_id", $"p.user_id", $"p.ts",
        $"v.view_event_id", $"v.view_ts")

    assert(got.exceptAll(want).count() === 0 && want.exceptAll(got).count() === 0)
    // the left-join path is actually exercised
    assert(got.filter($"view_event_id".isNull).count() > 0)
  }

  test("inclusive vs strict at an exactly-equal timestamp") {
    val left = Seq((1L, ts(100)), (2L, ts(50))).toDF("id", "t")
    val right = Seq((ts(100), "at100"), (ts(40), "at40"))
      .toDF("rt", "tag")
      .withColumn("k", lit(1L)).select($"k", $"rt", $"tag")
    val l = left.withColumn("k", lit(1L))
    val inc = AsofJoin.latestPreceding(l, right, Seq("k"), "t", "rt", Seq("tag"))
      .select($"id", $"tag").as[(Long, String)].collect().toMap
    assert(inc === Map(1L -> "at100", 2L -> "at40"),
      "inclusive: a right row stamped at exactly t applies")
    val st = AsofJoin.latestPreceding(l, right, Seq("k"), "t", "rt", Seq("tag"),
        strict = true)
      .select($"id", $"tag").as[(Long, String)].collect().toMap
    assert(st === Map(1L -> "at40", 2L -> "at40"),
      "strict: only strictly earlier right rows match")
  }

  test("latestPreceding plans join-free: one window, no BroadcastNestedLoopJoin") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val views = ev.filter($"event_type" === "view")
      .select($"user_id", $"ts".as("view_ts"), $"event_id".as("view_event_id"))
    val clicks = ev.filter($"event_type" === "click")
      .select($"event_id", $"user_id", $"ts")
    val plan = AsofJoin.latestPreceding(
        clicks, views, Seq("user_id"), "ts", "view_ts", Seq("view_event_id"))
      .queryExecution.explainString(FormattedMode)
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"the union-trick must not degrade to a nested-loop range join:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin"),
      s"no join at all — one union + one window:\n$plan")
    assert(plan.contains("Window"), s"expected the per-key window:\n$plan")
  }

  test("maxGapSeconds: stale matches null out, exactly-at-bound is kept") {
    // right at t=40: a left row at t=100 is 60s away — inside a 60s
    // bound (inclusive), outside a 59s bound; a left row at t=200 only
    // matches with no bound
    val left = Seq((1L, ts(100)), (2L, ts(200))).toDF("id", "t")
      .withColumn("k", lit(1L))
    val right = Seq((ts(40), "x")).toDF("rt", "tag").withColumn("k", lit(1L))
    def run(gap: Option[Long]) = AsofJoin.latestPreceding(
        left, right, Seq("k"), "t", "rt", Seq("tag"), maxGapSeconds = gap)
      .select($"id", $"tag").as[(Long, Option[String])].collect().toMap
    assert(run(None) === Map(1L -> Some("x"), 2L -> Some("x")))
    assert(run(Some(60L)) === Map(1L -> Some("x"), 2L -> None))
    assert(run(Some(59L)) === Map(1L -> None, 2L -> None))
    // the bounded variant keeps the join-free plan
    val plan = AsofJoin.latestPreceding(left, right, Seq("k"), "t", "rt",
        Seq("tag"), maxGapSeconds = Some(60L))
      .queryExecution.explainString(FormattedMode)
    assert(!plan.contains("Join") && plan.contains("Window"), plan)
  }

  test("attributed_purchases fixture exercises both branches at sf0.001") {
    val df = SparkEntry.queries("attributed_purchases")(
      spark, "/root/testdata/sf0.001")
    val n = df.count()
    val hit = df.filter($"click_event_id".isNotNull).count()
    assert(hit > 0 && hit < n,
      s"need attributed AND unattributed purchases, got $hit of $n")
  }

  test("earliestFollowing mirrors latestPreceding: inclusive/strict/gap") {
    // right rows at t=100 and t=200; left at t=100 and t=150
    val left = Seq((1L, ts(100)), (2L, ts(150))).toDF("id", "t")
      .withColumn("k", lit(1L))
    val right = Seq((ts(100), "a"), (ts(200), "b")).toDF("rt", "tag")
      .withColumn("k", lit(1L))
    def run(strict: Boolean, gap: Option[Long]) = AsofJoin.earliestFollowing(
        left, right, Seq("k"), "t", "rt", Seq("tag"), strict, gap)
      .select($"id", $"tag").as[(Long, Option[String])].collect().toMap
    assert(run(strict = false, None) ===
      Map(1L -> Some("a"), 2L -> Some("b")),
      "inclusive: a right row at exactly t matches")
    assert(run(strict = true, None) ===
      Map(1L -> Some("b"), 2L -> Some("b")),
      "strict: only strictly later right rows match")
    assert(run(strict = true, Some(40L)) === Map(1L -> None, 2L -> None),
      "forward gap bound: both matches are farther ahead than 40s")
    assert(run(strict = true, Some(50L)) === Map(1L -> None, 2L -> Some("b")),
      "exactly-at-bound is kept (150 -> 200 is 50s)")
    assert(run(strict = true, Some(100L)) ===
      Map(1L -> Some("b"), 2L -> Some("b")))
  }

  test("funnelWindowedCounts: hand fixture pins deadline-from-first semantics") {
    // window 100s. u1 completes in window (C at EXACTLY the deadline);
    // u2's C misses the deadline; u3 completes only via its SECOND
    // step-0 event; u4 never starts; u5 stalls after A; u6's B at
    // exactly A's ts does not advance (strict within chain)
    val rows = Seq(
      (1L, "A", 0L), (1L, "B", 50L), (1L, "C", 100L),
      (2L, "A", 0L), (2L, "B", 90L), (2L, "C", 150L),
      (3L, "A", 0L), (3L, "A", 140L), (3L, "B", 150L), (3L, "C", 200L),
      (4L, "B", 10L), (4L, "C", 20L),
      (5L, "A", 0L), (5L, "C", 10L),
      (6L, "A", 10L), (6L, "B", 10L))
    val ev = rows.map { case (u, s, t) => (u, s, ts(t)) }
      .toDF("user_id", "step", "t")
    val got = Sessions.funnelWindowedCounts(ev, Seq("user_id"), "t", "step",
        Seq("A", "B", "C"), windowSeconds = 100L)
      .orderBy($"step_idx").as[(Long, String, Long)].collect().toSeq
    // step0: u1,u2,u3,u5,u6 = 5; step1: u1,u2,u3 = 3; step2: u1,u3 = 2
    assert(got === Seq((0L, "A", 5L), (1L, "B", 3L), (2L, "C", 2L)))
    // u3 is the load-bearing case: greedy from its FIRST A dies (B@150
    // > 0+100) but the second A@140 completes — ANY-start semantics
  }

  test("funnelWindowedCounts matches unwindowed funnelCounts at a huge window") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val steps = Seq("view", "click", "purchase")
    val wide = Sessions.funnelWindowedCounts(ev, Seq("user_id"), "ts",
        "event_type", steps, windowSeconds = 10L * 365L * 86400L)
      .orderBy($"step_idx").as[(Long, String, Long)].collect().toSeq
    val un = Sessions.funnelCounts(ev, Seq("user_id"), "ts", "event_type",
        steps)
      .orderBy($"step_idx").as[(Long, String, Long)].collect().toSeq
    // a window longer than the whole timeline imposes no constraint, and
    // the windowed ANY-start existence semantics then coincide with the
    // unwindowed earliest-chain semantics
    assert(wide === un)
    val narrow = Sessions.funnelWindowedCounts(ev, Seq("user_id"), "ts",
        "event_type", steps, windowSeconds = 3600L)
      .orderBy($"step_idx").as[(Long, String, Long)].collect().toSeq
    assert(narrow.head._3 === un.head._3, "step 0 has no window to miss")
    assert(narrow(2)._3 <= un(2)._3,
      "a narrow window can only lose conversions")
  }

  test("payload/key/internal-column guards fail fast") {
    val l = Seq((1L, ts(1), "x")).toDF("k", "t", "tag")
    val r = Seq((1L, ts(1), "y")).toDF("k", "rt", "tag")
    val e1 = intercept[IllegalArgumentException] {
      AsofJoin.latestPreceding(l, r, Seq("k"), "t", "rt", Seq("tag"))
    }
    assert(e1.getMessage.contains("collides"))
    val e2 = intercept[IllegalArgumentException] {
      AsofJoin.latestPreceding(l, r, Seq("k"), "t", "rt", Nil)
    }
    assert(e2.getMessage.contains("payloadCols"))
    val e3 = intercept[IllegalArgumentException] {
      AsofJoin.latestPreceding(l,
        r.withColumnRenamed("k", "kk").withColumnRenamed("tag", "pay"),
        Seq("k"), "t", "rt", Seq("pay"))
    }
    assert(e3.getMessage.contains("key column"))
  }

  test("sessionize: ordinals and rollup match a transparent per-key replay") {
    // user 1: events at 0s, 10s, 3700s, 3710s, 9000s with gap 3600s
    //   -> sessions {0,10}, {3700,3710}, {9000}
    // user 2: single event
    // user 3: 100, 3600, 7100 — consecutive gaps of exactly 3500s, both
    //   within the 3600s gap, so ONE session spanning 7000s
    val rows = Seq(
      (1L, 0L), (1L, 10L), (1L, 3700L), (1L, 3710L), (1L, 9000L),
      (2L, 42L),
      (3L, 100L), (3L, 3600L), (3L, 7100L))
    val ev = rows.zipWithIndex.map { case ((u, s), i) =>
      (i.toLong, u, ts(s), java.math.BigDecimal.valueOf(s))
    }.toDF("event_id", "user_id", "ts", "value")
      .withColumn("value", $"value".cast("decimal(18,2)"))

    val assigned = Sessions.assign(ev, Seq("user_id"), "ts", 3600L,
        orderCols = Seq("event_id"))
      .select($"user_id", $"event_id", $"session_seq", $"is_session_start")
      .as[(Long, Long, Long, Boolean)].collect().toSet
    assert(assigned === Set(
      (1L, 0L, 1L, true), (1L, 1L, 1L, false),
      (1L, 2L, 2L, true), (1L, 3L, 2L, false),
      (1L, 4L, 3L, true),
      (2L, 5L, 1L, true),
      (3L, 6L, 1L, true), (3L, 7L, 1L, false), (3L, 8L, 1L, false)))

    val stats = Sessions.stats(ev, Seq("user_id"), "ts", 3600L,
        valueCol = Some("value"), orderCols = Seq("event_id"))
      .select($"user_id", $"session_seq", $"n_events", $"duration_us",
        $"value_sum".cast("string"))
      .as[(Long, Long, Long, Long, String)].collect().toSet
    assert(stats === Set(
      (1L, 1L, 2L, 10000000L, "10.00"),
      (1L, 2L, 2L, 10000000L, "7410.00"),
      (1L, 3L, 1L, 0L, "9000.00"),
      (2L, 1L, 1L, 0L, "42.00"),
      (3L, 1L, 3L, 7000000000L, "10800.00")))
  }

  test("sessionize plans one per-key window, never a global one") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val plan = Sessions.assign(ev, Seq("user_id"), "ts", 14400L,
        orderCols = Seq("event_id"))
      .queryExecution.explainString(FormattedMode)
    assert(plan.contains("Window"), plan)
    // a missing partitionBy would plan an empty partition spec
    assert(!plan.replaceAll("\\s+", " ").contains("Window [")
      || plan.contains("user_id"), plan)
  }

  test("funnelCounts: ordered semantics on a hand-built fixture") {
    // u1 completes A->B->C in order; u2 does B before A (B must re-occur
    // after A to count — it doesn't); u3 has A and C but no B, so C
    // cannot count; u4's B is at EXACTLY A's timestamp (no advance);
    // u5 completes with interleaved noise and a later duplicate C
    val rows = Seq(
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      (2L, "B", 5L), (2L, "A", 10L), (2L, "C", 15L),
      (3L, "A", 10L), (3L, "C", 20L),
      (4L, "A", 10L), (4L, "B", 10L),
      (5L, "B", 1L), (5L, "A", 2L), (5L, "X", 3L), (5L, "B", 4L),
      (5L, "C", 5L), (5L, "C", 6L))
    val ev = rows.map { case (u, s, t) => (u, s, ts(t)) }
      .toDF("user_id", "step", "t")
    val got = Sessions.funnelCounts(ev, Seq("user_id"), "t", "step",
        Seq("A", "B", "C"))
      .orderBy($"step_idx")
      .as[(Long, String, Long)].collect().toSeq
    // A reached by u1..u5 (all have an A); B-after-A by u1, u5;
    // C-after-that-B by u1, u5
    assert(got === Seq((0L, "A", 5L), (1L, "B", 2L), (2L, "C", 2L)))
  }

  test("funnelCounts matches an independent per-key replay on events data") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val steps = Seq("view", "click", "purchase")
    val got = Sessions.funnelCounts(ev, Seq("user_id"), "ts", "event_type",
        steps)
      .orderBy($"step_idx").as[(Long, String, Long)].collect().toSeq
    // transparent replay: per user, scan the sorted event list
    val byUser = ev.select($"user_id", $"event_type",
        $"ts".cast("string"))
      .as[(Long, String, String)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3)).toMap
    val reached = Array.fill(steps.size)(0L)
    byUser.values.foreach { evs =>
      var i = 0
      var lastT = ""
      evs.foreach { case (_, step, t) =>
        if (i < steps.size && step == steps(i) && (i == 0 || t > lastT)) {
          lastT = t; i += 1
        }
      }
      (0 until i).foreach(j => reached(j) += 1)
    }
    assert(got === steps.zipWithIndex.map { case (s, i) =>
      (i.toLong, s, reached(i)) })
    assert(got.head._3 >= got(1)._3 && got(1)._3 >= got(2)._3,
      "the funnel must be monotone non-increasing")
  }

  test("funnelTransitions: latencies on the funnel fixture") {
    // u1: A@10 -> B@20 -> C@30 (latencies 10s, 10s)
    // u5: A@2 -> B@4 -> C@5 (latencies 2s, 1s); u2/u3/u4 never convert
    val rows = Seq(
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      (2L, "B", 5L), (2L, "A", 10L), (2L, "C", 15L),
      (3L, "A", 10L), (3L, "C", 20L),
      (4L, "A", 10L), (4L, "B", 10L),
      (5L, "B", 1L), (5L, "A", 2L), (5L, "X", 3L), (5L, "B", 4L),
      (5L, "C", 5L), (5L, "C", 6L))
    val ev = rows.map { case (u, s, t) => (u, s, ts(t)) }
      .toDF("user_id", "step", "t")
    val got = Sessions.funnelTransitions(ev, Seq("user_id"), "t", "step",
        Seq("A", "B", "C"))
      .orderBy($"step_idx")
      .as[(Long, String, String, Long, Long, Long, Long)].collect().toSeq
    val M = 1000000L
    assert(got === Seq(
      (1L, "A", "B", 2L, 2L * M, 6L * M, 10L * M),
      (2L, "B", "C", 2L, 1L * M, 5L * M + 500000L, 10L * M)))
  }

  test("funnelTransitions: zero-conversion transition yields NULL latencies") {
    val ev = Seq((1L, "A", ts(1)), (2L, "A", ts(2)))
      .toDF("user_id", "step", "t")
    val got = Sessions.funnelTransitions(ev, Seq("user_id"), "t", "step",
        Seq("A", "B"))
      .select($"step_idx", $"n_converted", $"min_latency_us".isNull,
        $"avg_latency_us".isNull, $"max_latency_us".isNull)
      .as[(Long, Long, Boolean, Boolean, Boolean)].collect().toSeq
    assert(got === Seq((1L, 0L, true, true, true)))
  }

  test("retentionCohorts: hand-built fixture incl. pre-epoch floor") {
    // period = 10s. u1 first in period 0, active in 0,1,3 (two events in
    // period 1 must not double-count); u2 first in period 1, active 1,2;
    // u3 only period 3; u4 at t=-5s -> period -1 (floor, NOT trunc-to-0)
    val rows = Seq(
      (1L, 0L), (1L, 12L), (1L, 15L), (1L, 30L),
      (2L, 11L), (2L, 25L),
      (3L, 33L),
      (4L, -5L))
    val ev = rows.map { case (u, t) => (u, ts(t)) }.toDF("user_id", "t")
    val got = Sessions.retentionCohorts(ev, Seq("user_id"), "t", 10L)
      .orderBy($"cohort_start_us", $"period_offset")
      .as[(Long, Long, Long)].collect().toSeq
    val M = 10L * 1000000L
    assert(got === Seq(
      (-1L * M, 0L, 1L),
      (0L * M, 0L, 1L), (0L * M, 1L, 1L), (0L * M, 3L, 1L),
      (1L * M, 0L, 1L), (1L * M, 1L, 1L),
      (3L * M, 0L, 1L)))
  }

  test("funnel plans keyed joins + hash aggs only: no Window, no BNLJ") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    for (df <- Seq(
        Sessions.funnelCounts(ev, Seq("user_id"), "ts", "event_type",
          Seq("view", "click", "purchase")),
        Sessions.funnelTransitions(ev, Seq("user_id"), "ts", "event_type",
          Seq("view", "click", "purchase")))) {
      val plan = df.queryExecution.explainString(FormattedMode)
      assert(!plan.contains("Window"),
        s"the iterated-conditional-min chain must not plan a window:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin"),
        s"step joins are key-equi, never nested-loop:\n$plan")
    }
  }

  test("retentionCohorts plans distinct-then-window, no count_distinct") {
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val plan = Sessions.retentionCohorts(ev, Seq("user_id"), "ts", 604800L)
      .queryExecution.explainString(FormattedMode)
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("distinct_count") && !plan.contains("count(distinct"),
      s"the distinct pairs themselves are the count — no count_distinct:\n$plan")
  }

  test("sessionPaths: a NULL step mid-window drops the row instead of shortening the path") {
    // concat_ws silently skips NULLs — "A>C" for A,NULL,C would diverge
    // from the SQL spelling s0||'>'||s1||'>'||s2 (NULL, row dropped)
    val rows = Seq(
      (1L, Option("A"), 0L), (1L, None, 1L), (1L, Option("C"), 2L),
      (1L, Option("D"), 3L))
    val ev = rows.zipWithIndex.map { case ((u, s, t), i) =>
      (i.toLong, u, s, ts(t)) }
      .toDF("event_id", "user_id", "step", "t")
    val got = Sessions.sessionPaths(ev, Seq("user_id"), "t", "step",
        gapSeconds = 100L, pathLen = 3, orderCols = Seq("event_id"))
      .select($"path").as[String].collect().toSet
    // windows starting at A (A,∅,C) and at ∅ (∅,C,D) both contain a NULL;
    // only C>D... has no third member — nothing but the full C,D window
    // of length 2 < 3 remains, so the only survivor is none at all? No:
    // the A,∅,C and ∅,C,D windows drop; no 3-window is NULL-free
    assert(got === Set.empty[String], s"NULL-containing windows must drop, got $got")
    // and a NULL-free suffix still emits: B,C,D after replacing the NULL
    val ev2 = rows.zipWithIndex.map { case ((u, s, t), i) =>
      (i.toLong, u, s.getOrElse("B"), ts(t)) }
      .toDF("event_id", "user_id", "step", "t")
    val got2 = Sessions.sessionPaths(ev2, Seq("user_id"), "t", "step",
        gapSeconds = 100L, pathLen = 3, orderCols = Seq("event_id"))
      .select($"path").as[String].collect().toSet
    assert(got2 === Set("A>B>C", "B>C>D"))
  }

  test("asof reserved-column guard covers the merge marker") {
    val left = Seq((1L, ts(1), "x")).toDF("user_id", "t", "__graft_m")
    val right = Seq((1L, ts(0), 7L)).toDF("user_id", "rt", "pay")
    val e = intercept[IllegalArgumentException] {
      AsofJoin.latestPreceding(left, right, Seq("user_id"), "t", "rt",
        payloadCols = Seq("pay"))
    }
    assert(e.getMessage.contains("__graft_m"))
  }

  test("sessionPaths: windows stay inside sessions and emit full paths only") {
    // u1 session 1: A,B,C,D (paths A>B>C, B>C>D); session 2 (after the
    // 100s gap): E,F — too short for a trigram, emits nothing
    val rows = Seq(
      (1L, "A", 0L), (1L, "B", 1L), (1L, "C", 2L), (1L, "D", 3L),
      (1L, "E", 1000L), (1L, "F", 1001L))
    val ev = rows.zipWithIndex.map { case ((u, s, t), i) =>
      (i.toLong, u, s, ts(t)) }
      .toDF("event_id", "user_id", "step", "t")
    val got = Sessions.sessionPaths(ev, Seq("user_id"), "t", "step",
        gapSeconds = 100L, pathLen = 3, orderCols = Seq("event_id"))
      .select($"user_id", $"session_seq", $"path")
      .as[(Long, Long, String)].collect().toSet
    assert(got === Set((1L, 1L, "A>B>C"), (1L, 1L, "B>C>D")))
  }

  test("funnel and retention are invariant to input partition layout") {
    // order-dependence anywhere in the chains would show up here: the
    // same events under a hostile repartition must produce identical rows
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val shuffled = ev.repartition(13, $"event_type")
    def fc(d: org.apache.spark.sql.DataFrame) =
      Sessions.funnelCounts(d, Seq("user_id"), "ts", "event_type",
          Seq("view", "click", "purchase"))
        .as[(Long, String, Long)].collect().toSet
    def rc(d: org.apache.spark.sql.DataFrame) =
      Sessions.retentionCohorts(d, Seq("user_id"), "ts", 604800L)
        .as[(Long, Long, Long)].collect().toSet
    assert(fc(ev) === fc(shuffled))
    assert(rc(ev) === rc(shuffled))
  }

  test("funnel/retention reserved-column guards fail fast") {
    val bad1 = Seq((1L, "A", ts(1))).toDF("__graft_t0", "step", "t")
    intercept[IllegalArgumentException] {
      Sessions.funnelCounts(bad1, Seq("__graft_t0"), "t", "step", Seq("A"))
    }
    val bad2 = Seq((1L, ts(1))).toDF("period_idx", "t")
    intercept[IllegalArgumentException] {
      Sessions.retentionCohorts(bad2, Seq("period_idx"), "t", 10L)
    }
    val bad3 = Seq((1L, "A", ts(1), true))
      .toDF("user_id", "step", "t", "__graft_full")
    intercept[IllegalArgumentException] {
      Sessions.sessionPaths(bad3, Seq("user_id"), "t", "step", 10L, 2)
    }
  }

  test("stickiness: hand-computed exact ppm, duplicate events collapse") {
    // "days" of 10s, periods of 2 days. period 0: u1 active both days
    // (one day twice — must not double count), u2 one day -> 2 keys,
    // 3 key-days, 3e6 DIV 4 = 750000. period 1: u1 and u3 one day each
    // -> 2 keys, 2 key-days, 500000
    val rows = Seq(
      (1L, 0L), (1L, 5L), (1L, 12L), (1L, 25L),
      (2L, 3L),
      (3L, 33L))
    val ev = rows.map { case (u, t) => (u, ts(t)) }.toDF("user_id", "t")
    val got = Sessions.stickiness(ev, Seq("user_id"), "t",
        periodDays = 2, daySeconds = 10L)
      .orderBy($"period_start_us")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 2L, 3L, 750000L),
      (20L * 1000000L, 2L, 2L, 500000L)))
    intercept[IllegalArgumentException] {
      Sessions.stickiness(ev.withColumnRenamed("user_id", "stickiness_e6"),
        Seq("stickiness_e6"), "t")
    }
  }

  test("sessionize guards: gap and reserved columns fail fast") {
    val ev = Seq((1L, ts(0))).toDF("user_id", "ts")
    val e1 = intercept[IllegalArgumentException] {
      Sessions.assign(ev, Seq("user_id"), "ts", 0L)
    }
    assert(e1.getMessage.contains("gapSeconds"))
    val e2 = intercept[IllegalArgumentException] {
      Sessions.assign(ev.withColumn("session_seq", lit(1L)),
        Seq("user_id"), "ts", 10L)
    }
    assert(e2.getMessage.contains("session_seq"))
  }
}
