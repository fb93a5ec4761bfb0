package graft

import graft.operators.Sessions
import graft.streaming.{ActivityStreaming, FunnelStreaming}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Streaming activity/retention and funnel maintenance: committed-store
 * reports must equal their one-shot batch operators over the full event
 * history, with fixtures engineered so the cross-batch paths fire by
 * construction (first-activity and conversion chains straddling batch
 * cuts), plus replay/ordering/params-pin/compaction protocol checks.
 */
class EventStreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private lazy val ev = graft.sources.Tables
    .events(spark, "/root/testdata/sf0.001")
    .select($"event_id", $"user_id", $"ts", $"event_type").cache()

  private val Steps = Seq("view", "click", "purchase")
  private val Week = 7L * 86400L

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/s"

  // ---- activity / retention -----------------------------------------

  private def collectRetention(df: org.apache.spark.sql.DataFrame) = df
    .select($"cohort_start_us", $"period_offset", $"n_keys")
    .as[(Long, Long, Long)].collect().toSet

  test("streaming activity: committed report == one-shot retentionCohorts, any split") {
    // split by event_id % 3 — deliberately NOT time-ordered: activity
    // pairs are monotone, so arrival order must not matter
    val store = tmp("graft_act")
    for (i <- 0 until 3)
      ActivityStreaming.activityBatch(ev.filter($"event_id" % 3 === i),
        i.toLong, store, Seq("user_id"), "ts", Week, "sc")
    val got = collectRetention(ActivityStreaming.committedRetention(
      spark, store, Seq("user_id"), Week))
    val want = collectRetention(Sessions.retentionCohorts(
      ev, Seq("user_id"), "ts", Week))
    assert(got === want)
    assert(want.exists(_._2 > 0),
      "fixture must contain returning keys (offset > 0) or the test is vacuous")

    // replay of a committed batch is a no-op
    ActivityStreaming.activityBatch(ev.filter($"event_id" % 3 === 1), 1L,
      store, Seq("user_id"), "ts", Week, "sc")
    assert(collectRetention(ActivityStreaming.committedRetention(
      spark, store, Seq("user_id"), Week)) === got)
  }

  test("empty stores read as empty, reserved key names fail fast") {
    import graft.streaming.RateStreaming
    val none = tmp("graft_empty_store")
    assert(ActivityStreaming.committedPairs(spark, none).columns.isEmpty)
    assert(RateStreaming.committedCounts(spark, none).columns.isEmpty)
    assert(FunnelStreaming.committedState(spark, none).isEmpty)
    val bad = ev.withColumnRenamed("user_id", "period_idx")
    intercept[IllegalArgumentException] {
      ActivityStreaming.activityBatch(bad, 0L, tmp("graft_g1"),
        Seq("period_idx"), "ts", Week, "sc")
    }
    intercept[IllegalArgumentException] {
      RateStreaming.rateBatch(bad, 0L, tmp("graft_g2"),
        Seq("period_idx"), "ts", Week, "sc")
    }
    val bad2 = ev.withColumnRenamed("user_id", "__graft_t0")
    intercept[IllegalArgumentException] {
      FunnelStreaming.funnelBatch(bad2, 0L, tmp("graft_g3"),
        Seq("__graft_t0"), "ts", "event_type", Steps, "sc")
    }
  }

  test("streaming activity: params pin holds on write and read") {
    val store = tmp("graft_act_pin")
    ActivityStreaming.activityBatch(ev, 0L, store, Seq("user_id"), "ts",
      Week, "sc")
    val e1 = intercept[IllegalStateException] {
      ActivityStreaming.activityBatch(ev, 1L, store, Seq("user_id"), "ts",
        86400L, "sc")
    }
    assert(e1.getMessage.contains("periodSeconds=86400"))
    val e2 = intercept[IllegalStateException] {
      ActivityStreaming.committedRetention(spark, store, Seq("user_id"), 86400L)
    }
    assert(e2.getMessage.contains("periodSeconds=86400"))
  }

  test("streaming activity: compactStore folds to one dir, same report, resumes") {
    val store = tmp("graft_act_cmp")
    for (i <- 0 until 2)
      ActivityStreaming.activityBatch(ev.filter($"event_id" % 3 === i),
        i.toLong, store, Seq("user_id"), "ts", Week, "sc")
    val dst = tmp("graft_act_cmp_dst")
    ActivityStreaming.compactStore(spark, store, dst)
    assert(collectRetention(ActivityStreaming.committedRetention(
        spark, dst, Seq("user_id"), Week)) ===
      collectRetention(ActivityStreaming.committedRetention(
        spark, store, Seq("user_id"), Week)))
    val dataDirs = new java.io.File(dst.stripSuffix("/s") + "/s/data").list()
    assert(dataDirs.length === 1, dataDirs.mkString(","))
    // replay below the committed version is a no-op; the next batch appends
    ActivityStreaming.activityBatch(ev.filter($"event_id" % 3 === 0), 1L,
      dst, Seq("user_id"), "ts", Week, "sc")
    ActivityStreaming.activityBatch(ev.filter($"event_id" % 3 === 2), 2L,
      dst, Seq("user_id"), "ts", Week, "sc")
    assert(collectRetention(ActivityStreaming.committedRetention(
        spark, dst, Seq("user_id"), Week)) ===
      collectRetention(Sessions.retentionCohorts(ev, Seq("user_id"), "ts", Week)))
  }

  test("streaming activity end-to-end: maintainActivity via readStream") {
    // two-file source dir, one file per micro-batch
    val dir = java.nio.file.Files.createTempDirectory("graft_act_in").toString
    ev.filter($"event_id" % 2 === 0).coalesce(1)
      .write.parquet(s"$dir/tmp0")
    ev.filter($"event_id" % 2 === 1).coalesce(1)
      .write.parquet(s"$dir/tmp1")
    val in = java.nio.file.Files.createTempDirectory("graft_act_src").toString
    for ((sub, name) <- Seq(("tmp0", "p0.parquet"), ("tmp1", "p1.parquet")))
      java.nio.file.Files.list(java.nio.file.Paths.get(dir, sub)).forEach { p =>
        if (p.toString.endsWith(".parquet"))
          java.nio.file.Files.copy(p, java.nio.file.Paths.get(in, name))
      }
    val store = tmp("graft_act_e2e")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_act_ck").toString
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(in)
    val q = ActivityStreaming.maintainActivity(stream, store, Seq("user_id"),
      "ts", Week, checkpointLocation = Some(ckpt))
    try q.processAllAvailable() finally q.stop()
    assert(collectRetention(ActivityStreaming.committedRetention(
        spark, store, Seq("user_id"), Week)) ===
      collectRetention(Sessions.retentionCohorts(ev, Seq("user_id"), "ts", Week)))
  }

  // ---- per-period counts / bursts -----------------------------------

  private def collectAnomalies(df: org.apache.spark.sql.DataFrame) = df
    .select($"user_id", $"period_start_us", $"n_events", $"span_periods",
      $"total_events")
    .as[(Long, Long, Long, Long, Long)].collect().toSet

  test("streaming rates: committed bursts == one-shot, spike split across batches") {
    import graft.streaming.RateStreaming
    // plant a user whose day-4 spike (30 events) splits ~10/10/10 across
    // the three batches: the spike only reaches sigma-3 once the batch
    // partials are SUMMED (a single outlier among n periods caps at
    // z^2 = n-1, so 12 baseline days put the summed spike above 9 while
    // any unsummed fragment of it is far below)
    val planted = (0 to 11).flatMap { day =>
      val n = if (day == 4) 30 else 1
      (0 until n).map(i => (1000000L + day * 100L + i, 99999L,
        new java.sql.Timestamp(1704067200000L + day * 86400000L + i * 1000L),
        "view"))
    }.toDF("event_id", "user_id", "ts", "event_type")
    val all = ev.unionByName(planted)
    val store = tmp("graft_rate")
    for (i <- 0 until 3)
      RateStreaming.rateBatch(all.filter($"event_id" % 3 === i), i.toLong,
        store, Seq("user_id"), "ts", 86400L, "sc")
    val got = collectAnomalies(RateStreaming.committedAnomalies(
      spark, store, Seq("user_id"), 86400L, k = 3))
    val want = collectAnomalies(graft.operators.Diagnostics.rateAnomalies(
      all, Seq("user_id"), "ts", 86400L, k = 3))
    assert(got === want)
    assert(got.exists(_._1 == 99999L), "the planted spike must flag")

    // replay no-op
    RateStreaming.rateBatch(all.filter($"event_id" % 3 === 1), 1L, store,
      Seq("user_id"), "ts", 86400L, "sc")
    assert(collectAnomalies(RateStreaming.committedAnomalies(
      spark, store, Seq("user_id"), 86400L, k = 3)) === got)
  }

  test("streaming rates: params pin, compaction, resume") {
    import graft.streaming.RateStreaming
    val store = tmp("graft_rate_cmp")
    for (i <- 0 until 2)
      RateStreaming.rateBatch(ev.filter($"event_id" % 3 === i), i.toLong,
        store, Seq("user_id"), "ts", 86400L, "sc")
    val e1 = intercept[IllegalStateException] {
      RateStreaming.rateBatch(ev, 2L, store, Seq("user_id"), "ts", 3600L, "sc")
    }
    assert(e1.getMessage.contains("periodSeconds=3600"))
    val e2 = intercept[IllegalStateException] {
      RateStreaming.committedAnomalies(spark, store, Seq("user_id"), 3600L)
    }
    assert(e2.getMessage.contains("periodSeconds=3600"))
    val dst = tmp("graft_rate_cmp_dst")
    RateStreaming.compactStore(spark, store, dst)
    assert(new java.io.File(dst + "/data").list().length === 1)
    RateStreaming.rateBatch(ev.filter($"event_id" % 3 === 1), 1L, dst,
      Seq("user_id"), "ts", 86400L, "sc") // replay below version: no-op
    RateStreaming.rateBatch(ev.filter($"event_id" % 3 === 2), 2L, dst,
      Seq("user_id"), "ts", 86400L, "sc")
    assert(collectAnomalies(RateStreaming.committedAnomalies(
        spark, dst, Seq("user_id"), 86400L, k = 2)) ===
      collectAnomalies(graft.operators.Diagnostics.rateAnomalies(
        ev, Seq("user_id"), "ts", 86400L, k = 2)))
  }

  // ---- funnel --------------------------------------------------------

  private def collectCounts(df: org.apache.spark.sql.DataFrame) = df
    .select($"step_idx", $"step", $"n_keys")
    .as[(Long, String, Long)].collect().toSet

  /** Global-ts 3-way split (preserves per-key ts order). The cuts are
    * placed between some converting key's click and purchase, so a
    * conversion chain STRADDLES the batch boundary by construction. */
  private def funnelBatches = {
    val t = Sessions.funnelCounts(ev, Seq("user_id"), "ts", "event_type", Steps)
    assert(collectCounts(t).exists(r => r._1 == 2L && r._3 > 0),
      "fixture must contain full conversions")
    // a key's earliest in-order click time: cut there so its purchase
    // lands in a later batch
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id").agg(min($"ts").cast("string").as("ct"))
      .orderBy($"ct").select($"ct").as[String].collect()
    val cut1 = clicks(clicks.length / 3)
    val cut2 = clicks(2 * clicks.length / 3)
    val s = $"ts".cast("string")
    (ev.filter(s < cut1),
      ev.filter(s >= cut1 && s < cut2),
      ev.filter(s >= cut2))
  }

  test("streaming funnel: committed counts == one-shot funnelCounts across batches") {
    val (b0, b1, b2) = funnelBatches
    val store = tmp("graft_fun")
    for ((b, i) <- Seq(b0, b1, b2).zipWithIndex)
      FunnelStreaming.funnelBatch(b, i.toLong, store, Seq("user_id"), "ts",
        "event_type", Steps, "sc")
    val got = collectCounts(FunnelStreaming.committedCounts(
      spark, store, Seq("user_id"), Steps))
    val want = collectCounts(Sessions.funnelCounts(
      ev, Seq("user_id"), "ts", "event_type", Steps))
    assert(got === want,
      "incremental funnel state must reproduce the one-shot chain exactly")

    // the straddle path genuinely fired: some key's step times span
    // multiple batch time-ranges
    val b0Max = b0.agg(max(Sessions.tsMicros(b0, "ts"))).head.getLong(0)
    val st = FunnelStreaming.committedState(spark, store).get
    assert(st.filter(col("__graft_t0") <= b0Max &&
        col("__graft_t2") > b0Max).count() > 0,
      "fixture must contain a conversion straddling the batch-0/1 cut")

    // replay of a committed batch is a no-op
    FunnelStreaming.funnelBatch(b1, 1L, store, Seq("user_id"), "ts",
      "event_type", Steps, "sc")
    assert(collectCounts(FunnelStreaming.committedCounts(
      spark, store, Seq("user_id"), Steps)) === got)
  }

  test("streaming funnel: out-of-order arrival fails, params pin holds") {
    val (b0, b1, _) = funnelBatches
    val store = tmp("graft_fun_ooo")
    FunnelStreaming.funnelBatch(b1, 0L, store, Seq("user_id"), "ts",
      "event_type", Steps, "sc")
    val ex = intercept[Exception] {
      FunnelStreaming.funnelBatch(b0, 1L, store, Seq("user_id"), "ts",
        "event_type", Steps, "sc")
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("out-of-order"), s"got: $msgs")
    val ex2 = intercept[IllegalStateException] {
      FunnelStreaming.funnelBatch(b0, 2L, store, Seq("user_id"), "ts",
        "event_type", Seq("view", "purchase"), "sc")
    }
    assert(ex2.getMessage.contains("steps=view>purchase"))
    val ex3 = intercept[IllegalStateException] {
      FunnelStreaming.committedCounts(spark, store, Seq("user_id"),
        Seq("view", "purchase"))
    }
    assert(ex3.getMessage.contains("steps=view>purchase"))
  }

  test("streaming funnel: compactStore folds the chain, same report, resumes") {
    val (b0, b1, b2) = funnelBatches
    val store = tmp("graft_fun_cmp")
    for ((b, i) <- Seq(b0, b1).zipWithIndex)
      FunnelStreaming.funnelBatch(b, i.toLong, store, Seq("user_id"), "ts",
        "event_type", Steps, "sc")
    val dst = tmp("graft_fun_cmp_dst")
    FunnelStreaming.compactStore(spark, store, dst)
    assert(collectCounts(FunnelStreaming.committedCounts(
        spark, dst, Seq("user_id"), Steps)) ===
      collectCounts(FunnelStreaming.committedCounts(
        spark, store, Seq("user_id"), Steps)))
    val dataDirs = new java.io.File(dst + "/data").list()
    assert(dataDirs.length === 1, dataDirs.mkString(","))
    // resume on the compacted store: batch 1 replays as a no-op, batch 2
    // appends — final report equals the one-shot over everything
    FunnelStreaming.funnelBatch(b1, 1L, dst, Seq("user_id"), "ts",
      "event_type", Steps, "sc")
    FunnelStreaming.funnelBatch(b2, 2L, dst, Seq("user_id"), "ts",
      "event_type", Steps, "sc")
    assert(collectCounts(FunnelStreaming.committedCounts(
        spark, dst, Seq("user_id"), Steps)) ===
      collectCounts(Sessions.funnelCounts(
        ev, Seq("user_id"), "ts", "event_type", Steps)))
  }
}
