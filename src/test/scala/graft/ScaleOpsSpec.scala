package graft

import graft.operators.Rollups
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Scale-pattern proofs: bucketed rollup storage re-aggregates without a
 * shuffle; salted two-level sketch build equals the direct aggregate.
 */
class ScaleOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("salted two-level sketch build equals direct aggregation (skew pattern)") {
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val direct = orders.groupBy($"o_orderpriority")
      .agg(TopnFunctions.topn_add_agg($"o_custkey".cast("string"), 2000000).as("sketch"))
      .select($"o_orderpriority", explode($"sketch").as(Seq("item", "frequency")))
    val salted = Rollups.saltedTopnAdd(
      orders.withColumn("item", $"o_custkey".cast("string")),
      "o_orderpriority", "item", 2000000, saltBuckets = 16)
      .select($"o_orderpriority", explode($"sketch").as(Seq("item", "frequency")))
    assert(direct.exceptAll(salted).count() === 0)
    assert(salted.exceptAll(direct).count() === 0)
  }

  test("hierarchical union equals direct global union (fan-in pattern)") {
    val monthly = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg(TopnFunctions.topn_add_agg($"o_custkey".cast("string"), 2000000).as("sketch"))
    val direct = monthly.agg(TopnFunctions.topn_union_agg($"sketch", 2000000))
      .collect().head.getMap[String, Long](0).toMap
    val hier = Rollups.hierarchicalUnion(monthly, "sketch", 2000000, fanIn = 7)
      .collect().head.getMap[String, Long](0).toMap
    assert(hier === direct)
    // the fan-in key is a pure row hash, so the grouping — and the result —
    // must not depend on the input's partition layout
    val cached = monthly.cache()
    try {
      val a = Rollups.hierarchicalUnion(cached.repartition(1), "sketch", 2000000, fanIn = 7)
        .collect().head.getMap[String, Long](0).toMap
      val b = Rollups.hierarchicalUnion(cached.repartition(13), "sketch", 2000000, fanIn = 7)
        .collect().head.getMap[String, Long](0).toMap
      assert(a === b && a === direct)
    } finally cached.unpersist()
  }

  test("bucketed rollup table re-aggregates with NO shuffle (bucket co-location)") {
    spark.sql("DROP TABLE IF EXISTS monthly_rollup_bucketed")
    // a stale location survives metastore resets (fresh derby after clean)
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File("/tmp/graft_warehouse/monthly_rollup_bucketed"))
    val monthly = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .groupBy(date_format($"o_orderdate", "yyyy-MM").as("month"))
      .agg(TopnFunctions.topn_add_agg($"o_custkey".cast("string"), 2000000).as("sketch"))
    monthly.write
      .bucketBy(4, "month").sortBy("month")
      .mode("overwrite")
      .saveAsTable("monthly_rollup_bucketed")

    val reagg = spark.table("monthly_rollup_bucketed")
      .groupBy($"month")
      .agg(TopnFunctions.topn_union_agg($"sketch", 2000000).as("merged"))

    val plan = reagg.queryExecution.explainString(FormattedMode)
    assert(!plan.contains("Exchange"),
      s"bucketed re-aggregation must not shuffle:\n$plan")
    // and it still computes the right thing
    assert(reagg.count() === monthly.count())
  }

  private def dailyRollup = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    .groupBy(date_format($"o_orderdate", "yyyy-MM-dd").as("day"))
    .agg(TopnFunctions.topn_add_agg($"o_custkey".cast("string"), 2000000).as("sketch"))

  private def flattened(df: org.apache.spark.sql.DataFrame) =
    df.select($"day", explode($"sketch").as(Seq("item", "frequency")))

  test("wide-frame sliding union equals the range-join form at several widths") {
    val daily = dailyRollup.cache()
    try {
      // widths that exercise every stitch case: w=1 (every frame is its own
      // block), a mid width where most frames straddle two blocks, the
      // block-end/same-block boundary, and w > #periods (pure cumulative
      // prefix within one giant block never completed — all frames partial)
      val periods = daily.count().toInt
      // the 100000 width pins the clamped-sequence contract: a frame far
      // wider than the period count must stay O(periods^2) work, not
      // materialize a frameRows-length array per period
      for (w <- Seq(1, 7, 13, 30, 90, 365, periods + 10, 100000)) {
        val expected = flattened(
          Rollups.slidingUnion(daily, "day", "sketch", w, 2000000))
        val got = flattened(
          Rollups.slidingUnionWideFrame(daily, "day", "sketch", w, 2000000))
        assert(got.exceptAll(expected).count() === 0 &&
          expected.exceptAll(got).count() === 0,
          s"wide-frame result diverged from the range-join form at frameRows=$w")
      }
    } finally daily.unpersist()
  }

  test("slidingMerge dispatches by the measured crossover and is form-equal on both sides of it") {
    val daily = dailyRollup.cache()
    try {
      // straddle the crossover: w just below dispatches to the range-join
      // form, w at/above to the block decomposition — and the results are
      // identical either way (the dispatch may only change the plan shape)
      val below = Rollups.SlidingMergeCrossover - 1
      val above = Rollups.SlidingMergeCrossover
      for ((w, wantWide) <- Seq(below -> false, above -> true)) {
        val merged = Rollups.slidingMerge(daily, "day", "sketch", w, 2000000)
        val plan = merged.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        // the block column is the decomposition's signature; the range-join
        // form never synthesizes it
        assert(plan.contains("__blk") === wantWide,
          s"slidingMerge(frameRows=$w) dispatched to the wrong form")
        val expected = flattened(
          Rollups.slidingUnion(daily, "day", "sketch", w, 2000000))
        val got = flattened(merged)
        assert(got.exceptAll(expected).count() === 0 &&
          expected.exceptAll(got).count() === 0,
          s"slidingMerge diverged from the range-join form at frameRows=$w")
      }
    } finally daily.unpersist()
  }

  test("wide-frame sliding union pre-merges multi-row-per-period input") {
    // per-group partials: several sketch rows per day, as a per-category
    // rollup table would hold — the operator must fold them into the frame
    val perGroup = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .groupBy(date_format($"o_orderdate", "yyyy-MM-dd").as("day"),
        $"o_orderpriority")
      .agg(TopnFunctions.topn_add_agg($"o_custkey".cast("string"), 2000000).as("sketch"))
    val expected = flattened(
      Rollups.slidingUnion(perGroup, "day", "sketch", 7, 2000000))
    val got = flattened(
      Rollups.slidingUnionWideFrame(perGroup, "day", "sketch", 7, 2000000))
    assert(got.exceptAll(expected).count() === 0 &&
      expected.exceptAll(got).count() === 0)
  }

  test("persisted PQ index: probe prunes to the probed cell partitions") {
    import graft.pipeline.{IVF, Pq}
    val rnd = new scala.util.Random(53)
    val data = (0 until 400).map(i =>
      (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
    val df = data.toDF("vec_id", "embedding")
    val ivf = IVF.train(df, "vec_id", "embedding", k = 8, sampleSize = 400)
    val pq = Pq.train(df, "vec_id", "embedding", m = 4, ks = 8, sampleSize = 400)
    val path = java.nio.file.Files.createTempDirectory("pq-index").toString + "/idx"
    Pq.saveIndex(df, "vec_id", "embedding", pq, ivf, path)

    // the cell= layout must exist and the probe read must partition-prune
    val cellDirs = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cell=")).map(_.getName).toSet
    assert(cellDirs.nonEmpty && cellDirs.size <= 8)

    val qs = df.filter($"vec_id" < 5)
    val got = Pq.searchIndex(path, qs, "vec_id", "embedding", k = 5,
      pq, ivf, nprobe = 2, rerank = 20, rerankWith = Some(df))
    val inMem = Pq.topK(df, qs, "vec_id", "embedding", k = 5,
      pq, ivf, nprobe = 2, rerank = 20)
    assert(got.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ===
      inMem.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet,
      "persisted-index probe must equal the in-memory plan")

    // partition pruning is visible in the scan: a cell IN (...) partition
    // filter, and fewer partitions read than exist on disk (5 queries x
    // nprobe 2 cannot touch all 8 cells here — verified below)
    val touched = qs
      .select(explode(IVF.cells($"embedding", ivf, 2)).as("cell"))
      .distinct().count()
    assert(touched < cellDirs.size,
      "fixture must leave untouched cells or the pruning claim is vacuous")
    val p = Pq.searchIndex(path, qs, "vec_id", "embedding", k = 5,
        pq, ivf, nprobe = 2)
      .queryExecution.explainString(FormattedMode)
    val pf = p.linesIterator.filter(_.contains("PartitionFilters")).toSeq
    assert(pf.exists(l => l.contains("cell") && l.contains(" IN ")),
      s"probe scan must carry a cell IN partition filter; got: $pf")
  }

  test("decayedUnion equals transparent per-item shift-and-sum, zeros dropped") {
    // periods 0..5, item counts chosen so half-life 1 exercises shifts
    // 0..5 incl. floor behavior (odd counts) and full decay to zero
    val rows = for {
      p <- 0L to 5L
      (item, c) <- Seq("a" -> (10L + p), "b" -> 3L, "c" -> 1L)
    } yield (p, item, c)
    val rollup = rows.toDF("midx", "item", "c")
      .groupBy($"midx")
      .agg(map_from_entries(collect_list(struct($"item", $"c"))).as("s"))
    val got = Rollups.decayedUnion(rollup, "midx", "s", halfLifePeriods = 1,
        numCounters = 2000000)
      .select(explode($"s").as(Seq("item", "freq")))
      .as[(String, Long)].collect().toMap
    val want = rows.groupBy(_._2).map { case (item, rs) =>
      item -> rs.map { case (p, _, c) => c >> (5L - p).toInt }.sum
    }.filter(_._2 > 0)
    assert(got === want)
    // "c" decays to zero everywhere except age 0 -> exactly 1 survives
    assert(got("c") === 1L)
    // half-life 2: ages 0..5 -> shifts 0,0,1,1,2,2
    val got2 = Rollups.decayedUnion(rollup, "midx", "s", halfLifePeriods = 2,
        numCounters = 2000000)
      .select(explode($"s").as(Seq("item", "freq")))
      .as[(String, Long)].collect().toMap
    val want2 = rows.groupBy(_._2).map { case (item, rs) =>
      item -> rs.map { case (p, _, c) => c >> ((5L - p) / 2L).toInt }.sum
    }.filter(_._2 > 0)
    assert(got2 === want2)
    // an age far beyond the 62-bit clamp must not wrap the shift
    val far = (Seq((0L, "a", 100L), (1000L, "a", 7L)))
      .toDF("midx", "item", "c")
      .groupBy($"midx")
      .agg(map_from_entries(collect_list(struct($"item", $"c"))).as("s"))
    val gotFar = Rollups.decayedUnion(far, "midx", "s", halfLifePeriods = 1,
        numCounters = 2000000)
      .select(explode($"s").as(Seq("item", "freq")))
      .as[(String, Long)].collect().toMap
    assert(gotFar === Map("a" -> 7L),
      "the age-0 count survives; the 1000-period-old one shifts to zero, not to garbage")
  }
}
