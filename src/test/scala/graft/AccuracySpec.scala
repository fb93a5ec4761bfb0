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
}
