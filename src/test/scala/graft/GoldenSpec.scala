package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * 1:1 ports of the reference's pg_regress suites on the FIXTURES.md
 * fixtures (reference: sql/add_agg.sql, union_agg.sql, add_union_tests.sql,
 * char_tests.sql; goldens in the expected/ dir). Frequencies and fixtures are
 * the reference's own; ordering follows our pinned total order
 * (freq desc, item asc) since the reference leaves ties unspecified
 * (SURVEY §2.8.1).
 */
class GoldenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def withN[A](n: Int)(f: => A): A = {
    spark.conf.set(GraftConf.NumberOfCountersKey, n.toString)
    try f finally spark.conf.set(GraftConf.NumberOfCountersKey, "1000")
  }

  private def topnRows(df: org.apache.spark.sql.DataFrame, itemCol: String, k: Int): Seq[(String, Long)] =
    df.agg(TopnFunctions.topn_add_agg(col(itemCol)).as("s"))
      .select(explode(TopnFunctions.topn($"s", lit(k))).as("r"))
      .select($"r.item", $"r.frequency").as[(String, Long)].collect().toSeq

  // strings fixture: NULL×30, '0'×2, '1'×1, '2'×15000, '3'×20, '4'×6,
  // '5'×70000 (reference sql/add_agg.sql:19-29)
  private def stringsDf = {
    val values = Seq.fill(30)(null.asInstanceOf[String]) ++
      Seq.fill(2)("0") ++ Seq("1") ++ Seq.fill(15000)("2") ++
      Seq.fill(20)("3") ++ Seq.fill(6)("4") ++ Seq.fill(70000)("5")
    values.toDF("text_column")
  }

  test("add_agg over skewed strings at n=4 (expected/add_agg.out)") {
    withN(4) {
      assert(topnRows(stringsDf, "text_column", 4) ===
        Seq(("5", 70000L), ("2", 15000L), ("3", 20L), ("4", 6L)))
    }
  }

  test("add_agg over PG-normalized cidr/inet text forms (expected/add_agg.out:180-194)") {
    // same frequency profile as strings, over normalized cidr strings
    val cidrs = Seq("10.1.2.3/32", "192.168.2.1/24", "192.168.100.128/23",
      "192.168.0.0/24", "10.1.0.0/16", "::ffff:1.2.3.0/120")
    val freqs = Seq(2, 1, 15000, 20, 6, 70000)
    val df = cidrs.zip(freqs).flatMap { case (c, f) => Seq.fill(f)(c) }
      .toDF("cidr_column")
    withN(4) {
      assert(topnRows(df, "cidr_column", 4) ===
        Seq(("::ffff:1.2.3.0/120", 70000L), ("192.168.100.128/23", 15000L),
          ("192.168.0.0/24", 20L), ("10.1.0.0/16", 6L)))
    }
  }

  test("union_agg mid-suite SET rebinding + sketch-size introspection (union_agg.sql:8,26,41)") {
    // per-key sketches built at n=10, then re-read at n=6: the union prunes
    // to 6; jsonb_each+count introspection = explode(map)+count
    val slices = (1 to 9).map(i => Map(s"item$i" -> (i * 10L)))
    val stored = slices.toDF("topn_column")
    stored.createOrReplaceTempView("temp_table")
    withN(10) {
      val full = spark.sql("SELECT topn_union_agg(topn_column) AS s FROM temp_table")
        .select(explode($"s")).count()
      assert(full === 9)
    }
    withN(6) {
      val pruned = spark.sql("SELECT topn_union_agg(topn_column) AS s FROM temp_table")
        .select(explode($"s").as(Seq("item", "frequency")))
        .as[(String, Long)].collect().toSeq.sortBy(-_._2)
      assert(pruned.size === 6)
      assert(pruned === (9 to 4 by -1).map(i => (s"item$i", i * 10L)))
    }
  }

  test("add_union_tests: sequential scalar fold equals the aggregate (add_union_tests.sql)") {
    // fold 500 items one at a time through topn_add, like the reference's
    // PL/pgSQL loops, and compare against topn_add_agg over the same items
    val items = (0 until 500).map(i => s"k${i % 7}")
    val viaScalar = items.foldLeft(Map.empty[String, Long]) { (sketch, item) =>
      val df = Seq((sketch, item)).toDF("s", "i")
      df.select(TopnFunctions.topn_add($"s", $"i").as("out"))
        .collect().head.getMap[String, Long](0).toMap
    }
    val viaAgg = items.toDF("t")
      .agg(TopnFunctions.topn_add_agg($"t")).collect().head
      .getMap[String, Long](0).toMap
    assert(viaScalar === viaAgg)
  }

  test("char_tests round-trip: topn output items feed back as input (char_tests.sql:237-244)") {
    val nasty = Seq("'\"\"\t", "ёъяшер", "中文测试", "\b\f\t\\'\"", "ab")
    val df = nasty.flatMap(s => Seq.fill(4)(s)).toDF("t")
    val round1 = df.agg(TopnFunctions.topn_add_agg($"t").as("s"))
      .select(explode(TopnFunctions.topn($"s", lit(5))).as("r"))
      .select($"r.item")
    // feed the extracted items back through another aggregation
    val round2 = round1.agg(TopnFunctions.topn_add_agg($"item").as("s"))
      .select(explode(TopnFunctions.topn($"s", lit(5))).as("r"))
      .select($"r.item").as[String].collect().toSet
    assert(round2 === nasty.toSet)
  }

  test("char_tests Cyrillic corpus with reference frequencies (char_tests.sql)") {
    // FIXTURES.md: ёъяшер×10, тыуио×20, пющ×12, эасдфгч×30, кйльжзхцвбнм×35
    val corpus = Seq("ёъяшер" -> 10, "тыуио" -> 20, "пющ" -> 12,
      "эасдфгч" -> 30, "кйльжзхцвбнм" -> 35)
    val df = corpus.flatMap { case (s, c) => Seq.fill(c)(s) }.toDF("t")
    withN(4) {
      val out = topnRows(df, "t", 4)
      assert(out === Seq(("кйльжзхцвбнм", 35L), ("эасдфгч", 30L),
        ("тыуио", 20L), ("пющ", 12L)))
    }
    // and the JSONB-canonical rendering orders by BYTE length (Cyrillic is
    // 2 bytes/char: пющ=6B, тыуио=10B, ёъяшер=12B, эасдфгч=14B)
    val json = df.agg(TopnFunctions.topn_add_agg($"t", 100).as("s"))
      .select(TopnFunctions.topn_to_json($"s")).as[String].collect().head
    assert(json ===
      """{"пющ": 12, "тыуио": 20, "ёъяшер": 10, "эасдфгч": 30, "кйльжзхцвбнм": 35}""")
  }

  test("char_tests CJK corpus round-trips with correct frequencies (char_tests.sql)") {
    val corpus = Seq("汉字测试" -> 10, "中文排序" -> 20, "topn混合テスト" -> 12,
      "日本語のキー" -> 30, "한국어키" -> 35)
    val df = corpus.flatMap { case (s, c) => Seq.fill(c)(s) }.toDF("t")
    withN(4) {
      assert(topnRows(df, "t", 4) === Seq(("한국어키", 35L), ("日本語のキー", 30L),
        ("中文排序", 20L), ("topn混合テスト", 12L)))
    }
  }

  test("grouping sets / cube compose with the sketch aggregate (SURVEY §2.5)") {
    val df = Seq(("a", "x", "i1"), ("a", "y", "i1"), ("b", "x", "i2"),
      ("b", "x", "i2"), ("a", "x", "i3")).toDF("g1", "g2", "item")
    df.createOrReplaceTempView("gs_input")
    val out = spark.sql(
      """SELECT g1, g2, topn_to_json(topn_add_agg(item)) AS sketch
        |FROM gs_input GROUP BY CUBE(g1, g2)
        |ORDER BY g1 NULLS FIRST, g2 NULLS FIRST""".stripMargin)
      .as[(String, String, String)].collect().toSeq
    // grand total row: all five items aggregated
    assert(out.head === ((null, null, """{"i1": 2, "i2": 2, "i3": 1}""")))
    // a fully-grouped cell
    assert(out.contains(("b", "x", """{"i2": 2}""")))
    assert(out.length === 8) // 1 total + 2 g1 + 2 g2 + 3 present cells
  }

  test("negative frequencies sort last (reference atol path, topn.c:711-712)") {
    val sk = Map("pos" -> 5L, "neg" -> -3L, "zero" -> 0L)
    val out = Seq(sk).toDF("s")
      .select(explode(TopnFunctions.topn($"s", lit(3))).as("r"))
      .select($"r.item", $"r.frequency").as[(String, Long)].collect().toSeq
    assert(out === Seq(("pos", 5L), ("zero", 0L), ("neg", -3L)))
  }

  test("null_tests: union of NULLs, empties and one sketch = that sketch (expected/null_tests.out)") {
    val rows: Seq[Option[Map[String, Long]]] = Seq(
      None, Some(Map.empty[String, Long]), None,
      Some(Map("SA" -> 1L)), Some(Map.empty[String, Long]))
    val df = rows.toDF("sketch")
    val out = df.agg(TopnFunctions.topn_union_agg($"sketch"))
      .collect().head.getMap[String, Long](0).toMap
    assert(out === Map("SA" -> 1L))
  }
}
