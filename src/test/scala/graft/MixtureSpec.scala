package graft

import graft.expressions.{FixedExp2, FixedLog2}
import graft.pipeline.{Mixture, Sampling}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-9 mixing/ordering additions: the deterministic
  * exp2 kernel (FixedExp2), temperature-scaled mixture weights, and the
  * deterministic training-order shuffle. */
class MixtureSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  // --- FixedExp2 (the deterministic 2^x completing FixedLog2) -------------

  test("FixedExp2 kernel: exact on integers, tracks 2^x, inverts FixedLog2") {
    assert(FixedExp2.exp2(0.0) === 1.0)
    assert(FixedExp2.exp2(1.0) === 2.0)
    assert(FixedExp2.exp2(10.0) === 1024.0)
    assert(FixedExp2.exp2(-2.0) === 0.25)
    assert(FixedExp2.exp2(100.0) === math.pow(2, 100))
    assert(FixedExp2.exp2(-100.0) === math.pow(2, -100))
    assert(FixedExp2.exp2(Double.NaN).isNaN)
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 2000) {
      val x = rnd.nextDouble() * 80.0 - 40.0
      val got = FixedExp2.exp2(x)
      val want = math.pow(2.0, x)
      // 20 truncated fraction bits -> relative error below ~2^-19
      assert(math.abs(got - want) / want < 3e-6, s"x=$x got=$got want=$want")
    }
    for (_ <- 1 to 500) {
      // n^1 round trip: exp2(log2(n)) stays within the truncation band
      val n = 1.0 + rnd.nextInt(1000000)
      val rt = FixedExp2.exp2(FixedLog2.log2(n))
      assert(math.abs(rt - n) / n < 3e-6, s"n=$n roundtrip=$rt")
    }
  }

  test("FixedExp2 is callable from SQL and matches the kernel") {
    TopnFunctions.register(spark)
    val got = spark.sql("SELECT fixed_exp2(CAST(2.5 AS DOUBLE)) AS ex")
      .head.getDouble(0)
    assert(got === FixedExp2.exp2(2.5))
    val e = intercept[Exception](
      spark.sql("SELECT fixed_exp2('x')").collect())
    assert(e.getMessage.contains("fixed_exp2 requires DOUBLE"))
  }

  test("FixedExp2 SQL chain replays the kernel bit-for-bit") {
    val rnd = new scala.util.Random(23)
    val xs = Seq(0.0, 1.0, -1.0, 2.5, 0.5, -0.75, 19.999, -19.999, 40.0,
      -40.0, 127.0, -127.0) ++
      (1 to 50).map(_ => rnd.nextDouble() * 80.0 - 40.0)
    xs.zipWithIndex.map { case (x, i) => (i.toLong, x) }
      .toDF("id", "x").createOrReplaceTempView("fixedexp_input")
    val (stages, fin) = FixedExp2.sqlCtes("q", "src", "x", Seq("id"))
    // Spark SQL executes the generated chain with the same IEEE ops the
    // DuckDB oracle runs; equality with the kernel validates every stage
    val got = spark.sql(
      s"WITH src AS (SELECT id, x FROM fixedexp_input),\n$stages\n" +
        s"SELECT id, ex FROM $fin")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    xs.zipWithIndex.foreach { case (x, i) =>
      assert(got(i.toLong) === FixedExp2.exp2(x), s"x=$x")
    }
  }

  // --- temperature mixture weights ----------------------------------------

  /** Reference temperature weights: the same fixed-point recipe over
    * plain collections. */
  private def refTemperature(
      groups: Map[String, Long], alphaNum: Int, alphaDen: Int)
      : Map[String, (Long, Long, Option[Long])] = {
    val total = groups.values.sum
    val wE6 = groups.map { case (g, n) =>
      g -> math.floor(1e6 * FixedExp2.exp2(
        (alphaNum.toDouble * FixedLog2.log2(n.toDouble)) / alphaDen.toDouble))
        .toLong
    }
    val wTot = wE6.values.sum
    def ppm(num: Long, den: Long): Long =
      math.floor((1000000.0 * num.toDouble) / den.toDouble).toLong
    groups.map { case (g, n) =>
      val share = ppm(n, total)
      val temp = ppm(wE6(g), wTot)
      val rate = if (share == 0L) None else Some(ppm(temp, share))
      g -> ((share, temp, rate))
    }
  }

  test("temperatureWeights matches the plain-Scala fixed-point reference") {
    val rows = Seq.tabulate(1000)(i => (i.toLong,
      if (i < 700) "web" else if (i < 950) "books" else "code"))
    val df = rows.toDF("doc_id", "source")
    for ((an, ad) <- Seq((1, 2), (3, 10), (7, 10), (1, 1))) {
      val got = Mixture.temperatureWeights(df, "source", an, ad)
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3),
            if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
      val want = refTemperature(
        Map("web" -> 700L, "books" -> 250L, "code" -> 50L), an, ad)
      assert(got.keySet === want.keySet, s"alpha=$an/$ad")
      want.foreach { case (g, (share, temp, rate)) =>
        val (n, gShare, gTemp, gRate) = got(g)
        assert(n === Map("web" -> 700L, "books" -> 250L, "code" -> 50L)(g))
        assert(gShare === share, s"$g share alpha=$an/$ad")
        assert(gTemp === temp, s"$g temp share alpha=$an/$ad")
        assert(gRate === rate, s"$g rate alpha=$an/$ad")
      }
    }
  }

  test("temperatureWeights flattens: alpha<1 upsamples the tail, alpha=1 is natural") {
    val rows = Seq.tabulate(1000)(i => (i.toLong, if (i < 990) "head" else "tail"))
    val df = rows.toDF("doc_id", "source")
    val nat = Mixture.temperatureWeights(df, "source", 1, 1)
      .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
    // alpha = 1: every group's rate is ~1e6 (floor slack only)
    assert(nat.values.forall(r => r >= 999000L && r <= 1000000L), s"$nat")
    val flat = Mixture.temperatureWeights(df, "source", 1, 2)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(3), r.getLong(4)))).toMap
    // alpha = 1/2: tail's temperature share and rate both rise
    assert(flat("tail")._1 > 10000L, s"tail temp share should exceed natural: $flat")
    assert(flat("tail")._2 > 1000000L, s"tail should upsample: $flat")
    assert(flat("head")._2 < 1000000L, s"head should downsample: $flat")
    // shares always sum to ~1e6 (floor slack below one ppm per group)
    val temps = Mixture.temperatureWeights(df, "source", 1, 2)
      .agg(sum("temp_share_ppm")).head.getLong(0)
    assert(temps >= 999998L && temps <= 1000000L)
  }

  test("temperatureWeights: weightCol weighs by tokens; zero-weight groups drop") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 30L), (3L, "b", 60L), (4L, "c", 0L))
      .toDF("doc_id", "source", "n_tokens")
    val got = Mixture.temperatureWeights(df, "source", 1, 1, Some("n_tokens"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 40L, "b" -> 60L)) // c: zero weight, dropped
    intercept[IllegalArgumentException](
      Mixture.temperatureWeights(df, "source", 2, 1))
    intercept[IllegalArgumentException](
      Mixture.temperatureWeights(df, "source", 0, 1))
  }

  test("temperature SQL CTE chain replays temperatureWeights bit-for-bit") {
    val rows = Seq.tabulate(500)(i => (i.toLong,
      if (i < 400) "web" else if (i < 480) "books" else "code"))
    rows.toDF("doc_id", "source").createOrReplaceTempView("mix_input")
    val (stages, fin) = Mixture.temperatureSqlCtes(
      "mix_src", "source", "1", 3, 10)
    val sql = spark.sql(
      s"WITH mix_src AS (SELECT * FROM mix_input),\n$stages\n" +
        s"SELECT grp, n, share_ppm, temp_share_ppm, rate_ppm FROM $fin ORDER BY grp")
      .collect().map(_.toSeq).toSeq
    val op = Mixture.temperatureWeights(
      spark.table("mix_input"), "source", 3, 10)
      .orderBy("grp").collect().map(_.toSeq).toSeq
    assert(sql === op)
  }

  test("ratePercents floors to integer percent, clamps, and caps null rates") {
    val weights = Seq(
      ("web", 100L, 500000L, 350000L, Some(700000L)),   // 0.7 -> 70
      ("books", 100L, 400000L, 520000L, Some(1300000L)), // 1.3 -> 130
      ("rare", 100L, 100000L, 130000L, Some(99999999L)), // clamped
      ("dust", 100L, 0L, 1L, None))                      // null -> cap
      .toDF("grp", "n", "share_ppm", "temp_share_ppm", "rate_ppm")
      .withColumn("rate_ppm", col("rate_ppm").cast("long"))
    val pct = Mixture.ratePercents(weights, maxPct = 1000)
    assert(pct === Map("web" -> 70, "books" -> 130, "rare" -> 1000,
      "dust" -> 1000))
    intercept[IllegalArgumentException](Mixture.ratePercents(weights, -1))
  }

  // --- deterministic training-order shuffle -------------------------------

  test("shuffleOrder: a permutation, deterministic, salt-sensitive, balanced") {
    val df = (0L until 2000L).toDF("doc_id")
    val out = Sampling.shuffleOrder(df, "doc_id", 8, salt = 1L)
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // every row appears once, (shard, pos) is a key, pos is 1..shardSize
    assert(out.length === 2000)
    assert(out.map(_._1).distinct.length === 2000)
    assert(out.map(t => (t._2, t._3)).distinct.length === 2000)
    val byShard = out.groupBy(_._2)
    assert(byShard.keySet.subsetOf((0 until 8).toSet))
    byShard.values.foreach { rows =>
      assert(rows.map(_._3).sorted === (1 to rows.length))
      // shard sizes balanced within 3x of even
      assert(rows.length > 2000 / 8 / 3 && rows.length < 2000 / 8 * 3)
    }
    // a pure function of (id, salt): rerun is identical
    val again = Sampling.shuffleOrder(df, "doc_id", 8, salt = 1L)
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(again.toSet === out.toSet)
    // a different salt is a different permutation
    val other = Sampling.shuffleOrder(df, "doc_id", 8, salt = 2L)
      .select("doc_id", "shard", "pos")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(other.toSet !== out.toSet)
    // and the order is actually shuffled: within a shard, visiting by pos
    // does not visit ids in id order
    val firstShard = out.filter(_._2 === out.head._2).sortBy(_._3).map(_._1)
    assert(firstShard !== firstShard.sorted)
  }

  test("shuffleOrder SQL expressions replay the operator bit-for-bit") {
    val df = (0L until 300L).toDF("doc_id")
    df.createOrReplaceTempView("shuffle_input")
    // the generated SQL is DuckDB dialect; `//` (floor div) becomes Spark's
    // DIV — identical on the non-negative operands the rank mix guarantees
    val (shardDuck, rankDuck) = Sampling.shuffleOrderSql("doc_id", 7, salt = 3L)
    val (shardSql, rankSql) = (shardDuck.replace("//", " DIV "),
      rankDuck.replace("//", " DIV "))
    val sql = spark.sql(
      s"""SELECT doc_id, $shardSql AS shard,
         |  CAST(ROW_NUMBER() OVER (
         |    PARTITION BY $shardSql ORDER BY $rankSql, doc_id) AS INT) AS pos
         |FROM shuffle_input ORDER BY doc_id""".stripMargin)
      .collect().map(_.toSeq).toSeq
    val op = Sampling.shuffleOrder(df, "doc_id", 7, salt = 3L)
      .select("doc_id", "shard", "pos").orderBy("doc_id")
      .collect().map(_.toSeq).toSeq
    assert(sql === op)
    intercept[IllegalArgumentException](Sampling.shuffleOrder(df, "doc_id", 0))
    val clash = df.withColumn("shard", lit(1))
    intercept[IllegalArgumentException](
      Sampling.shuffleOrder(clash, "doc_id", 4))
  }
}
