package graft

import graft.pipeline.Recrawl
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class RecrawlSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def snaps(rows: Seq[(Long, String, Long, String)]): DataFrame =
    rows.toDF("id", "url", "ts", "content")

  test("keepLatest: newest per canonical URL, ties broken by id, n_versions counted") {
    val df = snaps(Seq(
      (1L, "https://a.com/p?utm_source=x", 10L, "v0"),
      (2L, "https://a.com/p", 20L, "v1"),
      (3L, "https://a.com/p#frag", 20L, "v2"), // ts tie -> id 3 wins
      (4L, "https://b.com/q", 5L, "only")))
    val kept = Recrawl.keepLatest(df, "url", "ts", "id")
      .select($"url_norm", $"id", $"n_versions")
      .as[(String, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(kept === Seq(("https://a.com/p", 3L, 3L), ("https://b.com/q", 4L, 1L)))
  }

  test("changeLog: new / changed / unchanged, null-safe content compare") {
    val df = Seq(
      (1L, "https://a.com/p", 1L, Some("x")),
      (2L, "https://a.com/p", 2L, Some("x")),
      (3L, "https://a.com/p", 3L, Some("y")),
      (4L, "https://a.com/p", 4L, None),
      (5L, "https://a.com/p", 5L, None),
      (6L, "https://a.com/p", 6L, Some("y")))
      .toDF("id", "url", "ts", "content")
    val got = Recrawl.changeLog(df, "url", "ts", "id", "content")
      .orderBy($"id").select($"status").as[String].collect().toSeq
    assert(got === Seq("new", "unchanged", "changed", "changed", "unchanged", "changed"))
  }

  test("parity with a sequential reference on randomized snapshot histories") {
    val rnd = new Random(42)
    val rows = (0 until 400).map { i =>
      val page = rnd.nextInt(40)
      val ts = rnd.nextInt(8).toLong
      val decorated = if (rnd.nextBoolean()) s"https://p$page.com/d?fbclid=$i" else s"https://p$page.com/d"
      (i.toLong, decorated, ts, s"c${rnd.nextInt(3)}")
    }
    val df = snaps(rows).repartition(7)
    // reference: canonical key is the tracking-param-free spelling
    val byPage = rows.groupBy { case (_, url, _, _) => url.takeWhile(_ != '?') }
      .map { case (k, vs) => k -> vs.sortBy(v => (v._3, v._1)) }
    val refLatest = byPage.map { case (k, vs) => k -> (vs.last._1, vs.length.toLong) }
    val gotLatest = Recrawl.keepLatest(df, "url", "ts", "id")
      .select($"url_norm", $"id", $"n_versions")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(gotLatest === refLatest)
    val refStatus = byPage.values.flatMap { vs =>
      vs.zipWithIndex.map { case ((id, _, _, c), i) =>
        id -> (if (i == 0) "new"
        else if (vs(i - 1)._4 == c) "unchanged" else "changed")
      }
    }.toMap
    val gotStatus = Recrawl.changeLog(df, "url", "ts", "id", "content")
      .select($"id", $"status").as[(Long, String)].collect().toMap
    assert(gotStatus === refStatus)
  }

  test("guards: missing and reserved columns") {
    val df = snaps(Seq((1L, "https://a.com", 1L, "x")))
    intercept[IllegalArgumentException](Recrawl.keepLatest(df, "nope", "ts", "id"))
    intercept[IllegalArgumentException](
      Recrawl.keepLatest(df.withColumn("url_norm", lit("u")), "url", "ts", "id"))
    intercept[IllegalArgumentException](
      Recrawl.keepLatest(df.withColumn("n_versions", lit(1)), "url", "ts", "id"))
    intercept[IllegalArgumentException](
      Recrawl.changeLog(df.withColumn("status", lit("s")), "url", "ts", "id", "content"))
    intercept[IllegalArgumentException](
      Recrawl.changeLog(df, "url", "ts", "id", "nope"))
  }

  test("canonical override: absolute declaration fuses mirrors, relative/junk falls back") {
    // main page fetched directly (id 1), via a mirror declaring the
    // absolute canonical (id 2), via a mirror with a RELATIVE declaration
    // (id 3 — must stay its own key), and an unrelated page (id 4)
    val df = Seq(
      (1L, 10L, "https://h.io/p?x=1", "", "v1"),
      (2L, 20L, "https://m.io/mirror", "https://h.io/p?x=1", "v2"),
      (3L, 30L, "https://m2.io/mirror", "/p", "v3"),
      (4L, 40L, "https://other.io/q", "", "v4"))
      .toDF("id", "ts", "url", "canonical", "content")
    val kept = Recrawl.keepLatest(df, "url", "ts", "id", Some("canonical"))
      .select($"url_norm", $"id", $"n_versions")
      .as[(String, Long, Long)].collect().toSet
    assert(kept === Set(
      ("https://h.io/p?x=1", 2L, 2L),   // mirror fused in; newest (ts 20) wins
      ("https://m2.io/mirror", 3L, 1L), // relative declaration ignored
      ("https://other.io/q", 4L, 1L)))
    // without the override the mirror is its own key — the fixture is
    // non-vacuous
    val plain = Recrawl.keepLatest(df, "url", "ts", "id")
      .select($"url_norm").as[String].collect().toSet
    assert(plain.size === 4)
    // changeLog sees the fused history in ts order
    val statuses = Recrawl.changeLog(df, "url", "ts", "id", "content", Some("canonical"))
      .select($"id", $"status").as[(Long, String)].collect().toMap
    assert(statuses === Map(1L -> "new", 2L -> "changed", 3L -> "new", 4L -> "new"))
    intercept[IllegalArgumentException](
      Recrawl.keepLatest(df, "url", "ts", "id", Some("nope")))
  }
}
