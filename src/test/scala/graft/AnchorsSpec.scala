package graft

import graft.pipeline.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AnchorsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def anchors1(html: String): Seq[(String, String)] =
    Seq(html).toDF("h")
      .select(explode(TextAnalysis.htmlAnchors($"h")).as("a"))
      .select($"a.href", $"a.text").as[(String, String)].collect().toSeq

  test("golden: pairs in document order, all quoting forms") {
    assert(anchors1(
      """x<a href="https://a/1">one</a>y<a href='https://b/2'>two</a><a href=https://c/3 rel=nofollow>three</a>""") ===
      Seq(("https://a/1", "one"), ("https://b/2", "two"), ("https://c/3", "three")))
  }

  test("golden: no-href and empty-href anchors yield no pair; no anchors -> empty") {
    assert(anchors1("""<a name="x">skip</a><a href="">skip</a><a href="/k">keep</a>""") ===
      Seq(("/k", "keep")))
    assert(anchors1("<p>nothing here</p>") === Seq())
  }

  test("golden: inner tags stripped, whitespace collapsed, entities NOT decoded") {
    assert(anchors1("""<a href="/x">Visit <b>the&amp;Portal</b>
        |  page <img src="i.png"> now </a>""".stripMargin) ===
      Seq(("/x", "Visit the&amp;Portal page now")))
  }

  test("golden: close-tag boundary (</a >, </A>), not </ab>") {
    assert(anchors1("""<a href="/1">one</a ><a href="/2">two</A>""") ===
      Seq(("/1", "one"), ("/2", "two")))
    // </ab> is NOT a close: text runs to the real close, tag stripped
    assert(anchors1("""<a href="/1">one</ab>more</a>""") ===
      Seq(("/1", "onemore")))
  }

  test("golden: unterminated anchor takes text to end of input") {
    assert(anchors1("""<a href="/u">tail text <b>bold""") ===
      Seq(("/u", "tail text bold")))
  }

  test("golden: nested <a> is stripped, not re-extracted; scan resumes after close") {
    assert(anchors1("""<a href="/outer">out <a href="/inner">in</a><a href="/next">nx</a>""") ===
      Seq(("/outer", "out in"), ("/next", "nx")))
  }

  test("href agrees element-for-element with html_links on adversarial markup") {
    val docs = Seq(
      """<a href="/a">1</a><a name=x>n</a><a href='/b'>2</a>""",
      """<a  HREF = "/c" >3</a><a href=>bad</a><a href=/d>4""",
      """<p><a href="/e">5<b>6</b></a></p>junk<a""",
      "no anchors at all",
      """<a href="/f">unterminated""").toDF("h")
    val fromAnchors = docs
      .select(TextAnalysis.htmlAnchors($"h").as("as"))
      .select(expr("transform(as, a -> a.href)").as("hs"))
      .as[Seq[String]].collect().toSeq
    val fromLinks = docs
      .select(TextAnalysis.htmlLinks($"h").as("hs"))
      .as[Seq[String]].collect().toSeq
    assert(fromAnchors === fromLinks)
  }

  test("SQL surface and null/type behavior") {
    TopnFunctions.register(spark)
    val r = spark.sql(
      """SELECT html_anchors('<a href="/x">t</a>') AS a""")
      .select(expr("a[0].href"), expr("a[0].text")).as[(String, String)].head()
    assert(r === ("/x", "t"))
    assert(Seq(Option.empty[String]).toDF("h")
      .select(TextAnalysis.htmlAnchors($"h")).first().isNullAt(0))
    val e = intercept[Exception](
      spark.sql("SELECT html_anchors(42)").collect())
    assert(e.getMessage.contains("html_anchors"))
  }
}
