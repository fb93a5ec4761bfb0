package graft

import graft.pipeline.Robots
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RobotsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val Agent = "graftbot"

  private def rulesOf(txt: String, agent: String = Agent): Seq[(Int, String)] =
    Robots.parseRules(Seq(("h", txt)).toDF("host", "robots_txt"), agent)
      .select($"rule_allow", $"pattern")
      .as[(Int, String)].collect().toSeq.sorted

  private def verdicts(txt: String, urls: Seq[String],
      agent: String = Agent): Seq[Boolean] = {
    val rules = Robots.parseRules(
      Seq(("example.com", txt)).toDF("host", "robots_txt"), agent)
    val u = urls.zipWithIndex
      .map { case (url, i) => (i.toLong, s"https://example.com$url") }
      .toDF("id", "url")
    Robots.withRobotsVerdict(u, "url", "id", rules)
      .orderBy($"id").select($"allowed").as[Boolean].collect().toSeq
  }

  /** Plain-Scala reference matcher for one pattern against one path —
    * naive backtracking over '*' segments, '$' anchor, prefix default. */
  private def refMatch(pattern: String, path: String): Boolean = {
    val (core, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true) else (pattern, false)
    val parts = core.split("\\*", -1).toSeq
    def find(segs: Seq[String], pos: Int, first: Boolean): Boolean = segs match {
      case Seq() => !anchored || pos == path.length
      case Seq(last) if anchored =>
        if (first) path.length - pos == last.length && path.startsWith(last, pos)
        else path.length - pos >= last.length && path.endsWith(last) &&
          path.length - last.length >= pos
      case s +: rest =>
        if (first) path.startsWith(s, pos) && find(rest, pos + s.length, first = false)
        else {
          val idx = path.indexOf(s, pos)
          idx >= 0 && find(rest, idx + s.length, first = false)
        }
    }
    find(parts, 0, first = true)
  }

  test("parse: groups, comments, CRLF, unknown fields, empty values") {
    val txt =
      "# header comment\r\n" +
        "User-Agent: graftbot # trailing comment\r\n" +
        "Disallow: /a\r\n" +
        "Crawl-delay: 10\r\n" +       // transparent: must not split the group
        "Allow: /a/b\r\n" +
        "Disallow:\r\n" +             // empty value: no rule
        "\r\n" +
        "User-agent: other\r\n" +
        "Disallow: /everything\r\n"
    assert(rulesOf(txt) === Seq((0, "/a"), (1, "/a/b")))
  }

  test("parse: rules before any user-agent line are dropped") {
    assert(rulesOf("Disallow: /pre\nUser-agent: graftbot\nDisallow: /x") ===
      Seq((0, "/x")))
  }

  test("parse: specific group beats *; agent match is case-insensitive") {
    val txt = "User-agent: *\nDisallow: /star\n\nUser-agent: GraftBot\nDisallow: /mine"
    assert(rulesOf(txt) === Seq((0, "/mine")))
    // an agent with no specific group falls back to the * group
    assert(rulesOf(txt, "otherbot") === Seq((0, "/star")))
  }

  test("parse: multi-UA group headers and multiple matching groups combine") {
    val multi = "User-agent: a\nUser-agent: graftbot\nDisallow: /m"
    assert(rulesOf(multi) === Seq((0, "/m")))
    val two = "User-agent: graftbot\nDisallow: /one\n\nUser-agent: graftbot\nAllow: /two"
    assert(rulesOf(two) === Seq((0, "/one"), (1, "/two")))
    // two * groups combine the same way when no specific group exists
    val twoStar = "User-agent: *\nDisallow: /s1\n\nUser-agent: *\nDisallow: /s2"
    assert(rulesOf(twoStar) === Seq((0, "/s1"), (0, "/s2")))
  }

  test("parse: whitespace around the colon and the field is tolerated") {
    assert(rulesOf("User-agent : graftbot\n   Disallow  :   /sp   ") ===
      Seq((0, "/sp")))
  }

  test("verdict: prefix default, * wildcard, $ anchor") {
    val txt = "User-agent: *\nDisallow: /private\nDisallow: /tmp/*.log$\nDisallow: /exact$"
    assert(verdicts(txt, Seq(
      "/private", "/private/sub", "/privateer",  // prefix semantics
      "/pub",
      "/tmp/a.log", "/tmp/deep/b.log", "/tmp/a.log.bak", // anchored wildcard
      "/exact", "/exact/no")) ===
      Seq(false, false, false, true, false, false, true, false, true))
  }

  test("verdict: longest match wins; allow beats disallow on ties") {
    val txt = "User-agent: *\nDisallow: /d\nAllow: /docs/pub\nDisallow: /tie\nAllow: /tie"
    assert(verdicts(txt, Seq("/docs/x", "/docs/pub/y", "/d", "/tie/z")) ===
      Seq(false, true, false, true))
  }

  test("verdict: no matching rule, no group, and no robots row all allow") {
    assert(verdicts("User-agent: *\nDisallow: /other", Seq("/fine")) === Seq(true))
    assert(verdicts("User-agent: foreignbot\nDisallow: /", Seq("/fine")) === Seq(true))
    val rules = Robots.parseRules(
      Seq(("nothere.com", "User-agent: *\nDisallow: /")).toDF("host", "robots_txt"),
      Agent)
    val u = Seq((1L, "https://unlisted.org/x")).toDF("id", "url")
    assert(Robots.withRobotsVerdict(u, "url", "id", rules)
      .select($"allowed").as[Boolean].head())
  }

  test("verdict: match target is path+query without fragment; bare host is /") {
    val txt = "User-agent: *\nDisallow: /p?x=*&utm\nDisallow: /$"
    val rules = Robots.parseRules(
      Seq(("example.com", txt)).toDF("host", "robots_txt"), Agent)
    val u = Seq(
      (1L, "https://example.com/p?x=1&utm"),
      (2L, "https://example.com/p?x=1&utm#frag"), // fragment excluded -> same
      (3L, "https://example.com"),                // no path -> "/" -> /$ fires
      (4L, "https://example.com/q")).toDF("id", "url")
    assert(Robots.withRobotsVerdict(u, "url", "id", rules)
      .orderBy($"id").select($"allowed").as[Boolean].collect().toSeq ===
      Seq(false, false, false, true))
  }

  test("verdict: paths are case-sensitive, LIKE specials are literal") {
    val txt = "User-agent: *\nDisallow: /Docs\nDisallow: /u_x\nDisallow: /p%y"
    assert(verdicts(txt, Seq("/Docs/1", "/docs/1", "/u_x", "/uax", "/p%y", "/pay")) ===
      Seq(false, true, false, true, false, true))
  }

  test("matching parity vs plain-Scala reference on adversarial patterns") {
    val patterns = Seq("/a", "/a$", "/*a", "*a$", "/a*b*c", "/a*b$", "*", "*$",
      "/a**b", "/%", "/_", "/\\", "/a*", "$", "/*$")
    val paths = Seq("/", "/a", "/ab", "/ba", "/axb", "/axbyc", "/a/b/c",
      "/aab", "/%", "/x", "/_", "/\\", "/a b", "/ab$", "/a$b")
    val cases = for { p <- patterns; t <- paths } yield (p, t)
    val rules = Robots.parseRules(
      patterns.zipWithIndex.map { case (p, i) =>
        (s"h$i.com", s"User-agent: *\nDisallow: $p")
      }.toDF("host", "robots_txt"), Agent)
    val urls = cases.zipWithIndex.map { case ((p, t), i) =>
      (i.toLong, s"https://h${patterns.indexOf(p)}.com$t")
    }.toDF("id", "url")
    val got = Robots.withRobotsVerdict(urls, "url", "id", rules)
      .orderBy($"id").select($"allowed").as[Boolean].collect().toSeq
    val want = cases.map { case (p, t) => !refMatch(p, t) }
    for (((c, g), w) <- cases.zip(got).zip(want))
      assert(g === w, s"pattern '${c._1}' vs path '${c._2}'")
  }

  test("matching parity vs reference on 400 random wildcard patterns/paths") {
    // alphabet loads on the translation hazards: LIKE specials (%, _),
    // the escape char, both robots wildcards, and plain letters; no '#'
    // (comment strip) and no whitespace (value trim) — those are grammar
    // features with their own goldens
    val rnd = new scala.util.Random(7)
    val alphabet = "ab*$/%_\\"
    def randStr(n: Int): String =
      (0 until n).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    val cases = (0 until 400).map { i =>
      (i, "/" + randStr(1 + rnd.nextInt(5)), "/" + randStr(rnd.nextInt(8)))
    }
    val rules = Robots.parseRules(
      cases.map { case (i, p, _) =>
        (s"h$i.com", s"User-agent: *\nDisallow: $p")
      }.toDF("host", "robots_txt"), Agent)
    val urls = cases.map { case (i, _, t) => (i.toLong, s"https://h$i.com$t") }
      .toDF("id", "url")
    val got = Robots.withRobotsVerdict(urls, "url", "id", rules)
      .orderBy($"id").select($"allowed").as[Boolean].collect().toSeq
    for (((i, p, t), g) <- cases.zip(got))
      assert(g === !refMatch(p, t), s"case $i: pattern '$p' vs path '$t'")
    // and the packed spelling agrees case for case
    val packed = Robots.withRobotsVerdictPacked(urls, "url", Robots.packRules(rules))
      .orderBy($"id").select($"allowed").as[Boolean].collect().toSeq
    assert(packed === got)
  }

  test("verdict is repartition-stable and keeps row multiplicity") {
    val txt = "User-agent: *\nDisallow: /blocked"
    val rules = Robots.parseRules(
      Seq(("example.com", txt)).toDF("host", "robots_txt"), Agent)
    val u = (0 until 200)
      .map(i => (i.toLong, s"https://example.com/${if (i % 3 == 0) "blocked" else "ok"}/$i"))
      .toDF("id", "url")
    val base = Robots.withRobotsVerdict(u, "url", "id", rules)
    assert(base.count() === 200)
    assert(base.filter(!$"allowed").count() === 67)
    val shuffled = Robots.withRobotsVerdict(u.repartition(13), "url", "id", rules)
    assert(shuffled.orderBy($"id").select($"id", $"allowed").collect().toSeq ===
      base.orderBy($"id").select($"id", $"allowed").collect().toSeq)
    val gated = Robots.filterDisallowed(u, "url", "id", rules)
    assert(gated.columns.toSeq === Seq("id", "url"))
    assert(gated.count() === 133)
  }

  test("packed-rules verdicts equal the join+agg verdicts everywhere") {
    val robots = Seq(
      ("a.com", "User-agent: *\nDisallow: /d\nAllow: /d/pub\nDisallow: /t*x$\nAllow: /t*x$"),
      ("b.com", "User-agent: graftbot\nDisallow: /\n\nUser-agent: *\nAllow: /"),
      ("c.com", "User-agent: nobody\nDisallow: /")).toDF("host", "robots_txt")
    val rules = Robots.parseRules(robots, Agent)
    val packed = Robots.packRules(rules)
    val urls = (0 until 300).map { i =>
      val host = Seq("a.com", "b.com", "c.com", "unlisted.org")(i % 4)
      val path = Seq("/d/x", "/d/pub/y", "/tzzx", "/ok", "/t-x-not-end")(i % 5)
      (i.toLong, s"https://$host$path")
    }.toDF("id", "url")
    val viaAgg = Robots.withRobotsVerdict(urls, "url", "id", rules)
      .orderBy($"id").select($"id", $"allowed").as[(Long, Boolean)].collect().toSeq
    val viaPacked = Robots.withRobotsVerdictPacked(urls, "url", packed)
      .orderBy($"id").select($"id", $"allowed").as[(Long, Boolean)].collect().toSeq
    assert(viaPacked === viaAgg)
    // and both observe the expected mix of outcomes (not vacuously equal)
    assert(viaAgg.count(!_._2) > 0 && viaAgg.count(_._2) > 0)
    val gated = Robots.filterDisallowedPacked(urls, "url", packed)
    assert(gated.columns.toSeq === Seq("id", "url"))
    assert(gated.count() === viaAgg.count(_._2))
  }

  test("crawlDelays: group-scoped, specific beats *, max across combined groups") {
    val robots = Seq(
      ("a.com", "User-agent: *\nCrawl-delay: 10\n\nUser-agent: graftbot\nDisallow: /x\nCrawl-delay: 4"),
      ("b.com", "User-agent: graftbot\nCrawl-delay: 3\n\nUser-agent: graftbot\nCrawl-delay: 8"),
      ("c.com", "User-agent: otherbot\nCrawl-delay: 99"),          // foreign agent
      ("d.com", "User-agent: *\nCrawl-delay: abc\nCrawl-delay: 2.5"), // non-integer
      ("e.com", "User-agent: *\nCrawl-delay: 6"))
      .toDF("host", "robots_txt")
    val got = Robots.crawlDelays(robots, Agent)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a.com" -> 4L, "b.com" -> 8L, "e.com" -> 6L))
  }

  test("crawl-delay is a group member: a UA line after it opens a NEW group") {
    val txt = "User-agent: graftbot\nCrawl-delay: 1\nUser-agent: other\nDisallow: /x"
    // the Disallow belongs to the second (foreign) group, not graftbot's
    assert(rulesOf(txt) === Seq())
    assert(Robots.crawlDelays(
      Seq(("h", txt)).toDF("host", "robots_txt"), Agent)
      .as[(String, Long)].collect().toMap === Map("h" -> 1L))
  }

  test("sitemapsOf: file-scoped, transparent to group boundaries, dedup") {
    val txt = "User-agent: a\nSitemap: https://h/s1.xml\nUser-agent: graftbot\n" +
      "Disallow: /x\nSitemap: https://h/s2.xml\nSitemap: https://h/s1.xml\nSitemap:"
    val robots = Seq(("h", txt)).toDF("host", "robots_txt")
    assert(Robots.sitemapsOf(robots).as[(String, String)].collect().toSet ===
      Set(("h", "https://h/s1.xml"), ("h", "https://h/s2.xml")))
    // sitemap between the UA lines did NOT split the multi-UA header:
    // both agents head ONE group, so graftbot gets the /x rule
    assert(rulesOf(txt) === Seq((0, "/x")))
  }

  test("guards: bad agent, missing columns, reserved columns") {
    val robots = Seq(("h", "User-agent: *\nDisallow: /")).toDF("host", "robots_txt")
    intercept[IllegalArgumentException](Robots.parseRules(robots, "*"))
    intercept[IllegalArgumentException](Robots.parseRules(robots, ""))
    intercept[IllegalArgumentException](
      Robots.parseRules(Seq("x").toDF("host"), Agent))
    val rules = Robots.parseRules(robots, Agent)
    val u = Seq((1L, "https://h/x")).toDF("id", "url")
    intercept[IllegalArgumentException](
      Robots.withRobotsVerdict(u, "nope", "id", rules))
    intercept[IllegalArgumentException](
      Robots.withRobotsVerdict(u.withColumn("path", lit("x")), "url", "id", rules))
    intercept[IllegalArgumentException](
      Robots.withRobotsVerdict(u, "url", "id", rules.drop("like_pat")))
  }
}
