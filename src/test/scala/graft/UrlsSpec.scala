package graft

import graft.pipeline.Urls
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class UrlsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private def host1(url: String): String =
    Seq(url).toDF("u").select(Urls.urlHost($"u")).as[String].head()

  private def domain1(host: String): String =
    Seq(host).toDF("h").select(Urls.registeredDomain($"h")).as[String].head()

  private def norm1(url: String): String =
    Seq(url).toDF("u").select(Urls.urlNormalize($"u")).as[String].head()

  test("urlHost: authority extract, userinfo/port strip, lowercase") {
    assert(host1("https://Example.COM/a/b") === "example.com")
    assert(host1("http://user:pw@News.Site.org:8080/x?q=1") === "news.site.org")
    assert(host1("https://h.io:443") === "h.io")
    assert(host1("ftp://files.example.net/pub") === "files.example.net")
    assert(host1("no scheme here") === "")
    assert(host1("/relative/path") === "")
  }

  test("registeredDomain: eTLD+1 with multi-part suffixes and IP passthrough") {
    assert(domain1("news.example.co.uk") === "example.co.uk")
    assert(domain1("a.b.c.example.com") === "example.com")
    assert(domain1("example.com") === "example.com")
    assert(domain1("localhost") === "localhost")
    assert(domain1("192.168.0.1") === "192.168.0.1")
    assert(domain1("deep.sub.site.com.au") === "site.com.au")
    // co.uk itself has only two labels: passthrough, not truncation
    assert(domain1("co.uk") === "co.uk")
  }

  test("registeredDomain: private-section, wildcard, and exception rules (DefaultRules)") {
    // hosted-platform subdomains are different registrants: each keeps its key
    assert(domain1("alice.github.io") === "alice.github.io")
    assert(domain1("www.alice.github.io") === "alice.github.io")
    assert(domain1("github.io") === "github.io") // IS a suffix: passthrough
    // depth-3 private suffix
    assert(domain1("assets.bucket.s3.amazonaws.com") === "bucket.s3.amazonaws.com")
    assert(domain1("s3.amazonaws.com") === "s3.amazonaws.com")
    // wildcard *.ck: any label under ck is a public suffix
    assert(domain1("shop.foo.ck") === "shop.foo.ck")
    assert(domain1("deep.shop.foo.ck") === "shop.foo.ck")
    assert(domain1("foo.ck") === "foo.ck") // IS a suffix under *.ck
    // exception !www.ck beats the wildcard
    assert(domain1("www.ck") === "www.ck")
    assert(domain1("deep.www.ck") === "www.ck")
    // *.compute.amazonaws.com (depth-3 wildcard base)
    assert(domain1("vm1.ec2.compute.amazonaws.com") === "vm1.ec2.compute.amazonaws.com")
    assert(domain1("a.vm1.ec2.compute.amazonaws.com") === "vm1.ec2.compute.amazonaws.com")
    // the base itself is NOT matched by its *-rule: default rule applies
    assert(domain1("compute.amazonaws.com") === "amazonaws.com")
  }

  test("parsePsl / loadSuffixes: the publicsuffix.org file format") {
    val rules = Urls.parsePsl(Seq(
      "// ===BEGIN ICANN DOMAINS===",
      "com", "uk", "co.uk", "*.ck", "!www.ck", "",
      "  GitHub.IO  trailing junk", "// comment", "s3.amazonaws.com"))
    assert(rules.exact === Set("co.uk", "github.io", "s3.amazonaws.com"))
    assert(rules.wildcardBases === Set("ck"))
    assert(rules.exceptions === Set("www.ck"))
    // single-label rules (com, uk) equal the default rule and are dropped
    assert(rules.maxRuleDepth === 3)

    val f = java.nio.file.Files.createTempFile("graft_psl", ".dat")
    java.nio.file.Files.writeString(f, "// psl\nco.jp\n*.bd\n!exempt.bd\n")
    val loaded = Urls.loadSuffixes(f.toString)
    assert(loaded === Urls.SuffixRules(Set("co.jp"), Set("bd"), Set("exempt.bd")))
    // and the loaded rules drive the generated expression
    val d = Seq("x.y.bd").toDF("h")
      .select(Urls.registeredDomain($"h", loaded)).as[String].head()
    assert(d === "x.y.bd")
    val e = Seq("deep.exempt.bd").toDF("h")
      .select(Urls.registeredDomain($"h", loaded)).as[String].head()
    assert(e === "exempt.bd")
  }

  test("registeredDomainSqlCase mirrors the Column chain (DuckDB-shape CASE text)") {
    val sql = Urls.registeredDomainSqlCase(Urls.DefaultRules, "host", "l", "n")
    // exceptions come before suffix matches, deepest suffixes before shallower
    val excPos = sql.indexOf("'www.ck'")
    val d4Pos = sql.indexOf("n > 4") // compute.amazonaws.com wildcard level
    val d2Pos = sql.indexOf("'github.io'")
    assert(excPos >= 0 && d4Pos >= 0 && d2Pos >= 0)
    assert(excPos < d4Pos && d4Pos < d2Pos)
    assert(sql.startsWith("CASE WHEN regexp_matches(host, '^[0-9.]+$')"))
    assert(sql.endsWith("END"))
  }

  test("urlNormalize: the pinned chain end to end") {
    // fragment strip + authority lowercase, path case preserved
    assert(norm1("HTTPS://Example.COM/Path/One#Sec2") === "https://example.com/Path/One")
    // default ports drop, non-default ports stay
    assert(norm1("http://h.io:80/a") === "http://h.io/a")
    assert(norm1("https://h.io:443/a") === "https://h.io/a")
    assert(norm1("http://h.io:8080/a") === "http://h.io:8080/a")
    assert(norm1("https://h.io:80/a") === "https://h.io:80/a") // not the https default
    // tracking params vanish, real params survive, separators repair
    assert(norm1("https://h.io/p?utm_source=x&q=1") === "https://h.io/p?q=1")
    assert(norm1("https://h.io/p?q=1&fbclid=abc") === "https://h.io/p?q=1")
    assert(norm1("https://h.io/p?utm_a=1&ref=rss&utm_b=2") === "https://h.io/p")
    assert(norm1("https://h.io/p?utm_a=1&utm_b=2&q=3") === "https://h.io/p?q=3")
    // names only match as whole parameter names
    assert(norm1("https://h.io/p?refresh=1&xref=2") === "https://h.io/p?refresh=1&xref=2")
    // bare trailing slash drops; a real path keeps its slash
    assert(norm1("https://h.io/") === "https://h.io")
    assert(norm1("https://h.io/a/") === "https://h.io/a/")
    // non-URL strings: fragment strip only, nothing else fires
    assert(norm1("plain text # not a frag") === "plain text ")
  }

  test("withUrlColumns adds host/domain/url_norm and guards collisions") {
    val df = Seq((1L, "https://www.Example.co.uk:443/x?gclid=1"))
      .toDF("id", "url")
    val out = Urls.withUrlColumns(df, "url")
    val row = out.select($"host", $"domain", $"url_norm").head()
    assert(row.getString(0) === "www.example.co.uk")
    assert(row.getString(1) === "example.co.uk")
    assert(row.getString(2) === "https://www.example.co.uk/x")
    val clash = intercept[IllegalArgumentException] {
      Urls.withUrlColumns(df.withColumn("host", lit("x")), "url")
    }
    assert(clash.getMessage.contains("host"))
    intercept[IllegalArgumentException] { Urls.withUrlColumns(df, "nope") }
  }

  test("filterBlockedDomains drops every subdomain of a blocked domain") {
    val docs = Seq(
      (1L, "https://ads.example.com/x"),      // blocked (registered domain)
      (2L, "https://deep.sub.ads.example.com/y"), // same registered domain
      (3L, "https://example.org/z"),          // kept
      (4L, "https://tracker.co.uk/w"),        // kept: blocklist has Tracker.net
      (5L, "https://cdn.Tracker.NET/v")       // blocked case-insensitively
    ).toDF("id", "url")
    val blocked = Seq("example.com", "Tracker.net").toDF("domain")
    val kept = Urls.filterBlockedDomains(docs, "url", blocked)
      .select($"id").as[Long].collect().sorted
    assert(kept === Array(3L, 4L))
    // original columns untouched, temp column dropped
    assert(Urls.filterBlockedDomains(docs, "url", blocked).columns.toSeq
      === Seq("id", "url"))
    intercept[IllegalArgumentException] {
      Urls.filterBlockedDomains(docs, "url", Seq(("a", "b")).toDF("x", "y"))
    }
    intercept[IllegalArgumentException] {
      Urls.filterBlockedDomains(
        docs.withColumn("__graft_url_domain", lit(1)), "url", blocked)
    }
  }

  test("SQL surface: url_host / registered_domain / url_normalize") {
    TopnFunctions.register(spark)
    val row = spark.sql(
      """SELECT url_host('https://User@News.Example.co.uk:8080/A?utm_x=1') AS h,
        |       registered_domain(url_host('https://News.Example.co.uk/')) AS d,
        |       url_normalize('HTTP://H.io:80/A?gclid=1&q=2#f') AS n""".stripMargin).head()
    assert(row.getString(0) === "news.example.co.uk")
    assert(row.getString(1) === "example.co.uk")
    assert(row.getString(2) === "http://h.io/A?q=2")
  }

  // --- canonical link + sitemap extraction ---------------------------------

  private def canon(html: String): String =
    Seq(html).toDF("h").select(Urls.htmlCanonicalUrl($"h")).as[String].head()

  test("htmlCanonicalUrl: attribute orders, quote styles, absence, first-wins") {
    assert(canon("""<head><link rel="canonical" href="https://a.io/x"></head>""")
      === "https://a.io/x")
    assert(canon("""<link href='https://a.io/y' rel=canonical>""") === "https://a.io/y")
    assert(canon("""<LINK REL=CANONICAL HREF=https://a.io/z>""") === "https://a.io/z",
      "case-insensitive, unquoted attributes")
    assert(canon("""<link rel="stylesheet" href="https://a.io/css">""") === "",
      "non-canonical links must not match")
    assert(canon("<p>no links at all</p>") === "")
    assert(canon(
      """<link rel="canonical" href="https://a.io/first">
        |<link rel="canonical" href="https://a.io/second">""".stripMargin)
      === "https://a.io/first", "first declaration wins")
    // a canonical link spanning a newline inside the tag
    assert(canon("<link rel=\"canonical\"\n href=\"https://a.io/nl\">")
      === "https://a.io/nl")
    // adversarial attribute-substring shapes must NOT match
    assert(canon("""<link rel="stylesheet" data-rel="canonical" href="/theme.css">""")
      === "", "data-rel is not rel")
    assert(canon("""<link href="/x" data-rel="canonical">""") === "",
      "href-first data-rel is not rel either")
    assert(canon("""<link rel="canonicalized" href="https://a.io/x">""") === "",
      "a rel value merely PREFIXED by canonical must not match")
    assert(canon("""<link data-href="/no" rel="canonical" href="https://a.io/y">""")
      === "https://a.io/y", "data-href must not shadow the real href")
  }

  test("htmlCanonicalUrl: browser-accepted quote-adjacent and token-list forms") {
    // attribute starting immediately after the closing quote — browsers
    // accept it, the recrawl chain must not silently fall back to fetch URL
    assert(canon("""<link rel="canonical"href="https://a.io/adj">""")
      === "https://a.io/adj", "quote-adjacent href after rel")
    assert(canon("""<link href="https://a.io/adj2"rel="canonical">""")
      === "https://a.io/adj2", "quote-adjacent rel after href")
    // canonical anywhere in a space-separated rel token list (RFC 6596
    // composes with other link types)
    assert(canon("""<link rel="nofollow canonical" href="https://a.io/tok">""")
      === "https://a.io/tok")
    assert(canon("""<link href='https://a.io/tok2' rel='alternate canonical'>""")
      === "https://a.io/tok2")
    // rel last in the tag, closed without a separator
    assert(canon("""<link href="https://a.io/end" rel=canonical>""")
      === "https://a.io/end")
    // guards retained: prefixed token, token list without canonical, and
    // canonical appearing only in ANOTHER attribute's value
    assert(canon("""<link rel="nofollow canonicalized" href="https://a.io/x">""")
      === "", "token-list entry merely prefixed by canonical must not match")
    assert(canon("""<link rel="nofollow external" href="https://a.io/x">""") === "")
    assert(canon("""<link title="not canonical " rel="stylesheet" href="/c.css">""")
      === "", "the token must live in rel's own quoted value")
    // rel-first pattern must not walk past the tag end into a later href
    assert(canon("""<link rel=canonical><a href="https://a.io/next">""")
      === "", "a rel-only link tag must not capture the next tag's href")
  }

  test("sitemapLocs: trim, order, multiline, empties") {
    def locs(xml: String): Seq[String] =
      Seq(xml).toDF("x").select(Urls.sitemapLocs($"x")).as[Seq[String]].head()
    assert(locs("<urlset><url><loc> https://a.io/1 </loc></url>" +
        "<url><loc>\nhttps://a.io/2\n</loc></url></urlset>")
      === Seq("https://a.io/1", "https://a.io/2"))
    assert(locs("<sitemapindex><sitemap><LOC>https://a.io/s.xml</LOC></sitemap></sitemapindex>")
      === Seq("https://a.io/s.xml"), "tag match is case-insensitive")
    assert(locs("<urlset></urlset>") === Seq.empty)
    assert(locs("<urlset><url><loc></loc></url></urlset>") === Seq(""),
      "an empty loc entry stays an (empty) entry, not a dropped one")
  }

  test("SQL surface: html_canonical_url / sitemap_locs") {
    TopnFunctions.register(spark)
    val row = spark.sql(
      """SELECT html_canonical_url('<link rel="canonical" href="https://a.io/x">') AS c,
        |       sitemap_locs('<urlset><loc> https://a.io/1 </loc></urlset>') AS l""".stripMargin)
      .head()
    assert(row.getString(0) === "https://a.io/x")
    assert(row.getSeq[String](1) === Seq("https://a.io/1"))
  }
}
