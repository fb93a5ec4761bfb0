package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL analysis and domain filtering — the C4 / RefinedWeb-family curation
 * devices that act on a document's source URL rather than its text: host
 * extraction, registered-domain (eTLD+1) reduction, URL canonicalization,
 * and blocklist filtering.
 *
 * Everything here is a *composition of built-in Spark SQL functions* in the
 * Java/RE2 COMMON regex subset (explicit classes, no lookaround, no lazy
 * quantifiers), so it stays inside whole-stage codegen, is a pure map-side
 * projection (the one exception: [[filterBlockedDomains]]' keyed anti join),
 * and every step is replayed 1:1 by the DuckDB oracle — the suffix set and
 * tracking-parameter list are exported as SQL fragments from the SAME Scala
 * constants so the two engines cannot drift.
 *
 * Scale shape: host/domain/normalize are shuffle-free projections — linear,
 * no state, no skew surface. The blocklist filter is an equi anti join on
 * the registered domain; blocklists are small enough that AQE broadcasts them
 * (no forced hint — the same doctrine as every other bounded side table
 * here).
 */
object Urls {

  /**
   * Public-suffix rules in the publicsuffix.org list format's three rule
   * kinds: `exact` multi-label suffixes (`co.uk`, `github.io`),
   * `wildcardBases` for `*.base` rules (`ck` for `*.ck` — ANY single label
   * under the base is a public suffix), and `exceptions` for `!name` rules
   * (`www.ck` — registrable despite a covering wildcard). Single-label
   * rules (`com`) are never stored: they coincide with the list's implicit
   * default rule `*` (suffix = the last label), which [[registeredDomain]]
   * applies when nothing else matches.
   *
   * All entries are lower-case label sequences; accessors return sorted
   * sequences so the generated Column expression and oracle SQL are
   * deterministic for a given rule set.
   */
  final case class SuffixRules(
      exact: Set[String],
      wildcardBases: Set[String],
      exceptions: Set[String]) {
    require((exact ++ wildcardBases ++ exceptions).forall(s =>
      s.nonEmpty && s == s.toLowerCase && !s.startsWith(".") && !s.endsWith(".")),
      "suffix rules must be non-empty lower-case dotted names")
    private[Urls] def depth(s: String): Int = s.count(_ == '.') + 1
    def exactAtDepth(d: Int): Seq[String] =
      exact.filter(depth(_) == d).toSeq.sorted
    def wildcardBasesAtDepth(b: Int): Seq[String] =
      wildcardBases.filter(depth(_) == b).toSeq.sorted
    /** Exceptions grouped by label count, deepest first. */
    def exceptionsByDepth: Seq[(Int, Seq[String])] =
      exceptions.groupBy(depth).toSeq.sortBy(-_._1)
        .map { case (k, s) => (k, s.toSeq.sorted) }
    /** Deepest public suffix any rule can produce (a `*.base` rule's
      * suffix is one label deeper than its base); at least 2. */
    def maxRuleDepth: Int =
      (exact.map(depth) ++ wildcardBases.map(depth(_) + 1) + 2).max
  }

  /**
   * Multi-part ICANN suffixes recognized by default: the common
   * second-level country registrations (publicsuffix.org ICANN section).
   */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "co.in", "co.kr", "co.za", "co.nz",
    "com.br", "com.mx", "com.cn", "com.ar", "com.tr", "com.sg", "com.hk")

  /**
   * The built-in rule set: [[MultiPartSuffixes]] plus the PRIVATE-section
   * entries a crawl pipeline actually hits — the hosted-platform domains
   * where every subdomain is a different registrant (`user.github.io` must
   * NOT collapse into one `github.io` key for blocklists, per-domain caps,
   * or PageRank) — and representative wildcard/exception rules in the real
   * list's spelling (`*.ck` with `!www.ck`; `*.compute.amazonaws.com`).
   * A production deployment swaps in a full versioned list via
   * [[loadSuffixes]]; the matching algorithm is identical.
   */
  val DefaultRules: SuffixRules = SuffixRules(
    exact = MultiPartSuffixes.toSet ++ Set(
      "github.io", "gitlab.io", "blogspot.com", "appspot.com",
      "herokuapp.com", "azurewebsites.net", "cloudfront.net",
      "firebaseapp.com", "netlify.app", "vercel.app", "pages.dev",
      "workers.dev", "web.app", "readthedocs.io", "s3.amazonaws.com"),
    wildcardBases = Set("ck", "bd", "er", "compute.amazonaws.com"),
    exceptions = Set("www.ck"))

  /**
   * Parse rules in the publicsuffix.org file format: one rule per line
   * (the rule ends at the first whitespace), `//` comment lines and blank
   * lines skipped, `!` marking exceptions, `*.` marking wildcards.
   * Single-label exact rules are dropped (they equal the implicit default
   * rule — keeping ~1500 TLD lines would bloat the generated expression
   * for zero behavior change). Case-folded to lower.
   */
  def parsePsl(lines: IterableOnce[String]): SuffixRules = {
    val exact = Set.newBuilder[String]
    val wild = Set.newBuilder[String]
    val exc = Set.newBuilder[String]
    for (raw <- lines.iterator) {
      val t = raw.trim
      if (t.nonEmpty && !t.startsWith("//")) {
        val rule = t.takeWhile(!_.isWhitespace).toLowerCase
        if (rule.startsWith("!")) exc += rule.drop(1)
        else if (rule.startsWith("*.")) wild += rule.drop(2)
        else if (rule.contains('.')) exact += rule
      }
    }
    SuffixRules(exact.result(), wild.result(), exc.result())
  }

  /** Load a public-suffix list file (publicsuffix.org format) from disk. */
  def loadSuffixes(path: String): SuffixRules = {
    import scala.jdk.CollectionConverters._
    parsePsl(java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(path)).asScala)
  }

  /** Exact-name tracking parameters stripped by [[urlNormalize]] (the
    * `utm_*` family is matched by pattern in addition to these). */
  val TrackingParams: Seq[String] = Seq("gclid", "fbclid", "msclkid", "mc_eid", "ref")

  /** `(utm_x|gclid|...)` alternation used inside the strip pattern —
    * built from [[TrackingParams]] so Spark and the oracle share it. */
  def trackingAlternation: String =
    ("utm_[A-Za-z0-9_]*" +: TrackingParams).mkString("|")

  private val AuthorityRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"

  /**
   * Lower-cased host of an absolute URL: the authority component with
   * userinfo (`user:pw@`) and port (`:8080`) stripped. A string without a
   * `scheme://` authority yields `''` (empty), never NULL — so downstream
   * grouping keys stay total.
   */
  def urlHost(url: Column): Column =
    lower(regexp_replace(regexp_replace(
      regexp_extract(url, AuthorityRe, 1), "^[^@]*@", ""), ":[0-9]*$", ""))

  /**
   * Registered domain (eTLD+1) of a host under `rules`, the publicsuffix
   * algorithm: the longest matching rule's suffix plus one more host label
   * (`news.example.co.uk` -> `example.co.uk`; `user.github.io` ->
   * `user.github.io` — github.io is a private-section suffix;
   * `shop.foo.ck` -> `shop.foo.ck` under `*.ck`; `deep.www.ck` -> `www.ck`
   * under `!www.ck`). Exceptions outrank wildcards; deeper suffixes
   * outrank shallower; the implicit default rule `*` (suffix = last label,
   * domain = last two) applies when nothing matches. IPv4 literals, single
   * labels, and hosts that ARE a public suffix pass through unchanged —
   * they have no registrable domain, and truncating an IP would merge
   * unrelated hosts.
   *
   * This is THE dedup/blocklist key for URL-level curation: every
   * subdomain of a blocked or capped domain maps onto the same key, while
   * hosted-platform subdomains (different registrants) stay distinct.
   *
   * The expression is GENERATED from `rules` as a when-chain over
   * last-k-label joins with set membership (Catalyst turns the literal
   * lists into hashed InSet lookups, so a loaded multi-thousand-rule list
   * stays codegen'd and map-side — no join, no shuffle).
   * [[registeredDomainSqlCase]] generates the identical decision chain for
   * the DuckDB oracle from the same rules, so the engines cannot drift.
   */
  def registeredDomain(host: Column, rules: SuffixRules): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    def lastK(k: Int) = array_join(slice(labels, -k, k), ".")
    def inSet(c: Column, xs: Seq[String]) = c.isin(xs.map(x => x: Any): _*)
    var e: Column = when(host.rlike("^[0-9.]+$") || n <= 1, host)
    for ((k, xs) <- rules.exceptionsByDepth)
      e = e.when(inSet(lastK(k), xs), lastK(k))
    for (d <- rules.maxRuleDepth to 2 by -1) {
      val ex = rules.exactAtDepth(d)
      val wb = rules.wildcardBasesAtDepth(d - 1)
      val conds =
        (if (ex.nonEmpty) Seq(inSet(lastK(d), ex)) else Nil) ++
          (if (wb.nonEmpty) Seq(inSet(lastK(d - 1), wb) && n >= d) else Nil)
      if (conds.nonEmpty) {
        val m = conds.reduce(_ || _)
        // suffix matched: one more label is the domain; a host that IS
        // the suffix has no registrable domain and passes through
        e = e.when(m && n > d, lastK(d + 1)).when(m, host)
      }
    }
    e.when(n <= 2, host).otherwise(lastK(2))
  }

  /** [[registeredDomain]] under the built-in [[DefaultRules]]. */
  def registeredDomain(host: Column): Column =
    registeredDomain(host, DefaultRules)

  /**
   * The DuckDB spelling of [[registeredDomain]]'s decision chain,
   * generated from the same `rules` (same order: IP/single-label pass,
   * exceptions deepest-first, suffix depths descending, default rule
   * last). `hostVar`/`lVar`/`nVar` name the host string, its label list,
   * and the label count in the surrounding query. Comparisons against
   * too-short hosts are safe without guards: a clamped `list_slice` joins
   * fewer labels than any k-label suffix contains, so equality cannot
   * hold; result slices are reached only behind `n > d`.
   */
  def registeredDomainSqlCase(
      rules: SuffixRules, hostVar: String, lVar: String, nVar: String): String = {
    def lastK(k: Int) =
      s"array_to_string(list_slice($lVar, $nVar - ${k - 1}, $nVar), '.')"
    def inList(xs: Seq[String]) = xs.map(s => s"'$s'").mkString("(", ", ", ")")
    val sb = new StringBuilder(
      s"CASE WHEN regexp_matches($hostVar, '^[0-9.]+$$') OR $nVar <= 1 THEN $hostVar")
    for ((k, xs) <- rules.exceptionsByDepth)
      sb ++= s"\n             WHEN ${lastK(k)} IN ${inList(xs)} THEN ${lastK(k)}"
    for (d <- rules.maxRuleDepth to 2 by -1) {
      val ex = rules.exactAtDepth(d)
      val wb = rules.wildcardBasesAtDepth(d - 1)
      val conds =
        (if (ex.nonEmpty) Seq(s"${lastK(d)} IN ${inList(ex)}") else Nil) ++
          (if (wb.nonEmpty)
            Seq(s"($nVar >= $d AND ${lastK(d - 1)} IN ${inList(wb)})") else Nil)
      if (conds.nonEmpty) {
        val m = conds.mkString("(", " OR ", ")")
        sb ++= s"\n             WHEN $m AND $nVar > $d THEN ${lastK(d + 1)}"
        sb ++= s"\n             WHEN $m THEN $hostVar"
      }
    }
    sb ++= s"\n             WHEN $nVar <= 2 THEN $hostVar ELSE ${lastK(2)} END"
    sb.toString
  }

  /**
   * Canonicalized URL — the pinned normalization chain, each step a
   * single regex in the RE2/Java common subset, replayed verbatim by the
   * oracle (change both together):
   *
   *  1. strip the fragment (`#...`);
   *  2. lower-case the `scheme://authority` prefix only (paths are
   *     case-sensitive per RFC 3986, hosts are not);
   *  3. drop the scheme's default port (`http://h:80`, `https://h:443`);
   *  4. remove tracking parameters — the `utm_*` family plus
   *     [[TrackingParams]] — then repair separators (`&&` runs, `?&`,
   *     trailing `?`/`&`);
   *  5. drop a bare trailing slash (`https://h/` -> `https://h`).
   *
   * Non-URL strings pass through steps 2-5 untouched (every pattern is
   * anchored on the scheme); inputs are assumed single-line (the fragment
   * strip uses `.`). The result is the canonical exact-dedup /
   * frequency-count key for crawl URLs.
   */
  def urlNormalize(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val schemeAuthRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*"
    val lowered = concat(
      lower(regexp_extract(noFrag, s"($schemeAuthRe)", 1)),
      regexp_replace(noFrag, schemeAuthRe, ""))
    val noPort = regexp_replace(
      regexp_replace(lowered, "^(http://[^/?#:]*):80([/?#].*)?$", "$1$2"),
      "^(https://[^/?#:]*):443([/?#].*)?$", "$1$2")
    val noTrack = regexp_replace(noPort,
      s"([?&])(?:$trackingAlternation)=[^&#]*", "$1")
    val repaired = regexp_replace(regexp_replace(regexp_replace(
      noTrack, "&&+", "&"), "\\?&", "?"), "[?&]+$", "")
    regexp_replace(repaired, "^(https?://[^/?#]*)/$", "$1")
  }

  /**
   * Adds `host`, `domain` (registered domain), and `url_norm` columns
   * derived from `urlCol` — one shuffle-free projection; the usual entry
   * point before grouping by domain or anti-joining a blocklist.
   */
  def withUrlColumns(df: DataFrame, urlCol: String): DataFrame = {
    require(df.columns.contains(urlCol), s"missing URL column '$urlCol'")
    Seq("host", "domain", "url_norm").foreach(c =>
      require(!df.columns.contains(c),
        s"withUrlColumns would overwrite existing column '$c'"))
    df.withColumn("host", urlHost(col(urlCol)))
      .withColumn("domain", registeredDomain(col("host")))
      .withColumn("url_norm", urlNormalize(col(urlCol)))
  }

  /**
   * The engine-neutral DuckDB replay of [[urlHost]] + [[registeredDomain]]
   * + [[urlNormalize]] as CTE stages over an arbitrary relation `src`
   * carrying `urlCol`: adds `host`, `domain`, `url_norm`, keeps every
   * input column. One definition serves every oracle that touches URLs,
   * so the SQL chain cannot drift per query. Returns
   * (ctesString, finalCteName). `prefix` namespaces the CTE names.
   */
  def urlSqlCtes(src: String, urlCol: String, prefix: String = "u"): (String, String) = {
    val p = prefix
    val ctes =
      s"""${p}h AS (SELECT *, lower(regexp_replace(regexp_replace(
         |        regexp_extract($urlCol, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
         |        '^[^@]*@', ''), ':[0-9]*$$', '')) AS host FROM $src),
         |${p}hd AS (SELECT *, len(string_split(host, '.')) AS ${p}_n,
         |        string_split(host, '.') AS ${p}_l FROM ${p}h),
         |${p}dom AS (SELECT * EXCLUDE (${p}_n, ${p}_l),
         |        ${registeredDomainSqlCase(DefaultRules, "host", s"${p}_l", s"${p}_n")} AS domain
         |        FROM ${p}hd),
         |${p}n1 AS (SELECT *, regexp_replace($urlCol, '#.*', '') AS ${p}_v FROM ${p}dom),
         |${p}n2 AS (SELECT * EXCLUDE (${p}_v),
         |        lower(regexp_extract(${p}_v, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)) ||
         |        regexp_replace(${p}_v, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS ${p}_v FROM ${p}n1),
         |${p}n3 AS (SELECT * EXCLUDE (${p}_v),
         |        regexp_replace(regexp_replace(${p}_v,
         |          '^(http://[^/?#:]*):80([/?#].*)?$$', '\\1\\2'),
         |          '^(https://[^/?#:]*):443([/?#].*)?$$', '\\1\\2') AS ${p}_v FROM ${p}n2),
         |${p}n4 AS (SELECT * EXCLUDE (${p}_v),
         |        regexp_replace(${p}_v, '([?&])(?:$trackingAlternation)=[^&#]*', '\\1', 'g') AS ${p}_v FROM ${p}n3),
         |${p}n5 AS (SELECT * EXCLUDE (${p}_v),
         |        regexp_replace(regexp_replace(regexp_replace(${p}_v,
         |          '&&+', '&', 'g'), '\\?&', '?', 'g'), '[?&]+$$', '') AS ${p}_v FROM ${p}n4),
         |${p}n6 AS (SELECT * EXCLUDE (${p}_v),
         |        regexp_replace(${p}_v, '^(https?://[^/?#]*)/$$', '\\1') AS url_norm FROM ${p}n5)""".stripMargin
    (ctes, s"${p}n6")
  }

  /**
   * Drop every row whose URL's registered domain appears in `blocked` (a
   * one-column `domain` DataFrame, matched case-insensitively). Because the
   * key is the REGISTERED domain, all subdomains of a blocked domain are
   * caught (`tracker.ads.example` blocks `cdn.tracker.ads.example` only if
   * both reduce to the same eTLD+1 — block at the registrable level).
   *
   * Plan: map-side domain projection, then ONE keyed anti join; the
   * blocklist side is distinct-reduced and, being bounded, AQE-broadcast in
   * practice — the corpus never shuffles on anything but the join key, and
   * with a broadcast hash anti join, not at all.
   */
  def filterBlockedDomains(docs: DataFrame, urlCol: String, blocked: DataFrame): DataFrame = {
    require(blocked.columns.length == 1,
      s"blocklist must be a single 'domain' column, got ${blocked.columns.mkString(", ")}")
    val tmp = "__graft_url_domain"
    require(!docs.columns.contains(tmp),
      s"input already contains reserved column '$tmp'")
    docs.withColumn(tmp, registeredDomain(urlHost(col(urlCol))))
      .join(blocked.select(lower(col(blocked.columns.head)).as(tmp)).distinct(),
        Seq(tmp), "left_anti")
      .drop(tmp)
  }

  /**
   * `<loc>` entries of a sitemap / sitemap-index XML body (sitemaps.org
   * protocol — the URL-discovery channel `Robots.sitemapsOf` points the
   * crawler at), inner whitespace trimmed, document order preserved.
   * Lazy RE2-compatible pattern, so the DuckDB oracle replays it with
   * the same spelling; a pure projection (one `regexp_extract_all`) that
   * runs anywhere, including streaming fetch pipelines.
   */
  def sitemapLocs(xml: Column): Column =
    regexp_extract_all(xml, lit("(?is)<loc>\\s*([^<]*?)\\s*</loc>"), lit(1))

  /**
   * The canonical-URL declaration of an HTML page — `<link
   * rel="canonical" href=...>` (RFC 6596), the page-author counterpart
   * of [[urlNormalize]]'s syntactic canonicalization and the input the
   * recrawl keep-latest chain actually wants when a site serves one
   * document under many URLs. Both attribute orders are handled
   * (rel-then-href and href-then-rel); empty string when the page
   * declares none. Case-insensitive, quote-style tolerant, first
   * declaration wins (regexp_extract takes the leftmost match in both
   * engines).
   */
  def htmlCanonicalUrl(html: Column): Column = {
    // attribute-name boundaries ([\s"'] before rel/href — so data-rel= /
    // data-href= cannot match) and a token terminator after canonical (a
    // quote or separator — so rel="canonicalized" cannot match, while the
    // browser-accepted quote-adjacent form rel="canonical"href=... does).
    // `canonical` may sit anywhere in a space-separated rel token list
    // (rel="nofollow canonical"): the `(?:["'](?:[^"'>]*\s)?)?` prefix
    // admits earlier tokens ONLY inside a quoted value (an unquoted value
    // cannot contain spaces), and its [^"'>]* junk cannot cross the
    // closing quote, so tokens of OTHER attributes never match. In the
    // rel-first pattern the terminator excludes '>' (href must follow in
    // the SAME tag — admitting '>' would let the junk group walk into the
    // next tag's href); in the href-first pattern rel is last, so '>' is
    // a valid end. The `(?:[^>]*[\s"'])?` junk group lets further
    // attributes intervene but forces a boundary char immediately before
    // the next attribute name (RE2-safe: no lookarounds).
    val relFirst = regexp_extract(html,
      "(?is)<link[^>]*[\\s\"']rel\\s*=\\s*(?:[\"'](?:[^\"'>]*\\s)?)?canonical[\"'\\s/](?:[^>]*[\\s\"'])?href\\s*=\\s*[\"']?([^\"'>\\s]+)", 1)
    val hrefFirst = regexp_extract(html,
      "(?is)<link[^>]*[\\s\"']href\\s*=\\s*[\"']?([^\"'>\\s]+)[\"']?(?:[^>]*[\\s\"'])?rel\\s*=\\s*(?:[\"'](?:[^\"'>]*\\s)?)?canonical[\"'\\s/>]", 1)
    when(relFirst =!= "", relFirst).otherwise(hrefFirst)
  }
}
