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
   * Multi-part public suffixes recognized by [[registeredDomain]]. A tiny,
   * deterministic subset of the public suffix list: the common second-level
   * country registrations. The full PSL is a versioned external artifact;
   * a production deployment swaps this constant for a loaded copy — the
   * rule (longest matching suffix + one label) is the same.
   */
  val MultiPartSuffixes: Seq[String] = Seq(
    "co.uk", "ac.uk", "gov.uk", "org.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp",
    "co.in", "co.kr", "co.za", "co.nz",
    "com.br", "com.mx", "com.cn", "com.ar", "com.tr", "com.sg", "com.hk")

  /** Exact-name tracking parameters stripped by [[urlNormalize]] (the
    * `utm_*` family is matched by pattern in addition to these). */
  val TrackingParams: Seq[String] = Seq("gclid", "fbclid", "msclkid", "mc_eid", "ref")

  /** `(utm_x|gclid|...)` alternation used inside the strip pattern —
    * built from [[TrackingParams]] so Spark and the oracle share it. */
  def trackingAlternation: String =
    ("utm_[A-Za-z0-9_]*" +: TrackingParams).mkString("|")

  /** SQL `('co.uk', ...)` literal list for the oracle, from the same
    * constant as the Spark plan. */
  def multiPartSuffixSqlList: String =
    MultiPartSuffixes.map(s => s"'$s'").mkString("(", ", ", ")")

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
   * Registered domain (eTLD+1) of a host: the last two labels, or the last
   * THREE when the last two form a multi-part suffix from
   * [[MultiPartSuffixes]] (`news.example.co.uk` -> `example.co.uk`, while
   * `sub.deep.ads.example.com` -> `example.com`). IPv4 literals and hosts
   * with fewer than three labels pass through unchanged — an IP has no
   * registrable domain, and truncating it would merge unrelated hosts.
   *
   * This is THE dedup/blocklist key for URL-level curation: every subdomain
   * of a blocked or capped domain maps onto the same key.
   */
  def registeredDomain(host: Column): Column = {
    val labels = split(host, "\\.")
    val n = size(labels)
    val last2 = array_join(slice(labels, -2, 2), ".")
    val last3 = array_join(slice(labels, -3, 3), ".")
    when(host.rlike("^[0-9.]+$") || n <= 2, host)
      .when(last2.isin(MultiPartSuffixes.map(x => x: Any): _*), last3)
      .otherwise(last2)
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
         |        CASE WHEN regexp_matches(host, '^[0-9.]+$$') OR ${p}_n <= 2 THEN host
         |             WHEN array_to_string(list_slice(${p}_l, ${p}_n - 1, ${p}_n), '.') IN $multiPartSuffixSqlList
         |               THEN array_to_string(list_slice(${p}_l, ${p}_n - 2, ${p}_n), '.')
         |             ELSE array_to_string(list_slice(${p}_l, ${p}_n - 1, ${p}_n), '.') END AS domain
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
}
