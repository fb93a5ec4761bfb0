package graft.pipeline

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * robots.txt parsing and crawl-admission gating (RFC 9309, the Robots
 * Exclusion Protocol) — the missing front-door piece between WARC ingest
 * ([[Warc]]) and URL-level curation ([[Urls]]): given each host's
 * robots.txt body and a crawler product token, decide per URL whether the
 * crawl may keep it.
 *
 * Like [[Urls]], everything here is a composition of built-in Spark SQL
 * functions (split/regexp/window/join/agg — no UDF, no custom expression),
 * and every pinned decision is replayed 1:1 by the DuckDB oracle via
 * [[rulesSqlCtes]] / [[likePatternSql]] / [[pathSql]], generated from the
 * SAME constants so the engines cannot drift.
 *
 * Pinned semantics (RFC 9309 where it decides, documented choices where it
 * leaves freedom):
 *
 *  - lines are split on `\n` with `\r` stripped (CRLF-safe); `#` starts a
 *    comment to end of line; a directive is `field: value` with the field
 *    case-insensitive and both sides trimmed; only `user-agent`, `allow`,
 *    `disallow` participate — other fields (`sitemap`, `crawl-delay`, ...)
 *    are transparent: ignored without splitting the surrounding group;
 *  - consecutive `user-agent` lines open ONE group whose rules are the
 *    following allow/disallow lines; rules before any user-agent line
 *    belong to no group and are dropped (RFC 9309 §2.2.1);
 *  - agent selection: a group matches specifically when one of its
 *    user-agent values equals the crawler token case-insensitively (the
 *    RFC's product-token match, pinned to whole-token equality), or
 *    generically via `*`. If ANY group matches specifically, all
 *    specifically-matching groups' rules are combined; otherwise all `*`
 *    groups' rules are combined; otherwise the host has no rules for this
 *    agent (RFC 9309 §2.2.1 "combine the groups");
 *  - empty-value allow/disallow lines carry no rule (RFC 9309 §2.2.2);
 *  - a rule's pattern matches the URL's path-plus-query (everything from
 *    the first `/` after the authority, fragment excluded; `/` when the
 *    URL has no path), case-SENSITIVELY, as a prefix; `*` in the pattern
 *    matches any run of characters and a trailing `$` anchors the match at
 *    the end of the path (RFC 9309 §2.2.3). A non-final `$` is literal;
 *  - precedence: the matching rule with the LONGEST pattern (character
 *    count) wins; at equal length `allow` beats `disallow`; a URL with no
 *    matching rule, a host with no applicable group, and a host with no
 *    robots.txt row at all are all ALLOWED (RFC 9309 §2.2.2).
 *
 * Scale shape: parsing is one explode + one per-host window + two keyed
 * aggs over the robots corpus — robots bodies are bounded (the RFC's
 * 500 KiB cap) and there is one per host, so the rules table is small
 * relative to the URL corpus and hash-joins cheaply (AQE broadcasts it
 * when it fits). The verdict is ONE keyed equi join on `host` (fan-out
 * bounded by rules-per-host) followed by ONE hash agg back to URL grain —
 * no self-joins, no global sorts, nothing vocabulary-sized on the driver.
 * Wildcard matching runs as `LIKE` with a pre-translated pattern, kept in
 * whole-stage codegen.
 */
object Robots {

  /** Rule columns produced by [[parseRules]]. */
  val RuleColumns: Seq[String] = Seq("host", "rule_allow", "pattern", "plen", "like_pat")

  private def requireAgent(agent: String): String = {
    val a = agent.toLowerCase(Locale.ROOT)
    require(a.nonEmpty && a != "*" && a.matches("[a-z0-9._-]+"),
      s"agent must be a concrete product token ([a-z0-9._-]+), got '$agent'")
    a
  }

  /**
   * Translate a robots path pattern into a SQL `LIKE` pattern (escape
   * char `\`): `\`, `%`, `_` are escaped, `*` becomes `%`, and a trailing
   * `$` drops the implicit-prefix wildcard instead of appending it. The
   * prefix-match default is expressed by the trailing `%`; LIKE's
   * full-string anchoring supplies the leading anchor.
   */
  def likePattern(p: Column): Column = {
    val esc = regexp_replace(p, "([\\\\%_])", "\\\\$1")
    val hasDollar = p.endsWith("$")
    // '$' is never escaped, so the escaped form still ends with the bare
    // '$' and dropping one character removes exactly it
    val core = translate(
      when(hasDollar, esc.substr(lit(1), length(esc) - 1)).otherwise(esc),
      "*", "%")
    when(hasDollar, core).otherwise(concat(core, lit("%")))
  }

  /** The DuckDB spelling of [[likePattern]] over the SQL expression `p`. */
  def likePatternSql(p: String): String =
    s"""CASE WHEN ends_with($p, '$$')
       |     THEN replace(substr(regexp_replace($p, '([\\\\%_])', '\\\\\\1', 'g'), 1,
       |                  length(regexp_replace($p, '([\\\\%_])', '\\\\\\1', 'g')) - 1), '*', '%')
       |     ELSE replace(regexp_replace($p, '([\\\\%_])', '\\\\\\1', 'g'), '*', '%') || '%' END""".stripMargin

  /**
   * The rule-match target: path plus query of an absolute URL (fragment
   * excluded), `/` when the URL has no path component. Strings without a
   * `scheme://` authority also yield `/` — paired with [[Urls.urlHost]]'s
   * `''` host they fall through the rules join to ALLOWED.
   */
  def pathOf(url: Column): Column =
    coalesce(
      nullif(regexp_extract(url,
        "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1), lit("")),
      lit("/"))

  /** The DuckDB spelling of [[pathOf]] over the SQL expression `url`. */
  def pathSql(url: String): String =
    s"coalesce(nullif(regexp_extract($url, " +
      s"'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)', 1), ''), '/')"

  /**
   * Parse a robots corpus — one row per host: (`host`, `robots_txt`) —
   * into the rule table for `agent`: (`host`, `rule_allow` 1/0,
   * `pattern`, `plen`, `like_pat`). Hosts whose file yields no applicable
   * group (or only empty-value rules) simply have no rows — downstream
   * that IS the allow-everything verdict.
   *
   * Plan: explode lines, parse directives with the pinned regexes, number
   * groups with one per-host window (a `user-agent` line whose previous
   * recognized line is not `user-agent` opens a group), grade each
   * group's agent match (2 specific / 1 generic), take each host's max
   * grade, keep rules from max-grade groups. Two hash aggs + two keyed
   * joins, all on `host`(+`grp`) — robots-corpus-sized, never URL-sized.
   * (The doc describes [[parseRules]]; the trunk is shared with
   * [[crawlDelays]] below.)
   */
  /** Group-scoped directive fields: group members for the boundary rule
    * (a `user-agent` line after any of these opens a NEW group — the
    * de-facto parser behavior; `sitemap` etc. stay transparent). */
  private val GroupFields = Seq("user-agent", "allow", "disallow", "crawl-delay")

  /** All directives parsed with the pinned regexes: (host, ln, field,
    * value), BEFORE any field filtering. */
  private def directives(robots: DataFrame): DataFrame = {
    Seq("host", "robots_txt").foreach(c => require(robots.columns.contains(c),
      s"robots corpus must carry '$c' (got ${robots.columns.mkString(", ")})"))
    robots
      .select(col("host"), posexplode(split(col("robots_txt"), "\n")).as(Seq("ln", "raw")))
      .withColumn("clean",
        trim(regexp_replace(regexp_replace(col("raw"), "\r", ""), "#.*", "")))
      .withColumn("field", lower(trim(regexp_extract(col("clean"), "^([^:]+):", 1))))
      .withColumn("value", trim(regexp_replace(col("clean"), "^[^:]+:", "")))
      .select("host", "ln", "field", "value")
  }

  /** Group-numbered directives plus the per-group / per-host agent
    * grades — the shared trunk of [[parseRules]] and [[crawlDelays]]. */
  private def groupedWithLevels(robots: DataFrame, agent: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val a = requireAgent(agent)
    val w = Window.partitionBy("host").orderBy("ln")
    val grouped = directives(robots)
      .filter(col("field").isin(GroupFields.map(x => x: Any): _*))
      .withColumn("grp", sum(
        when(col("field") === "user-agent" &&
          coalesce(lag(col("field"), 1).over(w), lit("")) =!= "user-agent", 1)
          .otherwise(0)).over(w))
    val uaLevels = grouped.filter(col("field") === "user-agent")
      .groupBy("host", "grp")
      .agg(max(
        when(lower(col("value")) === a, 2)
          .when(col("value") === "*", 1)
          .otherwise(0)).as("lvl"))
    val hostLvl = uaLevels.groupBy("host").agg(max("lvl").as("hlvl"))
    (grouped, uaLevels, hostLvl)
  }

  def parseRules(robots: DataFrame, agent: String): DataFrame = {
    val (grouped, uaLevels, hostLvl) = groupedWithLevels(robots, agent)
    grouped
      .filter(col("field").isin("allow", "disallow") && col("value") =!= "")
      .join(uaLevels, Seq("host", "grp"))
      .join(hostLvl, Seq("host"))
      .filter(col("lvl") === col("hlvl") && col("hlvl") > 0)
      .select(col("host"),
        (col("field") === "allow").cast("int").as("rule_allow"),
        col("value").as("pattern"),
        length(col("value")).as("plen"),
        likePattern(col("value")).as("like_pat"))
  }

  /**
   * Per-host politeness delay for `agent`: the `crawl-delay` value from
   * the selected groups (same specific-beats-`*` selection and group
   * combine as [[parseRules]]; the MAX across combined groups, pinned).
   * The field is de-facto, not RFC 9309 — pinned semantics: non-negative
   * INTEGER seconds only, anything else ignored. Hosts without an
   * applicable delay have no row.
   */
  def crawlDelays(robots: DataFrame, agent: String): DataFrame = {
    val (grouped, uaLevels, hostLvl) = groupedWithLevels(robots, agent)
    grouped
      .filter(col("field") === "crawl-delay" && col("value").rlike("^[0-9]+$"))
      .join(uaLevels, Seq("host", "grp"))
      .join(hostLvl, Seq("host"))
      .filter(col("lvl") === col("hlvl") && col("hlvl") > 0)
      .groupBy("host")
      .agg(max(col("value").cast("long")).as("crawl_delay_s"))
  }

  /** Every `sitemap` directive per host — NOT group-scoped (the sitemaps
    * protocol attaches them to the whole file; they are transparent to
    * group boundaries). Empty values dropped; duplicates collapse. */
  def sitemapsOf(robots: DataFrame): DataFrame =
    directives(robots)
      .filter(col("field") === "sitemap" && col("value") =!= "")
      .select(col("host"), col("value").as("sitemap"))
      .distinct()

  /**
   * Per-URL robots verdict: the input columns plus `host`, `path`, and
   * boolean `allowed`. `idCol` must be a unique row key — the verdict
   * aggregation groups by the full input row, so duplicate rows would
   * collapse (with a unique id they cannot).
   *
   * Precedence is folded into ONE integer: a matching rule scores
   * `plen * 2 + rule_allow`, the per-URL max picks the longest pattern
   * (lengths differing by 1 already out-score any allow bit) with allow
   * winning exact ties, and `max % 2 = 1` reads the verdict back out —
   * an order-independent integer agg, bit-identical cross-engine.
   */
  def withRobotsVerdict(urls: DataFrame, urlCol: String, idCol: String,
      rules: DataFrame): DataFrame = {
    Seq(urlCol, idCol).foreach(c => require(urls.columns.contains(c),
      s"missing column '$c'"))
    Seq("host", "path", "__graft_like", "__graft_score").foreach(c =>
      require(!urls.columns.contains(c),
        s"withRobotsVerdict would overwrite column '$c'"))
    require(RuleColumns.forall(rules.columns.contains),
      s"rules must carry ${RuleColumns.mkString(", ")} (from parseRules)")
    val u = urls
      .withColumn("host", Urls.urlHost(col(urlCol)))
      .withColumn("path", pathOf(col(urlCol)))
    val r = rules.select(col("host"), col("rule_allow"), col("plen"),
      col("like_pat").as("__graft_like"))
    val keys = (urls.columns.toIndexedSeq :+ "host" :+ "path").map(col)
    u.join(r, Seq("host"), "left")
      .withColumn("__graft_score",
        when(expr("path LIKE __graft_like ESCAPE '\\\\'"),
          col("plen").cast("long") * 2 + col("rule_allow")))
      .groupBy(keys: _*)
      .agg(max(col("__graft_score")).as("__graft_score"))
      .withColumn("allowed",
        coalesce(col("__graft_score") % 2 === 1, lit(true)))
      .drop("__graft_score")
  }

  /** Keep only robots-allowed rows; the admission gate form of
    * [[withRobotsVerdict]] (same contract), added columns dropped. */
  def filterDisallowed(urls: DataFrame, urlCol: String, idCol: String,
      rules: DataFrame): DataFrame =
    withRobotsVerdict(urls, urlCol, idCol, rules)
      .filter(col("allowed"))
      .drop("host", "path", "allowed")

  /**
   * [[parseRules]] output folded to ONE row per host with a
   * `robots_rules` array column — the join-once layout: the verdict
   * becomes a pure array expression ([[allowedColumn]]), so gating is a
   * single keyed equi join plus a projection, with no post-join
   * re-aggregation. That makes it legal inside a Structured Streaming
   * query (stream-static join + projection, no second stateful op) and
   * cheaper in batch (the fan-out rows never exist). Rule order inside
   * the array is irrelevant — the verdict fold is a max.
   */
  def packRules(rules: DataFrame): DataFrame = {
    require(RuleColumns.forall(rules.columns.contains),
      s"rules must carry ${RuleColumns.mkString(", ")} (from parseRules)")
    rules.groupBy("host")
      .agg(collect_list(struct(col("rule_allow"), col("plen"), col("like_pat")))
        .as("robots_rules"))
  }

  /** The robots verdict as a pure Column over a URL's match `path` and a
    * host's packed `robots_rules` array (NULL array -> no robots row ->
    * allowed): the same `max(plen*2+rule_allow)` fold as
    * [[withRobotsVerdict]], spelled with array higher-order functions. */
  def allowedColumn(path: Column, packedRules: Column): Column = {
    val matched = filter(packedRules, r =>
      like(path, r.getField("like_pat"), lit("\\")))
    val best = array_max(transform(matched, r =>
      r.getField("plen").cast("long") * 2 + r.getField("rule_allow")))
    coalesce(best % 2 === 1, lit(true))
  }

  /**
   * [[withRobotsVerdict]] against a [[packRules]] table — identical
   * verdicts (RobotsSpec asserts equality), different plan: ONE left
   * equi join on `host` (AQE-broadcast when the packed table fits) and a
   * map-side verdict projection. Use this form at URL-corpus scale and
   * in streams; `idCol` needs no uniqueness here (no re-aggregation).
   */
  def withRobotsVerdictPacked(urls: DataFrame, urlCol: String,
      packed: DataFrame): DataFrame = {
    require(urls.columns.contains(urlCol), s"missing column '$urlCol'")
    Seq("host", "path", "allowed", "robots_rules").foreach(c =>
      require(!urls.columns.contains(c),
        s"withRobotsVerdictPacked would overwrite column '$c'"))
    require(packed.columns.sorted.sameElements(Array("host", "robots_rules")),
      s"packed rules must be (host, robots_rules) from packRules, got ${packed.columns.mkString(", ")}")
    urls
      .withColumn("host", Urls.urlHost(col(urlCol)))
      .withColumn("path", pathOf(col(urlCol)))
      .join(packed, Seq("host"), "left")
      .withColumn("allowed", allowedColumn(col("path"), col("robots_rules")))
      .drop("robots_rules")
  }

  /** The gate form of [[withRobotsVerdictPacked]]: only allowed rows,
    * original columns — stream-legal (join + filter, nothing stateful). */
  def filterDisallowedPacked(urls: DataFrame, urlCol: String,
      packed: DataFrame): DataFrame =
    withRobotsVerdictPacked(urls, urlCol, packed)
      .filter(col("allowed"))
      .drop("host", "path", "allowed")

  /**
   * The DuckDB replay of [[parseRules]] as CTE stages over `src` (a
   * relation with `host`, `robots_txt`), generated from the same pinned
   * regexes and grading constants. Returns (ctesString, rulesCteName);
   * the final CTE has [[RuleColumns]]. The intermediate CTEs are part of
   * the contract for metadata consumers: `<p>p` (all parsed directives),
   * `<p>g` (group-numbered [[GroupFields]] lines), `<p>ua` / `<p>hl`
   * (group / host agent grades) — the [[crawlDelays]] / [[sitemapsOf]]
   * oracles build on them.
   */
  def rulesSqlCtes(src: String, agent: String, prefix: String = "rb"): (String, String) = {
    val a = requireAgent(agent)
    val p = prefix
    val ctes =
      s"""${p}l0 AS (SELECT host, unnest(list_transform(range(1, len(ls) + 1),
         |            i -> struct_pack(ln := i, line := ls[i]))) AS r
         |          FROM (SELECT host, string_split(robots_txt, chr(10)) AS ls FROM $src)),
         |${p}l1 AS (SELECT host, r.ln AS ln,
         |            trim(regexp_replace(replace(r.line, chr(13), ''), '#.*', '')) AS clean
         |          FROM ${p}l0),
         |${p}p AS (SELECT host, ln,
         |            lower(trim(regexp_extract(clean, '^([^:]+):', 1))) AS field,
         |            trim(regexp_replace(clean, '^[^:]+:', '')) AS value
         |          FROM ${p}l1),
         |${p}s AS (SELECT *, CASE WHEN field = 'user-agent' AND
         |              coalesce(lag(field) OVER (PARTITION BY host ORDER BY ln), '') <> 'user-agent'
         |              THEN 1 ELSE 0 END AS starts
         |          FROM ${p}p WHERE field IN (${GroupFields.map(f => s"'$f'").mkString(", ")})),
         |${p}g AS (SELECT *, SUM(starts)
         |            OVER (PARTITION BY host ORDER BY ln ROWS UNBOUNDED PRECEDING) AS grp
         |          FROM ${p}s),
         |${p}ua AS (SELECT host, grp,
         |            max(CASE WHEN lower(value) = '$a' THEN 2
         |                     WHEN value = '*' THEN 1 ELSE 0 END) AS lvl
         |          FROM ${p}g WHERE field = 'user-agent' GROUP BY host, grp),
         |${p}hl AS (SELECT host, max(lvl) AS hlvl FROM ${p}ua GROUP BY host),
         |${p}rules AS (SELECT g.host AS host,
         |            CASE WHEN g.field = 'allow' THEN 1 ELSE 0 END AS rule_allow,
         |            g.value AS pattern, length(g.value) AS plen,
         |            ${likePatternSql("g.value")} AS like_pat
         |          FROM ${p}g g JOIN ${p}ua USING (host, grp) JOIN ${p}hl USING (host)
         |          WHERE g.field IN ('allow', 'disallow') AND g.value <> ''
         |            AND lvl = hlvl AND hlvl > 0)""".stripMargin
    (ctes, s"${p}rules")
  }
}
