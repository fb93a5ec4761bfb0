package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Recrawl snapshot management — what a continuously-crawled corpus needs
 * between WARC ingest ([[Warc]]) and dedup/curation: the same page is
 * fetched again and again, and the pipeline must (a) key all fetches of
 * one page together even when the URL spelling drifts, (b) keep exactly
 * the newest version, and (c) know WHICH pages actually changed so the
 * expensive downstream stages (re-embedding, re-scoring, re-dedup) run
 * on the changed slice only — the batch sibling of the streaming
 * frontier/ingest recipes in [[graft.streaming.TopnStreaming]].
 *
 * Pinned semantics:
 *
 *  - the version key is the CANONICAL URL — [[Urls.urlNormalize]] of the
 *    URL column — so fetches differing only in tracking params, default
 *    ports, or fragments are versions of one page;
 *  - version order is (`tsCol` asc, `idCol` asc): ties on the timestamp
 *    are broken by the unique row id, so "latest" is total and
 *    deterministic;
 *  - a snapshot's content identity is the exact bytes of `contentCol`
 *    (compared via equality of the previous version's value — no lossy
 *    fingerprint in the semantics; engines may compare however they
 *    like);
 *  - change status per snapshot: `new` (first version of its canonical
 *    URL), `changed` (content differs from the immediately previous
 *    version), `unchanged` otherwise.
 *
 * Scale shape: both operators are ONE hash-partitioned window over the
 * canonical-URL key (plus the map-side normalize projection) — per-key
 * work is bounded by that page's snapshot count, there is no self-join
 * and no global sort, and skew only appears if one URL has pathological
 * snapshot counts (a crawl-scheduler bug upstream, not a data shape).
 */
object Recrawl {

  private def keyed(df: DataFrame, urlCol: String, tsCol: String,
      idCol: String, canonicalCol: Option[String] = None): DataFrame = {
    Seq(urlCol, tsCol, idCol).foreach(c =>
      require(df.columns.contains(c), s"missing column '$c'"))
    require(!df.columns.contains("url_norm"),
      "input already contains reserved column 'url_norm'")
    val base = canonicalCol match {
      case None => col(urlCol)
      case Some(c) =>
        require(df.columns.contains(c), s"missing column '$c'")
        // author-declared canonical (RFC 6596, e.g. Urls.htmlCanonicalUrl)
        // overrides the fetch URL as the version key, but ONLY when it is
        // an absolute http(s) URL — a relative or junk declaration falls
        // back to the fetch URL rather than fusing unrelated pages under
        // a malformed key
        when(lower(col(c)).rlike("^https?://"), col(c)).otherwise(col(urlCol))
    }
    df.withColumn("url_norm", Urls.urlNormalize(base))
  }

  /**
   * Keep exactly the newest snapshot per canonical URL: the input
   * columns plus `url_norm` and `n_versions` (how many snapshots that
   * page had — the crawl-churn signal). One window, no join.
   */
  def keepLatest(df: DataFrame, urlCol: String, tsCol: String,
      idCol: String, canonicalCol: Option[String] = None): DataFrame = {
    require(!df.columns.contains("n_versions"),
      "input already contains reserved column 'n_versions'")
    val w = Window.partitionBy("url_norm")
      .orderBy(col(tsCol).desc, col(idCol).desc)
    keyed(df, urlCol, tsCol, idCol, canonicalCol)
      .withColumn("__graft_rn", row_number().over(w))
      .withColumn("n_versions", count(lit(1)).over(Window.partitionBy("url_norm")))
      .filter(col("__graft_rn") === 1)
      .drop("__graft_rn")
  }

  /**
   * Per-snapshot change log: the input columns plus `url_norm` and
   * `status` in (`new`, `changed`, `unchanged`) — the filter
   * `status <> 'unchanged'` is the incremental re-processing slice.
   */
  def changeLog(df: DataFrame, urlCol: String, tsCol: String,
      idCol: String, contentCol: String,
      canonicalCol: Option[String] = None): DataFrame = {
    require(df.columns.contains(contentCol), s"missing column '$contentCol'")
    require(!df.columns.contains("status"),
      "input already contains reserved column 'status'")
    val w = Window.partitionBy("url_norm")
      .orderBy(col(tsCol).asc, col(idCol).asc)
    keyed(df, urlCol, tsCol, idCol, canonicalCol)
      .withColumn("__graft_rn", row_number().over(w))
      .withColumn("__graft_prev", lag(col(contentCol), 1).over(w))
      // first-version test is positional (row_number), not prev-is-null,
      // so NULL contents compare like any other value (null-safe <=>)
      .withColumn("status",
        when(col("__graft_rn") === 1, "new")
          .when(col("__graft_prev") <=> col(contentCol), "unchanged")
          .otherwise("changed"))
      .drop("__graft_rn", "__graft_prev")
  }
}
