package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * The streaming twin of the crawl front door (`pipeline_crawl_corpus`'s
 * batch chain): a file stream of WARC shards — the shape a live crawl
 * actually delivers, shard files landing in a directory — parsed,
 * text-extracted, admitted exactly once per canonical URL, and gated by a
 * frozen quality model, all inside one continuous query.
 *
 * Every stage is the SAME kernel the batch path runs: `Warc.warcDocuments`
 * (a pure flatMap, so it lifts into a stream unchanged), `Urls.urlNormalize`
 * + `TextAnalysis.htmlToText` (pure projections), the first-wins dedup as
 * keyed state (the [[TopnStreaming.streamingExactDedup]] pattern keyed by
 * canonical URL instead of content fingerprint), and
 * `Classifier.scoreColumn` (the per-row frozen-model spelling built for
 * exactly this seat — no join, no aggregation, weights embedded in the
 * plan). Batch/stream equality is therefore structural, and StreamingSpec
 * asserts it end to end.
 *
 * Scale shape: per-shard work is linear decompress+parse (executor-local,
 * no shuffle); the only stateful stage is the URL dedup, whose state is
 * one empty-value row per canonical URL — O(distinct URLs), the minimum
 * any exactly-once admission can hold. For unbounded crawls pass
 * `stateTtl`: a URL idle past the TTL is forgotten and a much-later
 * re-crawl would be re-admitted — the standard state-size/recall trade,
 * decided by the caller.
 */
object WarcStreaming {

  /** One admitted crawl document: canonical URL key, the URI as crawled,
    * and the extracted text. */
  case class AdmittedDoc(url_norm: String, target_uri: String, text: String)

  /**
   * WARC shard stream -> admitted, quality-gated documents.
   *
   * `warcShards` is a `binaryFile`-source stream (or any relation with
   * `path` STRING + `content` BINARY): each file is one WARC shard, plain
   * or gzipped — `Warc.warcDocuments` sniffs per file. Truncated records
   * are dropped at the door (their HTML is clipped mid-byte; admitting
   * them would poison the text stage). Output columns:
   * `(url_norm, target_uri, text, score_e6)` — Update-mode rows, one per
   * FIRST sighting of each canonical URL that clears `minScoreE6`.
   *
   * Within one micro-batch the admitted copy of a URL is the minimum
   * `(target_uri, text)` — pinned so replays and the batch twin agree;
   * across batches the earlier batch always wins (keyed state).
   */
  def streamingWarcIngest(
      warcShards: DataFrame,
      model: graft.pipeline.Classifier.Model,
      minScoreE6: Long,
      stateTtl: Option[String] = None,
      robotsRules: Option[DataFrame] = None,
      blockTerms: Seq[String] = Nil): DataFrame = {
    import warcShards.sparkSession.implicits._
    val files: Dataset[graft.pipeline.Warc.WarcFile] = warcShards
      .select(col("path").cast("string"), col("content"))
      .as[(String, Array[Byte])]
      .map { case (p, bytes) =>
        // the file id only labels provenance; a stable hash of the path
        // keeps the mapper a pure function of its input
        graft.pipeline.Warc.WarcFile(
          scala.util.hashing.MurmurHash3.stringHash(p).toLong, bytes)
      }
    val extracted = graft.pipeline.Warc.warcDocuments(files)
      .filter(!col("truncated"))
      .select(
        graft.pipeline.Urls.urlNormalize(col("target_uri")).as("url_norm"),
        col("target_uri"),
        graft.pipeline.TextAnalysis.htmlToText(col("html")).as("text"))
    // robots admission runs BEFORE the URL-dedup state: a disallowed URL
    // must not occupy state (a later allow-listed variant of the same
    // canonical URL should still be admissible). The packed-rules gate is
    // a stream-static join + projection — stream-legal by construction
    // (robotsRules is a frozen static snapshot, same doctrine as `model`)
    val parsed = robotsRules
      .map(r => graft.pipeline.Robots.filterDisallowedPacked(
        extracted, "target_uri", graft.pipeline.Robots.packRules(r)))
      .getOrElse(extracted)
      .as[AdmittedDoc]

    val timeout =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    val admitted = parsed
      .groupByKey(_.url_norm)
      .flatMapGroupsWithState[Boolean, AdmittedDoc](OutputMode.Update(), timeout) {
        (_: String, rows: Iterator[AdmittedDoc], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val isNew = !state.exists
            state.update(true)
            stateTtl.foreach(state.setTimeoutDuration)
            if (isNew && rows.hasNext)
              Iterator.single(rows.minBy(r => (r.target_uri, r.text)))
            else Iterator.empty
          }
      }

    // the frozen content gates are pure projections over the admitted
    // rows — they compose after the stateful stage with no extra
    // output-mode machinery (the reason scoreColumn and
    // blocklistHitCount exist as projection columns). Content gates run
    // AFTER admission state deliberately, unlike the robots POLICY gate:
    // a page that failed on content still claims its canonical URL slot,
    // matching the batch pipelines' admit-then-filter order.
    val scored = admitted.toDF()
      .withColumn("score_e6",
        graft.pipeline.Classifier.scoreColumn(col("text"), model))
      .filter(col("score_e6") >= minScoreE6)
    if (blockTerms.isEmpty) scored
    else scored.filter(
      graft.pipeline.Quality.blocklistHitCount(col("text"), blockTerms) === 0L)
  }
}
