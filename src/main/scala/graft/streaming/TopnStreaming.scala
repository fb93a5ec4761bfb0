package graft.streaming

import graft.{GraftConf, TopnFunctions}
import graft.core.TopnState

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured-Streaming extensions of the topn sketch family (beyond the
 * reference's surface — its "incremental" story is INSERT-then-merge rollup
 * tables, reference README.md:73-116; streams are the Spark-native
 * continuation of that design).
 *
 * Two tiers:
 *
 *  - [[windowedSketches]]: event-time tumbling-window sketch build — the
 *    streaming twin of the batch "daily rollup" pattern. Uses the same
 *    `topn_add_agg` aggregate inside a watermarked window aggregation, so
 *    each micro-batch folds rows into per-window sketch state and late data
 *    past the watermark is dropped. Emitted (append-mode, on watermark
 *    close) rows land in the same `map<string,bigint>` rollup tables the
 *    batch path re-aggregates with `topn_union_agg`.
 *
 *  - [[runningTopK]]: per-key continuously-updated top-k via
 *    `mapGroupsWithState` holding a [[TopnState]] (same eviction semantics,
 *    same serialized wire format as the aggregate buffer). Emits the
 *    current top-k per key on every trigger — the "live dashboard" shape.
 *
 * Scale notes: state per key is bounded (<= 3n counters, the reference's
 * cap), so state-store size is O(keys * n) regardless of stream volume;
 * both shapes shuffle only by group key, identical to the batch plans.
 */
object TopnStreaming {

  /** Event-time tumbling-window sketches:
    * (window_start, window_end, groupCol, sketch). */
  def windowedSketches(
      events: DataFrame,
      tsCol: String,
      groupCol: String,
      itemCol: String,
      windowDuration: String,
      watermark: String,
      numCounters: Int = GraftConf.DefaultNumberOfCounters): DataFrame = {
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDuration), col(groupCol))
      .agg(TopnFunctions.topn_add_agg(col(itemCol).cast("string"), numCounters).as("sketch"))
      .select(
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col(groupCol),
        col("sketch"))
  }

  /**
   * Maintain a parquet rollup table of per-(period, group) sketches from a
   * RAW event stream — the streaming twin of the reference's
   * "INSERT INTO rollup SELECT topn_add_agg(...) GROUP BY period" loop
   * (reference README.md:73-116). Each micro-batch is a true delta: it is
   * aggregated with `topn_add_agg` inside `foreachBatch` (plain batch
   * aggregation, no streaming state to double-count) and merged into the
   * stored sketches with `topn_union(old, delta)` — exactly the
   * incremental-rollup algebra the mergeable sketch exists for.
   *
   * Returns the StreamingQuery; the caller owns its lifecycle. Overwrite
   * granularity is the period partition (dynamic partition overwrite), so
   * only periods touched by a batch are rewritten.
   *
   * Failure semantics: the rollup is only treated as absent when the path
   * genuinely does not exist (checked via the Hadoop FileSystem) — a
   * transient read failure propagates and fails the batch rather than
   * silently discarding accumulated history. Replays are idempotent: the
   * last merged batchId is recorded in a `_graft_last_batch` marker next to
   * the data, and a batch whose id is <= the marker is skipped (foreachBatch
   * re-delivers the same batchId after a restart).
   */
  def maintainRollup(
      events: DataFrame,
      rollupPath: String,
      periodExpr: org.apache.spark.sql.Column,
      groupCol: String,
      itemExpr: org.apache.spark.sql.Column,
      numCounters: Int = GraftConf.DefaultNumberOfCounters)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.functions._
    events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        val hconf = spark.sparkContext.hadoopConfiguration
        val dataPath = new org.apache.hadoop.fs.Path(rollupPath)
        val fs = dataPath.getFileSystem(hconf)
        val marker = new org.apache.hadoop.fs.Path(rollupPath + "/_graft_last_batch")
        val lastCommitted: Long =
          if (fs.exists(marker)) {
            val len = fs.getFileStatus(marker).getLen.toInt
            val buf = new Array[Byte](len)
            val in = fs.open(marker)
            try in.readFully(0, buf) finally in.close()
            new String(buf, java.nio.charset.StandardCharsets.UTF_8).trim.toLong
          } else -1L
        if (batchId <= lastCommitted) {
          // replay of an already-merged batch after a restart: skip
          ()
        } else {
        val delta = batch
          .groupBy(periodExpr.as("period"), col(groupCol))
          .agg(TopnFunctions.topn_add_agg(itemExpr, numCounters).as("sketch"))
        // Absent path => first batch. Any OTHER read failure must propagate:
        // treating it as "no data" would overwrite history with this delta.
        val existing =
          if (fs.exists(dataPath) && fs.globStatus(
              new org.apache.hadoop.fs.Path(rollupPath + "/period=*")).nonEmpty)
            spark.read.parquet(rollupPath)
          else spark.emptyDataFrame
        val merged =
          if (existing.columns.isEmpty) delta
          else {
            // only periods touched by this batch participate (dynamic
            // partition overwrite leaves the rest untouched on disk)
            val old = existing
              .join(delta.select(col("period")).distinct(), Seq("period"), "left_semi")
              .withColumnRenamed("sketch", "old_sketch")
            delta.join(old, Seq("period", groupCol), "full_outer")
              .select(col("period"), col(groupCol),
                when(col("old_sketch").isNull, col("sketch"))
                  .when(col("sketch").isNull, col("old_sketch"))
                  .otherwise(TopnFunctions.topn_union(
                    col("old_sketch"), col("sketch"))).as("sketch"))
          }
        // truncate lineage: the write overwrites the path the plan reads
        merged.localCheckpoint(eager = true)
          .write.mode("overwrite")
          .partitionBy("period")
          .parquet(rollupPath)
        val out = fs.create(marker, true)
        try out.write(batchId.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        }
        ()
      }
      .start()
  }

  case class KeyedItem(key: String, item: String)
  case class TopEntry(key: String, item: String, frequency: Long)

  /**
   * Continuously-updated per-key top-k over an unwindowed stream.
   * State: the serialized TopnState (compact varint framing — the same
   * bytes the batch aggregate ships between partial and final stages).
   */
  def runningTopK(
      items: Dataset[KeyedItem],
      k: Int,
      numCounters: Int = GraftConf.DefaultNumberOfCounters): Dataset[TopEntry] = {
    import items.sparkSession.implicits._
    items
      .groupByKey(_.key)
      .flatMapGroupsWithState[Array[Byte], TopEntry](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[KeyedItem], state: GroupState[Array[Byte]]) =>
          val st =
            if (state.exists) TopnState.deserialize(state.get)
            else TopnState.empty()
          rows.foreach { r =>
            if (r.item != null) st.add(r.item, numCounters)
          }
          state.update(st.serialize())
          st.topK(math.min(k, numCounters), numCounters).iterator
            .map { case (item, freq) => TopEntry(key, item, freq) }
      }
  }
}
