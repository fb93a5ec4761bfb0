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
   * Returns the StreamingQuery; the caller owns its lifecycle. Read the
   * maintained table with [[committedRollup]].
   *
   * Crash safety — the commit protocol:
   *  - each merged state is written to a FRESH versioned directory
   *    `rollupPath/v=<batchId>` (never overwriting the directory the plan
   *    reads, so no lineage truncation / localCheckpoint is needed);
   *  - a version counts as committed iff its `_SUCCESS` file exists —
   *    Hadoop's commit protocol writes it only after every task file has
   *    been moved into place, so it IS the atomic commit point;
   *  - the committed state is simply the highest-numbered successful
   *    version ([[committedVersion]]); there is no separate pointer file
   *    that could be torn or go stale;
   *  - a replayed batch (id <= committed version) is skipped; a batch that
   *    crashed mid-write left no `_SUCCESS`, so its replay recomputes the
   *    SAME version directory from the SAME predecessor — never a double
   *    count;
   *  - versions older than the predecessor of the committed one are
   *    deleted after each successful commit.
   *
   * Restart discipline: batch ids are meaningful only within one streaming
   * checkpoint. A `_graft_scope` file (written once, temp+rename) records
   * the checkpoint identity when `checkpointLocation` is given; resuming
   * the rollup under a DIFFERENT checkpoint fails fast with guidance
   * instead of silently skipping or double-counting replayed batches.
   */
  def maintainRollup(
      events: DataFrame,
      rollupPath: String,
      periodExpr: org.apache.spark.sql.Column,
      groupCol: String,
      itemExpr: org.apache.spark.sql.Column,
      numCounters: Int = GraftConf.DefaultNumberOfCounters,
      checkpointLocation: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val writer = events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, batchId, rollupPath, periodExpr, groupCol, itemExpr,
          numCounters, scopeOf(checkpointLocation))
        ()
      }
    checkpointLocation.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  private def scopeOf(checkpointLocation: Option[String]): String =
    checkpointLocation
      .map(c => java.security.MessageDigest.getInstance("MD5")
        .digest(c.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString)
      .getOrElse("unscoped")

  private def fsOf(spark: org.apache.spark.sql.SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Highest-numbered version under `rollupPath` whose `_SUCCESS` marker
    * exists — the committed state. None before the first commit. */
  def committedVersion(
      spark: org.apache.spark.sql.SparkSession, rollupPath: String): Option[Long] = {
    val (fs, root) = fsOf(spark, rollupPath)
    if (!fs.exists(root)) None
    else {
      val versions = fs.listStatus(root).toSeq
        .filter(_.isDirectory)
        .flatMap { st =>
          val name = st.getPath.getName
          if (name.startsWith("v="))
            scala.util.Try(name.stripPrefix("v=").toLong).toOption
              .filter(_ => fs.exists(new org.apache.hadoop.fs.Path(st.getPath, "_SUCCESS")))
          else None
        }
      if (versions.isEmpty) None else Some(versions.max)
    }
  }

  /** The committed rollup table: (period, group, sketch). Empty-schema
    * DataFrame before the first commit (same contract callers had when the
    * path did not exist yet). */
  def committedRollup(
      spark: org.apache.spark.sql.SparkSession, rollupPath: String): DataFrame =
    committedVersion(spark, rollupPath) match {
      case Some(v) => spark.read.parquet(s"$rollupPath/v=$v")
      case None => spark.emptyDataFrame
    }

  /** One micro-batch of the rollup maintenance protocol (exposed for
    * deterministic crash-path testing; `maintainRollup` drives it from
    * `foreachBatch`). */
  private[graft] def mergeBatch(
      batch: DataFrame,
      batchId: Long,
      rollupPath: String,
      periodExpr: org.apache.spark.sql.Column,
      groupCol: String,
      itemExpr: org.apache.spark.sql.Column,
      numCounters: Int,
      scope: String): Unit = {
    val spark = batch.sparkSession
    val (fs, root) = fsOf(spark, rollupPath)
    checkScope(fs, root, scope)

    val committed = committedVersion(spark, rollupPath)
    if (committed.exists(batchId <= _)) return // replay of a committed batch

    val delta = batch
      .groupBy(periodExpr.as("period"), col(groupCol))
      .agg(TopnFunctions.topn_add_agg(itemExpr, numCounters).as("sketch"))

    val merged = committed match {
      case None => delta
      case Some(v) =>
        val old = spark.read.parquet(s"$rollupPath/v=$v")
          .withColumnRenamed("sketch", "old_sketch")
        delta.join(old, Seq("period", groupCol), "full_outer")
          .select(col("period"), col(groupCol),
            when(col("old_sketch").isNull, col("sketch"))
              .when(col("sketch").isNull, col("old_sketch"))
              .otherwise(TopnFunctions.topn_union(
                col("old_sketch"), col("sketch"))).as("sketch"))
    }

    // fresh directory per version: the plan reads v=<committed> and writes
    // v=<batchId>; _SUCCESS (written last by the Hadoop commit protocol)
    // is the atomic commit point. A crash anywhere before it leaves the
    // committed version untouched and the replay recomputes this directory.
    merged.write.mode("overwrite").partitionBy("period")
      .parquet(s"$rollupPath/v=$batchId")

    // retain the new version and its predecessor (for concurrent readers
    // mid-scan); drop everything older
    val keep = Set(Some(batchId), committed).flatten
    fs.listStatus(root).toSeq.filter(_.isDirectory).foreach { st =>
      val name = st.getPath.getName
      if (name.startsWith("v=")) {
        scala.util.Try(name.stripPrefix("v=").toLong).toOption.foreach { v =>
          if (!keep.contains(v)) fs.delete(st.getPath, true)
        }
      }
    }
  }

  /** First writer records the scope (temp+rename, so never torn); later
    * batches must match it. Catches the "fresh checkpoint over an existing
    * rollup" operator error, where batch ids restart at 0 and would be
    * silently skipped as replays (data loss) or re-merged (double count). */
  private def checkScope(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      scope: String): Unit = {
    val scopePath = new org.apache.hadoop.fs.Path(root, "_graft_scope")
    if (fs.exists(scopePath)) {
      val len = fs.getFileStatus(scopePath).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(scopePath)
      try in.readFully(0, buf) finally in.close()
      val stored = new String(buf, java.nio.charset.StandardCharsets.UTF_8).trim
      if (stored != scope) {
        throw new IllegalStateException(
          s"rollup at $root was maintained under a different streaming " +
            s"checkpoint (scope $stored, this query: $scope). Batch ids are " +
            "only meaningful within one checkpoint; continuing would " +
            "double-count or silently drop replayed batches. Resume with the " +
            "original checkpointLocation, or start a NEW rollup path (and " +
            "optionally seed it from the old one with topn_union).")
      }
    } else {
      val tmp = new org.apache.hadoop.fs.Path(root,
        s"_graft_scope.tmp-${java.util.UUID.randomUUID()}")
      fs.mkdirs(root)
      val out = fs.create(tmp, true)
      try out.write(scope.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (!fs.rename(tmp, scopePath)) {
        // concurrent first-writer won the rename: re-check against theirs
        fs.delete(tmp, false)
        checkScope(fs, root, scope)
      }
    }
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
