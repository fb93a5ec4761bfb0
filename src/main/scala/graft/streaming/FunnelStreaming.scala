package graft.streaming

import graft.operators.Sessions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming funnel maintenance: an ingest stream of events becomes an
 * ever-current ordered-conversion funnel — the
 * [[graft.operators.Sessions.funnelCounts]] deliverable maintained one
 * micro-batch at a time under the manifest commit protocol the
 * rollup/session/shard/PQ maintainers share
 * ([[TopnStreaming.maintainRollup]] has the full protocol argument).
 *
 * The invariant that makes incremental funnels exact: each key's state
 * is its earliest in-order completion time per step (`t0 .. tN`), and
 * under per-key ts-ordered arrival a SET time can never be beaten by a
 * later event — every new event's timestamp is >= the key's
 * high-watermark >= every set `t_i`. So the batch step is the same
 * iterated conditional min as the batch operator, seeded with the
 * committed state as per-step floors: `t_i' = coalesce(t_i, min batch
 * ts of step i strictly after t_{i-1}')` — where `t_{i-1}'` may itself
 * have been set this batch, so a whole conversion chain arriving in
 * one batch completes in one batch. Out-of-order arrival (a batch
 * event before the key's committed high-watermark) FAILS the batch
 * rather than silently under-counting conversions.
 *
 * `watermarkSeconds > 0` relaxes the ordered-arrival contract to the
 * BOUNDED-DISORDER contract a production ingest actually delivers:
 * events are buffered in a pending store until the event-time
 * high-water mark has moved `watermarkSeconds` past them, then folded
 * in (the Structured Streaming watermark device on the manifest
 * protocol). Every MATURED event is strictly later than every committed
 * step floor (floors come from matured events at or before the previous
 * cut; new arrivals must be after it), so the conditional-min
 * recurrence stays EXACT under any within-watermark shuffle — and an
 * arrival at or before the committed cut still fails the batch loudly,
 * because a set floor may no longer be the true minimum.
 * `watermarkSeconds = 0` (default) is the strict contract,
 * byte-compatible with existing stores; the watermark is pinned into
 * `_graft_params`, so one store cannot mix the two. [[committedCounts]]
 * reports the MATURED prefix — events above the cut are not conversions
 * yet (a later event past the watermark flushes them).
 *
 * Per-batch work is O(batch + touched keys + pending): the state store
 * is read but only the touched keys' rows are rewritten, as a per-batch
 * DELTA folded by per-key argmax on batch id (the [[SessionStreaming]]
 * open-state pattern); the pending buffer is bounded by the disorder
 * window times the ingest rate. [[compactStore]] folds the chain.
 *
 * [[committedCounts]] == `Sessions.funnelCounts` over everything
 * ingested so far, row for row — StreamingSpec pins the equality with
 * conversions that STRADDLE batch boundaries (step i committed, step
 * i+1 arriving batches later) and chains completing inside one batch.
 *
 * Store layout ([[ShardStreaming]]'s crash argument applies verbatim —
 * data first, manifest LAST via temp+rename, replays return before
 * writing):
 * {{{
 *   storePath/_graft_scope        checkpoint identity (write-once)
 *   storePath/_graft_params       steps/keys pin (write-once)
 *   storePath/_manifests/m=<id>   commit marker for batch <id>
 *   storePath/data/b=<id>/state   touched keys' (t0..tN, hw) delta
 * }}}
 */
object FunnelStreaming {

  private val DeltaBatchCol = "__graft_delta_batch"
  private val HwCol = "__graft_hw"

  /** Start the maintenance stream. `events` is a STREAMING DataFrame;
    * each key's events must arrive in non-decreasing `tsCol` order
    * across batches (violations fail the batch; intra-batch order is
    * free). Read the store with [[committedCounts]]. */
  def maintainFunnel(
      events: DataFrame,
      storePath: String,
      keyCols: Seq[String],
      tsCol: String,
      stepCol: String,
      steps: Seq[String],
      checkpointLocation: Option[String] = None,
      watermarkSeconds: Long = 0L,
      filesPerBatch: Int = 1)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val scope = TopnStreaming.scopeOf(checkpointLocation)
    val writer = events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        funnelBatch(batch, batchId, storePath, keyCols, tsCol, stepCol,
          steps, scope, watermarkSeconds, filesPerBatch)
        ()
      }
    checkpointLocation.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** One micro-batch of the protocol (exposed for deterministic
    * crash-path testing; [[maintainFunnel]] drives it). */
  private[graft] def funnelBatch(
      batch: DataFrame,
      batchId: Long,
      storePath: String,
      keyCols: Seq[String],
      tsCol: String,
      stepCol: String,
      steps: Seq[String],
      scope: String,
      watermarkSeconds: Long = 0L,
      filesPerBatch: Int = 1): Unit = {
    require(keyCols.nonEmpty, "funnelBatch: keyCols must be non-empty")
    require(steps.nonEmpty, "funnelBatch: steps must be non-empty")
    require(steps.distinct.size == steps.size,
      s"funnelBatch: steps must be distinct, got $steps")
    require(watermarkSeconds >= 0L,
      s"funnelBatch: watermarkSeconds must be >= 0, got $watermarkSeconds")
    // the reader derives key columns from the store schema as the
    // prefix before the first '__graft_' column — reserved key names
    // would corrupt that derivation
    require(!keyCols.exists(_.startsWith("__graft_")),
      s"funnelBatch: key columns $keyCols collide with internal " +
        "'__graft_*' names; rename them")
    val spark = batch.sparkSession
    val (fs, root) = TopnStreaming.fsOf(spark, storePath)
    TopnStreaming.checkScope(fs, root, scope)
    TopnStreaming.checkStamp(fs, root, "_graft_params",
      paramsOf(keyCols, steps, watermarkSeconds),
      (stored, given) =>
        s"funnel store at $root was maintained with '$stored' but this " +
          s"stream uses '$given' — step ordinals and state columns are " +
          "incompatible; resume with the original parameters or start a " +
          "new store path")
    val committed = TopnStreaming.committedVersion(spark, storePath)
    if (committed.exists(batchId <= _)) return // replay of a committed batch
    if (batch.isEmpty) return // no events: state unchanged, and the
    // high-water mark is EVENT time, so the cut cannot advance either

    val keyC = keyCols.map(col)
    val eNew = batch.select(
      (keyC :+ col(stepCol).as("__graft_step") :+
        Sessions.tsMicros(batch, tsCol).as("__graft_tu")): _*)

    // bounded-disorder tier: the shared release step
    // (StreamWatermark.release) folds pending with the new arrivals,
    // advances the event-time high-water mark, and returns only events
    // at or below (hwm - watermark) — everything else buffers
    val wmUs = watermarkSeconds * 1000000L
    val (e, wmTail) =
      if (watermarkSeconds == 0L) (eNew, None)
      else {
        val (released, tail) = StreamWatermark.release(
          storePath, eNew, df => df("__graft_tu"), wmUs, "funnelBatch")
        (released, Some(tail))
      }

    // touched keys with their batch time range (bmin for the ordered-
    // arrival check, bmax for the new high-watermark)
    val touched = e.groupBy(keyC: _*).agg(
      min(col("__graft_tu")).as("__graft_bmin"),
      max(col("__graft_tu")).as("__graft_bmax"))

    val stateOpt = committedState(spark, storePath)
    val seeded = stateOpt match {
      case None =>
        steps.indices.foldLeft(
          touched.withColumn(HwCol, lit(null).cast("long"))) {
          (acc, i) => acc.withColumn(s"__graft_t$i", lit(null).cast("long"))
        }
      case Some(state) =>
        touched.join(state, keyCols, "left")
          .withColumn(HwCol,
            when(col(HwCol).isNotNull && col("__graft_bmin") < col(HwCol),
              // the ordered-arrival contract is broken: a set t_i may no
              // longer be the true earliest — fail instead of under-counting
              expr(s"""raise_error(CONCAT(
                |'funnelBatch: out-of-order arrival for key ',
                |CAST(`${keyCols.head}` AS STRING),
                |' — batch event at ', CAST(__graft_bmin AS STRING),
                |'us precedes the committed high-watermark ',
                |CAST($HwCol AS STRING),
                |'us; events must arrive per-key ts-ordered across batches'))"""
                .stripMargin).cast("long"))
              .otherwise(col(HwCol)))
    }

    // the batch operator's iterated conditional min, seeded with the
    // committed state as per-step floors
    val updated = steps.zipWithIndex.foldLeft(seeded) { case (acc, (s, i)) =>
      val cand =
        if (i == 0) e.filter(col("__graft_step") === s)
          .groupBy(keyC: _*).agg(min(col("__graft_tu")).as("__graft_m"))
        else e.filter(col("__graft_step") === s)
          .join(acc.select((keyC :+ col(s"__graft_t${i - 1}")): _*), keyCols)
          .filter(col("__graft_tu") > col(s"__graft_t${i - 1}"))
          .groupBy(keyC: _*).agg(min(col("__graft_tu")).as("__graft_m"))
      acc.join(cand, keyCols, "left")
        .withColumn(s"__graft_t$i",
          coalesce(col(s"__graft_t$i"), col("__graft_m")))
        .drop("__graft_m")
    }

    val stateCols =
      keyCols.map(col) ++ steps.indices.map(i => col(s"__graft_t$i")) :+
        greatest(col(HwCol), col("__graft_bmax")).as(HwCol)
    ActivityStreaming.writeBatchDir(
      updated.select((stateCols :+ lit(batchId).as(DeltaBatchCol)): _*),
      filesPerBatch, s"$storePath/data/b=$batchId/state")
    // watermark tier: pending snapshot (latest wins) + hwm row, data
    // before the marker like everything else
    wmTail.foreach { case (pending, hwm) =>
      StreamWatermark.write(spark, storePath, batchId, pending, hwm,
        filesPerBatch)
    }
    ActivityStreaming.writeCommitMarker(fs, root, batchId)
  }

  /** Current per-key state: the delta chain folded with a per-key
    * argmax on batch id. None before the first commit. */
  private[graft] def committedState(
      spark: org.apache.spark.sql.SparkSession, storePath: String)
      : Option[DataFrame] = {
    val ids = ActivityStreaming.committedIds(spark, storePath)
    if (ids.isEmpty) None
    else Some(committedStateFromIds(spark, storePath, ids))
  }

  /** [[committedState]] over an ALREADY-LISTED commit chain — so a
    * caller that needed the ids anyway (committedCounts lists them for
    * the compaction advisory) folds the state without a second
    * commit-marker directory listing (the r17 ADVICE item).
    * No advice here either way: funnelBatch seeds its delta merge from
    * this fold on EVERY micro-batch, and a >64-batch store would WARN
    * once per trigger — the advisory lives in committedCounts, the
    * external read. */
  private def committedStateFromIds(
      spark: org.apache.spark.sql.SparkSession,
      storePath: String,
      ids: Seq[Long]): DataFrame = {
    val all = ActivityStreaming.readChain(spark,
      ids.map(id => s"$storePath/data/b=$id/state"))
    val dataCols = all.columns.filter(_ != DeltaBatchCol)
    val keyCols = dataCols.takeWhile(c => !c.startsWith("__graft_"))
    // one delta row per (key, batch), so max(struct(batch, ...)) IS the
    // latest row — no window, no driver state
    all
      .groupBy(keyCols.map(col): _*)
      .agg(max(struct((col(DeltaBatchCol) +:
        dataCols.filterNot(keyCols.contains).map(col)): _*)).as("__graft_f"))
      .select((keyCols.map(col) ++ dataCols.filterNot(keyCols.contains)
        .map(c => col(s"__graft_f.`$c`").as(c))): _*)
  }

  /** The committed funnel report — `(step_idx, step, n_keys)`,
    * row-for-row equal to `Sessions.funnelCounts` over the full event
    * history. `keyCols`/`steps` must match the store's pinned values
    * (fails fast otherwise). Empty-schema DataFrame before the first
    * commit. */
  def committedCounts(
      spark: org.apache.spark.sql.SparkSession,
      storePath: String,
      keyCols: Seq[String],
      steps: Seq[String],
      watermarkSeconds: Long = 0L): DataFrame = {
    val (fs, root) = TopnStreaming.fsOf(spark, storePath)
    TopnStreaming.checkStamp(fs, root, "_graft_params",
      paramsOf(keyCols, steps, watermarkSeconds),
      (stored, given) =>
        s"funnel store at $root was maintained with '$stored' but this " +
          s"reader asks for '$given' — the stored step times do not mean " +
          "what this report would claim")
    // ONE commit-marker listing serves both the advisory and the state
    // fold (the per-read double listing was the r17 ADVICE item)
    val ids = ActivityStreaming.committedIds(spark, storePath)
    ActivityStreaming.adviseCompaction(ids.size, storePath, "FunnelStreaming")
    if (ids.isEmpty) spark.emptyDataFrame
    else Sessions.countsFromTimes(
      committedStateFromIds(spark, storePath, ids), steps)
  }

  /**
   * One-call fold of the state chain into a FRESH store at `dstPath`
   * (must not already hold a funnel store): a single data directory
   * `b=<committed version>` holding the folded per-key state, with
   * scope and params copied so the SAME stream resumes against
   * `dstPath`. Run it when the chain's file count starts to dominate
   * read planning. `files` > 1 parallelizes the fold's write
   * ([[ActivityStreaming.writeFoldDir]]).
   */
  def compactStore(
      spark: org.apache.spark.sql.SparkSession,
      srcPath: String,
      dstPath: String,
      files: Int = 1): Unit = {
    val ids = ActivityStreaming.committedIds(spark, srcPath)
    require(ids.nonEmpty, s"compactStore: no committed batches at $srcPath")
    require(ActivityStreaming.committedIds(spark, dstPath).isEmpty,
      s"compactStore: $dstPath already holds a committed funnel store")
    val v = ids.max
    val (fs, root) = TopnStreaming.fsOf(spark, srcPath)
    val (dfs, droot) = TopnStreaming.fsOf(spark, dstPath)
    // stamps FIRST: a destination pinned to another stream fails before
    // any data lands there (copyStamps enforces write-once)
    ActivityStreaming.copyStamps(fs, root, dfs, droot)
    ActivityStreaming.writeFoldDir(
      committedState(spark, srcPath).get.withColumn(DeltaBatchCol, lit(v)),
      files, s"$dstPath/data/b=$v/state")
    // a watermark-tier store also carries its buffered tail + hwm
    StreamWatermark.compactInto(spark, srcPath, dstPath, v, files)
    ActivityStreaming.writeCommitMarker(dfs, droot, v)
  }

  private def paramsOf(
      keyCols: Seq[String], steps: Seq[String], watermarkSeconds: Long): String =
    s"steps=${steps.mkString(">")},keys=${keyCols.mkString("+")}" +
      StreamWatermark.paramsSuffix(watermarkSeconds)
}
