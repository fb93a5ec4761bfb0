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
   * Crash safety — the manifest commit protocol. Layout:
   * {{{
   *   rollupPath/_graft_scope          checkpoint identity (written once)
   *   rollupPath/_manifests/m=<id>     one manifest per committed batch
   *   rollupPath/data/b=<id>/          parquet: periods TOUCHED by batch id,
   *                                    fully merged as of that batch
   * }}}
   *  - a batch writes ONLY its touched periods (merged with their previous
   *    state) into a fresh `data/b=<batchId>` directory — per-batch work is
   *    O(touched periods), not O(rollup history);
   *  - the manifest maps every live period to the data directory holding
   *    its current rows; it is written to a NEW file via temp+rename, so
   *    the single atomic rename IS the commit point (no torn pointer, no
   *    _SUCCESS races);
   *  - the committed state is the highest-numbered manifest
   *    ([[committedVersion]]); a replayed batch (id <= it) is skipped; a
   *    batch that crashed mid-write left no manifest, so its replay
   *    recomputes the SAME data directory from the SAME predecessors —
   *    never a double count;
   *  - `period` is stored as an ordinary STRING data column (not a
   *    partition directory), so no partition-value type inference can
   *    fork date- or number-shaped periods;
   *  - empty batches commit nothing and touch nothing;
   *  - data directories referenced by neither the new nor the previous
   *    manifest are deleted after each commit (the previous manifest's
   *    window protects readers mid-scan). A directory whose periods were
   *    partially re-touched by later batches keeps its stale rows on disk
   *    (readers filter them by the manifest's period map) until its last
   *    referenced period moves — bounded read amplification in exchange
   *    for never rewriting untouched periods.
   *
   * Restart discipline: batch ids are meaningful only within one streaming
   * checkpoint. A `_graft_scope` file records the checkpoint identity;
   * resuming the rollup under a DIFFERENT checkpoint fails fast with
   * guidance instead of silently skipping or double-counting replayed
   * batches. Without `checkpointLocation` the scope is unique per
   * `maintainRollup` call, so a checkpoint-less rollup cannot be resumed
   * (there is no safe way to resume one — the source would replay from
   * scratch).
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
    val scope = scopeOf(checkpointLocation)
    val writer = events.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, batchId, rollupPath, periodExpr, groupCol, itemExpr,
          numCounters, scope)
        ()
      }
    checkpointLocation.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  private[streaming] def scopeOf(checkpointLocation: Option[String]): String =
    checkpointLocation
      .map(c => java.security.MessageDigest.getInstance("MD5")
        .digest(c.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString)
      // no checkpoint -> no safe resume; a fresh scope per call makes any
      // restart over the same rollup fail fast instead of dropping batches
      .getOrElse(s"ephemeral-${java.util.UUID.randomUUID()}")

  private[streaming] def fsOf(spark: org.apache.spark.sql.SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Rollup key for rows whose period expression evaluates to null. */
  val NullPeriodKey = "__GRAFT_NULL_PERIOD__"

  private def manifestDir(root: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(root, "_manifests")

  /** Highest-numbered committed manifest id. None before the first commit.
    * Fails fast on a rollup written by the pre-manifest layout (v=<id>
    * directories) instead of silently reading it as empty. */
  def committedVersion(
      spark: org.apache.spark.sql.SparkSession, rollupPath: String): Option[Long] = {
    val (fs, root) = fsOf(spark, rollupPath)
    val dir = manifestDir(root)
    if (!fs.exists(dir)) {
      if (fs.exists(root) && fs.listStatus(root).exists(st =>
          st.isDirectory && st.getPath.getName.startsWith("v="))) {
        throw new IllegalStateException(
          s"rollup at $root uses the legacy v=<id> directory layout; this " +
            "version reads manifest-committed rollups only. Migrate by " +
            "reading the newest v= directory and seeding a new rollup path " +
            "from it (or re-run the stream from scratch).")
      }
      None
    }
    else {
      val ids = fs.listStatus(dir).toSeq.flatMap { st =>
        val name = st.getPath.getName
        if (name.startsWith("m="))
          scala.util.Try(name.stripPrefix("m=").toLong).toOption
        else None
      }
      if (ids.isEmpty) None else Some(ids.max)
    }
  }

  /** Manifest contents: period -> id of the data directory holding its
    * current rows. Lines are `<dirId>\t<urlencoded period>`. */
  private def readManifest(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      version: Long): Map[String, Long] = {
    val p = new org.apache.hadoop.fs.Path(manifestDir(root), s"m=$version")
    val len = fs.getFileStatus(p).getLen.toInt
    val buf = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, buf) finally in.close()
    new String(buf, java.nio.charset.StandardCharsets.UTF_8)
      .split("\n").iterator.filter(_.nonEmpty).map { line =>
        val Array(ver, enc) = line.split("\t", 2)
        java.net.URLDecoder.decode(enc, "UTF-8") -> ver.toLong
      }.toMap
  }

  private def writeManifest(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      version: Long,
      entries: Map[String, Long]): Unit = {
    val dir = manifestDir(root)
    fs.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".m=$version.tmp-${java.util.UUID.randomUUID()}")
    val body = entries.toSeq.sorted.map { case (period, ver) =>
      s"$ver\t${java.net.URLEncoder.encode(period, "UTF-8")}"
    }.mkString("\n")
    val out = fs.create(tmp, true)
    try out.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val dst = new org.apache.hadoop.fs.Path(dir, s"m=$version")
    // dst never exists (replays return before writing); rename is atomic.
    // If a concurrent zombie driver committed the same batch first, its
    // manifest is byte-identical (deterministic content) — accept it, but
    // never leave the tmp file behind.
    if (!fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      if (!fs.exists(dst)) {
        throw new java.io.IOException(s"could not commit manifest $dst")
      }
    }
  }

  /** Assemble the table for a manifest: union of the referenced data dirs,
    * each filtered to the keys (`keyCol` values) the manifest maps to it. */
  private def manifestTable(
      spark: org.apache.spark.sql.SparkSession,
      rollupPath: String,
      manifest: Map[String, Long],
      keyCol: String = "period"): Option[DataFrame] =
    manifest.groupBy(_._2).map { case (dirId, byKey) =>
      spark.read.parquet(s"$rollupPath/data/b=$dirId")
        .filter(col(keyCol).isin(byKey.keys.toSeq: _*))
    }.reduceOption(_ unionAll _)

  /** The committed rollup table: (period, group, sketch). Empty-schema
    * DataFrame before the first commit (same contract callers had when the
    * path did not exist yet). */
  def committedRollup(
      spark: org.apache.spark.sql.SparkSession, rollupPath: String): DataFrame = {
    val (fs, root) = fsOf(spark, rollupPath)
    committedVersion(spark, rollupPath)
      .flatMap(v => manifestTable(spark, rollupPath, readManifest(fs, root, v)))
      .getOrElse(spark.emptyDataFrame)
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
    if (batch.isEmpty) return // nothing to merge; commit nothing

    // period is an ordinary STRING data column end to end (never a
    // partition directory), so date-/number-shaped periods cannot be
    // re-typed by partition-value inference on read. Rows whose period
    // evaluates to null (e.g. a null event time) roll up under a
    // distinguished key instead of NPE-ing the manifest writer — the same
    // move Hive's default partition makes.
    val delta = batch
      .groupBy(coalesce(periodExpr.cast("string"), lit(NullPeriodKey)).as("period"),
        col(groupCol))
      .agg(TopnFunctions.topn_add_agg(itemExpr, numCounters).as("sketch"))
      .cache()
    try {
      val touched = delta.select("period").distinct()
        .collect().map(_.getString(0)).toSet
      val manifest = committed.map(readManifest(fs, root, _)).getOrElse(Map.empty)

      // previous state of ONLY the touched periods — per-batch read/merge/
      // write cost is proportional to the batch, not the rollup's history
      val oldTouched = manifestTable(spark, rollupPath,
        manifest.view.filterKeys(touched).toMap)

      val merged = oldTouched match {
        case None => delta
        case Some(old) =>
          delta.join(old.withColumnRenamed("sketch", "old_sketch"),
            Seq("period", groupCol), "full_outer")
            .select(col("period"), col(groupCol),
              when(col("old_sketch").isNull, col("sketch"))
                .when(col("sketch").isNull, col("old_sketch"))
                .otherwise(TopnFunctions.topn_union(
                  col("old_sketch"), col("sketch"))).as("sketch"))
      }

      merged.write.mode("overwrite").parquet(s"$rollupPath/data/b=$batchId")

      // the atomic commit: one rename of the new manifest file
      val newManifest = manifest ++ touched.iterator.map(_ -> batchId)
      writeManifest(fs, root, batchId, newManifest)

      // drop data dirs referenced by neither the new nor the previous
      // manifest (readers of the previous committed state stay safe), and
      // manifests older than the previous one
      val live = newManifest.values.toSet ++ manifest.values.toSet
      val dataRoot = new org.apache.hadoop.fs.Path(root, "data")
      if (fs.exists(dataRoot)) {
        fs.listStatus(dataRoot).toSeq.filter(_.isDirectory).foreach { st =>
          scala.util.Try(st.getPath.getName.stripPrefix("b=").toLong).toOption
            .foreach { id => if (!live.contains(id)) fs.delete(st.getPath, true) }
        }
      }
      fs.listStatus(manifestDir(root)).toSeq.foreach { st =>
        scala.util.Try(st.getPath.getName.stripPrefix("m=").toLong).toOption
          .foreach { id =>
            if (id < committed.getOrElse(batchId)) fs.delete(st.getPath, false)
          }
      }
    } finally delta.unpersist()
  }

  // ---- streaming duplicate-cluster maintenance ---------------------------

  /** Internal labels bucket column (stored as STRING, like `period`). */
  private val BucketCol = "__graft_bucket"

  /**
   * Maintain a duplicate-cluster labeling over a STREAM of near-dup pairs
   * (e.g. the output of [[streamingNearDupPairs]] routed through a sink,
   * or any upstream pair source): per micro-batch, fold the new pairs into
   * the committed labeling with
   * [[graft.pipeline.Clustering.incrementalUpdateDelta]] — new-edges-sized
   * work, not corpus-sized — and commit with the same atomic manifest
   * protocol as [[maintainRollup]] (temp+rename manifest, replay-idempotent
   * by batch id, `_graft_scope` checkpoint binding, data directories
   * garbage-collected once neither the new nor the previous manifest
   * references them).
   *
   * Commit I/O is O(touched buckets), not O(corpus labels): the labeling
   * is partitioned into `numBuckets` stable hash buckets of doc_id, the
   * manifest maps each bucket to the data directory holding its current
   * rows, and a batch rewrites ONLY the buckets containing relabeled or
   * new docs — the rollup's touched-period device applied to labels.
   * Buckets untouched by a batch are not read, not rewritten, and their
   * files stay byte-identical on disk (StreamingSpec asserts this).
   * `numBuckets` is pinned at first commit (a `_graft_cluster_buckets`
   * stamp) — changing it would silently re-bucket docs and orphan rows,
   * so a mismatch fails fast. As with the rollup, a directory whose
   * buckets were partially re-touched by later batches keeps stale rows
   * on disk until its last referenced bucket moves (readers filter by the
   * manifest's bucket map) — bounded read amplification in exchange for
   * never rewriting untouched buckets.
   *
   * Read the committed labeling with [[committedClusters]].
   */
  def maintainClusters(
      pairs: DataFrame,
      labelsPath: String,
      aCol: String,
      bCol: String,
      checkpointLocation: Option[String] = None,
      numBuckets: Int = 64)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val scope = scopeOf(checkpointLocation)
    val writer = pairs.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        clusterBatch(batch, batchId, labelsPath, aCol, bCol, scope, numBuckets)
        ()
      }
    checkpointLocation.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** Stable bucket of a doc id, any orderable id type. Stored as string —
    * same move as the rollup's `period` (no partition-value inference). */
  private def bucketOf(id: org.apache.spark.sql.Column, numBuckets: Int) =
    pmod(xxhash64(id), lit(numBuckets.toLong)).cast("string")

  /** One micro-batch of cluster maintenance (exposed for deterministic
    * crash/replay testing; [[maintainClusters]] drives it). */
  private[graft] def clusterBatch(
      batch: DataFrame,
      batchId: Long,
      labelsPath: String,
      aCol: String,
      bCol: String,
      scope: String,
      numBuckets: Int = 64,
      commitOnEmpty: Boolean = false): Unit = {
    require(numBuckets >= 1, s"numBuckets must be >= 1, got $numBuckets")
    val spark = batch.sparkSession
    val (fs, root) = fsOf(spark, labelsPath)
    checkScope(fs, root, scope)
    checkStamp(fs, root, "_graft_cluster_buckets", numBuckets.toString,
      (stored, given) =>
        s"labels at $root were bucketed with numBuckets=$stored; this query " +
          s"uses numBuckets=$given. Bucket membership is a pure function of " +
          "numBuckets, so changing it would re-bucket docs and orphan their " +
          "old rows. Resume with the original numBuckets, or rebuild the " +
          "labels path from scratch.")

    val committed = committedVersion(spark, labelsPath)
    if (committed.exists(batchId <= _)) return // replay of a committed batch
    val manifest = committed.map(readManifest(fs, root, _)).getOrElse(Map.empty)
    if (batch.isEmpty) {
      // a PAIRS batch can be legitimately empty while its source batch was
      // not (semantic wiring: vectors arrived, none near-duplicate) — the
      // caller then needs the committed version to advance so the read
      // side sees the new vectors. Plain pair streams keep the original
      // commit-nothing behavior.
      if (commitOnEmpty) writeManifest(fs, root, batchId, manifest)
      return
    }

    // changed/new labels only — bounded by the members of touched
    // components, never the corpus
    // a committed-but-empty manifest (only empty-delta batches so far)
    // has no labels table to contract against — fresh CC, like first commit
    val delta = (manifestTable(spark, labelsPath, manifest, BucketCol)
      .map(_.drop(BucketCol)) match {
      case None =>
        graft.pipeline.Clustering.connectedComponents(batch, aCol, bCol)
      case Some(current) =>
        graft.pipeline.Clustering.incrementalUpdateDelta(
          current, batch, aCol, bCol)
    }).withColumn(BucketCol, bucketOf(col("doc_id"), numBuckets))
      .cache()
    try {
      val touched = delta.select(BucketCol).distinct()
        .collect().map(_.getString(0)).toSet

      if (touched.isEmpty) {
        // pairs were all self-loops or internal to existing clusters: no
        // label moved. Commit the unchanged manifest so the batch id still
        // advances (replay detection stays exact), write no data.
        writeManifest(fs, root, batchId, manifest)
      } else {
        // previous state of ONLY the touched buckets; changed docs' old
        // rows are replaced, the bucket's other rows carry over
        val oldTouched = manifestTable(spark, labelsPath,
          manifest.view.filterKeys(touched).toMap, BucketCol)
        val merged = oldTouched match {
          case None => delta
          case Some(old) =>
            old.join(delta.select(col("doc_id")), Seq("doc_id"), "left_anti")
              .unionByName(delta)
        }
        merged.write.mode("overwrite").parquet(s"$labelsPath/data/b=$batchId")
        writeManifest(fs, root, batchId,
          manifest ++ touched.iterator.map(_ -> batchId))
      }

      // drop data dirs referenced by neither the new nor the previous
      // manifest (readers of the previous committed state stay safe), and
      // manifests older than the previous one
      val newManifest = readManifest(fs, root, batchId)
      val live = newManifest.values.toSet ++ manifest.values.toSet
      val dataRoot = new org.apache.hadoop.fs.Path(root, "data")
      if (fs.exists(dataRoot)) {
        fs.listStatus(dataRoot).toSeq.filter(_.isDirectory).foreach { st =>
          scala.util.Try(st.getPath.getName.stripPrefix("b=").toLong).toOption
            .foreach { id => if (!live.contains(id)) fs.delete(st.getPath, true) }
        }
      }
      fs.listStatus(manifestDir(root)).toSeq.foreach { st =>
        scala.util.Try(st.getPath.getName.stripPrefix("m=").toLong).toOption
          .foreach { id =>
            if (id < committed.getOrElse(batchId)) fs.delete(st.getPath, false)
          }
      }
    } finally delta.unpersist()
  }

  /** The committed cluster labeling: (doc_id, cluster_id). Empty-schema
    * DataFrame before the first commit. */
  def committedClusters(
      spark: org.apache.spark.sql.SparkSession, labelsPath: String): DataFrame = {
    val (fs, root) = fsOf(spark, labelsPath)
    committedVersion(spark, labelsPath)
      .flatMap(v => manifestTable(spark, labelsPath,
        readManifest(fs, root, v), BucketCol))
      .map(_.drop(BucketCol))
      .getOrElse(spark.emptyDataFrame)
  }

  // ---- streaming semantic (SemDeDup) cluster maintenance -----------------

  /**
   * Maintain SemDeDup semantic near-duplicate clusters over a STREAM of
   * embedding vectors: per micro-batch, the batch's vectors are appended
   * to a vector store, the NEW semantic-duplicate edges — batch×batch and
   * batch×resident pairs within shared quantizer cells, exact-cosine
   * gated at `tau` ([[graft.pipeline.SemDedup.edges]]) — are computed,
   * and those new edges fold into the committed labeling through
   * [[maintainClusters]]' bucketed commit protocol. Every qualifying pair
   * of the full corpus is found exactly once (by the batch that delivers
   * its LATER vector), so the maintained labeling equals the batch
   * [[graft.pipeline.SemDedup.labels]] over the concatenated corpus
   * (StreamingSpec asserts equality, and replays are idempotent).
   *
   * The coarse quantizer `model` must be FIXED for the life of the store
   * (train once on a representative sample, [[graft.pipeline.IVF.save]]
   * it) — re-training mid-stream would silently re-cell vectors; that is
   * the paper's deployment shape too.
   *
   * Layout under `storePath`: `vectors/b=<batchId>/cell=<c>` (append-only
   * vector snapshots, rewritten idempotently on replay, PARTITIONED by
   * quantizer cell) and `labels/` (the [[maintainClusters]] manifest
   * layout). Per-batch cost: the batch's cell list (bounded by the
   * model's k) prunes the resident read to touched `cell=` directories —
   * read I/O and pair work are O(touched cells), commit I/O O(touched
   * label buckets); nothing per batch is O(corpus). Read the result with
   * [[committedSemanticLabels]].
   */
  def maintainSemanticClusters(
      vectors: DataFrame,
      storePath: String,
      idCol: String,
      vecCol: String,
      model: graft.pipeline.IVF.Model,
      tau: Double,
      checkpointLocation: Option[String] = None,
      numBuckets: Int = 64,
      tileSize: Int = 10000)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val scope = scopeOf(checkpointLocation)
    val writer = vectors.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        semanticBatch(batch, batchId, storePath, idCol, vecCol, model, tau,
          scope, numBuckets, tileSize)
        ()
      }
    checkpointLocation.foreach(writer.option("checkpointLocation", _))
    writer.start()
  }

  /** One micro-batch of semantic cluster maintenance (exposed for
    * deterministic crash/replay testing; [[maintainSemanticClusters]]
    * drives it). */
  private[graft] def semanticBatch(
      batch: DataFrame,
      batchId: Long,
      storePath: String,
      idCol: String,
      vecCol: String,
      model: graft.pipeline.IVF.Model,
      tau: Double,
      scope: String,
      numBuckets: Int = 64,
      tileSize: Int = 10000): Unit = {
    val spark = batch.sparkSession
    val labelsPath = s"$storePath/labels"
    if (committedVersion(spark, labelsPath).exists(batchId <= _)) return
    if (batch.isEmpty) return

    // 1. record the batch's vectors FIRST (before the labels commit, so a
    // crash in between replays to an idempotent rewrite of this
    // directory), PARTITIONED by quantizer cell: the batch×resident pair
    // scan only needs resident vectors in the batch's cells, and a
    // `cell=` directory layout turns that restriction into partition
    // pruning — per-batch read I/O is O(touched cells), never O(corpus)
    import graft.pipeline.{IVF, SemDedup}
    val cellOf = (v: org.apache.spark.sql.Column) =>
      element_at(IVF.cells(v, model, 1), 1)
    val norm = batch.select(col(idCol).as("doc_id"), col(vecCol).as("vec"))
    norm.withColumn("cell", cellOf(col("vec")))
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$storePath/vectors/b=$batchId")

    // 2. new edges: pairs within the batch plus batch×resident pairs in
    // shared cells. The touched-cell list is at most the model's k cells
    // — bounded driver data driving the partition filter.
    val newIds = norm.select(col("doc_id").as("__new_id"))
    val scanSet = residentVectors(spark, storePath, batchId) match {
      case None => norm
      case Some(res) =>
        val touched = norm.select(cellOf(col("vec")).as("cell")).distinct()
          .collect().map(_.getInt(0)).toSeq
        res.filter(col("cell").isin(touched: _*)).drop("cell")
          .unionByName(norm)
    }
    // resident×resident pairs in touched cells were already committed by
    // earlier batches — keep only pairs involving a NEW vector.
    // LadderOptOut is the streaming exemption from the verify-join
    // ladder (the incrementalMinhashPairs doctrine): the scan set is
    // batch + touched-cell residents — bounded by construction, and
    // counting it would re-execute the whole union on EVERY micro-batch.
    // The opt-out is EXPLICIT (no estimate reaches the ladder, so no
    // hint can ship under ANY broadcast-threshold setting — the r19
    // ADVICE: the previous knownCount = 0 spelling hinted shuffle_hash
    // whenever broadcast was disabled); Spark's own size estimate of the
    // in-memory batch plan decides (broadcast when small, shuffled-hash
    // via the recommended preferSortMergeJoin=false deployment conf
    // otherwise).
    val tagged = SemDedup.edges(scanSet, "doc_id", "vec", model, tau, tileSize,
      knownCount = SemDedup.LadderOptOut)
    val involvingNew = tagged
      .join(newIds, tagged("id_a") === col("__new_id"), "left_semi")
      .unionByName(tagged.join(newIds, tagged("id_b") === col("__new_id"), "left_semi"))
      .distinct()
      .cache()

    // 3. fold into the committed labeling (bucketed commit protocol);
    // commitOnEmpty so a no-near-dup batch still publishes its vectors
    try clusterBatch(involvingNew, batchId, labelsPath, "id_a", "id_b",
      scope, numBuckets, commitOnEmpty = true)
    finally involvingNew.unpersist()
  }

  /** Union of vector snapshots from batches BEFORE `beforeBatch` (the
    * resident set a batch pairs against): (doc_id, vec, cell) with `cell`
    * the partition column, so a cell filter prunes directories. None when
    * no snapshot exists. */
  private def residentVectors(
      spark: org.apache.spark.sql.SparkSession,
      storePath: String,
      beforeBatch: Long): Option[DataFrame] = {
    val (fs, root) = fsOf(spark, s"$storePath/vectors")
    if (!fs.exists(root)) return None
    val dirs = fs.listStatus(root).toSeq.filter(_.isDirectory).flatMap { st =>
      scala.util.Try(st.getPath.getName.stripPrefix("b=").toLong).toOption
        .filter(_ < beforeBatch).map(_ => st.getPath.toString)
    }
    if (dirs.isEmpty) None
    // union, not a multi-root read: the roots are partition-style `b=N`
    // directories, which multi-root partition discovery rejects as a
    // conflicting structure (ActivityStreaming.readChain's callers read
    // non-partition-named leaves); the vectors chain is bounded by the
    // snapshot fold, so the O(batches) plan is acceptable here
    else Some(dirs.map(spark.read.parquet(_)).reduce(_ unionByName _))
  }

  /**
   * The committed semantic labeling, shaped like
   * [[graft.pipeline.SemDedup.labels]]: (doc_id, cell, cluster_id, keep)
   * for every vector committed so far — vectors with no committed
   * near-dup edge are self-labeled singletons. Pass the SAME fixed
   * `model` the stream was maintained with.
   */
  def committedSemanticLabels(
      spark: org.apache.spark.sql.SparkSession,
      storePath: String,
      model: graft.pipeline.IVF.Model): DataFrame = {
    val committed = committedVersion(spark, s"$storePath/labels")
    val vecs = committed
      .flatMap(v => residentVectors(spark, storePath, v + 1))
      .getOrElse(return spark.emptyDataFrame)
    val labels = committedClusters(spark, s"$storePath/labels")
      .withColumnRenamed("cluster_id", "__graft_cc_id")
    vecs
      .select(col("doc_id"), col("cell").cast("int").as("cell"))
      .join(labels, Seq("doc_id"), "left")
      .select(col("doc_id"), col("cell"),
        coalesce(col("__graft_cc_id"), col("doc_id")).as("cluster_id"))
      .withColumn("keep", col("doc_id") === col("cluster_id"))
  }

  /** First writer records the scope (temp+rename, so never torn); later
    * batches must match it. Catches the "fresh checkpoint over an existing
    * rollup" operator error, where batch ids restart at 0 and would be
    * silently skipped as replays (data loss) or re-merged (double count). */
  private[streaming] def checkScope(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      scope: String): Unit =
    checkStamp(fs, root, "_graft_scope", scope,
      (stored, given) =>
        s"rollup at $root was maintained under a different streaming " +
          s"checkpoint (scope $stored, this query: $given). Batch ids are " +
          "only meaningful within one checkpoint; continuing would " +
          "double-count or silently drop replayed batches. Resume with the " +
          "original checkpointLocation, or start a NEW rollup path (and " +
          "optionally seed it from the old one with topn_union).")

  /** Write-once stamp file under `root`: the first writer records `value`
    * (temp+rename, so never torn); later calls must present the same value
    * or fail with `mismatch(stored, given)`. */
  private[streaming] def checkStamp(
      fs: org.apache.hadoop.fs.FileSystem,
      root: org.apache.hadoop.fs.Path,
      fileName: String,
      value: String,
      mismatch: (String, String) => String,
      attemptsLeft: Int = 3): Unit = {
    val stampPath = new org.apache.hadoop.fs.Path(root, fileName)
    if (fs.exists(stampPath)) {
      val len = fs.getFileStatus(stampPath).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(stampPath)
      try in.readFully(0, buf) finally in.close()
      val stored = new String(buf, java.nio.charset.StandardCharsets.UTF_8).trim
      if (stored != value) {
        throw new IllegalStateException(mismatch(stored, value))
      }
    } else if (attemptsLeft <= 0) {
      throw new java.io.IOException(
        s"could not establish stamp at $stampPath (rename kept failing)")
    } else {
      val tmp = new org.apache.hadoop.fs.Path(root,
        s"$fileName.tmp-${java.util.UUID.randomUUID()}")
      fs.mkdirs(root)
      val out = fs.create(tmp, true)
      try out.write(value.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
      if (!fs.rename(tmp, stampPath)) {
        // concurrent first-writer may have won the rename: re-check, with
        // bounded retries in case rename fails for transient reasons
        fs.delete(tmp, false)
        checkStamp(fs, root, fileName, value, mismatch, attemptsLeft - 1)
      }
    }
  }

  case class KeyedItem(key: String, item: String)
  case class TopEntry(key: String, item: String, frequency: Long)
  case class KeptDoc(fingerprint: String, doc_id: Long)
  case class KeptDocText(doc_id: Long, text: String)
  case class NearDupPair(doc_a: Long, doc_b: Long, hamming: Int)
  case class BucketState(ids: Seq[Long], hashes: Seq[Long])

  /**
   * Streaming NEAR-duplicate detection: the streaming twin of
   * [[graft.pipeline.Dedup.simhashPairs]]. Each document's 64-bit SimHash
   * is cut into `maxDist + 1` chunks; by pigeonhole, any pair within
   * `maxDist` Hamming distance agrees exactly on at least one chunk, so
   * keying state by (chunk index, chunk value) gives exact recall against
   * everything still in state. A new document is compared only against its
   * own buckets' residents (bounded work per doc), then becomes a resident
   * itself.
   *
   * State per bucket is capped at `maxBucket` (id, hash) entries with
   * FIFO (oldest-first) eviction applied AS residents are inserted, so
   * per-doc work is bounded by `maxBucket` even when a flood lands in one
   * micro-batch (O(batch * maxBucket) pair emission, never O(batch²)).
   * NOTE this differs from the batch tier's hot-bucket handling:
   * [[graft.pipeline.Dedup.simhashPairs]] tiles an oversized bucket across
   * tasks with exact recall (unbounded work, default tile 10000), while
   * the streaming tier keeps emitting against the `maxBucket` most recent
   * residents (default 1000 — state-store bytes are the scarcer resource).
   * So on a bucket hotter than the cap the two tiers legitimately diverge:
   * streaming trades recall against OLD residents for bounded state and
   * latency, batch pays the full quadratic cost for exact recall. Run the
   * cheap [[streamingExactDedup]] upstream so exact-dup floods never reach
   * here.
   * `stateTtl` (processing-time) additionally expires idle buckets —
   * without it, state grows with the number of distinct chunk values seen
   * over the stream's lifetime.
   *
   * A pair whose fingerprints agree on several chunks is emitted once per
   * agreeing chunk (buckets are independent); downstream, deduplicate with
   * `dropDuplicates("doc_a", "doc_b")` — pairs are emitted id-ordered
   * (doc_a < doc_b) to make that exact.
   */
  def streamingNearDupPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3,
      maxBucket: Int = 1000,
      stateTtl: Option[String] = None): Dataset[NearDupPair] = {
    require(maxBucket >= 1,
      s"maxBucket must be >= 1, got $maxBucket (the insert-time eviction " +
        "loop needs at least one resident slot)")
    import docs.sparkSession.implicits._
    val timeout = if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()

    docs
      .select(
        col(idCol).cast("long").as("doc_id"),
        graft.pipeline.Dedup.simhash64(
          graft.pipeline.TextAnalysis.tokens(col(textCol))).as("sh"))
      .select(col("doc_id"), col("sh"),
        explode(graft.pipeline.Dedup.simhashChunks(col("sh"), maxDist)).as("bk"))
      .select(concat_ws(":", col("bk.chunk"), col("bk.cv")).as("bucket"),
        col("doc_id"), col("sh"))
      .as[(String, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[BucketState, NearDupPair](
        OutputMode.Append(), timeout) {
        (_: String, rows: Iterator[(String, Long, Long)], state: GroupState[BucketState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
          val st = if (state.exists) state.get else BucketState(Nil, Nil)
          // deque + id set: O(1) membership and FIFO eviction, so per-doc
          // work is bounded by maxBucket even WITHIN a batch — a flood
          // arriving in one micro-batch does O(batch * maxBucket) pair
          // emission, never O(batch^2), and the buffer never outgrows the
          // state cap mid-loop
          val residents = scala.collection.mutable.ArrayDeque.from(st.ids.zip(st.hashes))
          val resSet = scala.collection.mutable.HashSet.from(st.ids)
          val out = scala.collection.mutable.ArrayBuffer[NearDupPair]()
          // sort the batch by id: deterministic pair generation + eviction
          rows.toSeq.sortBy(_._2).foreach { case (_, id, sh) =>
            if (!resSet.contains(id)) {
              residents.foreach { case (oid, osh) =>
                val d = java.lang.Long.bitCount(sh ^ osh)
                if (d <= maxDist)
                  out += (if (oid < id) NearDupPair(oid, id, d)
                          else NearDupPair(id, oid, d))
              }
              while (residents.size >= maxBucket) {
                val (eid, _) = residents.removeHead()
                resSet -= eid
              }
              residents += ((id, sh))
              resSet += id
            }
          }
          state.update(BucketState(residents.map(_._1).toSeq, residents.map(_._2).toSeq))
          stateTtl.foreach(state.setTimeoutDuration)
          out.iterator
          }
      }
  }

  /**
   * Streaming exact dedup: across the life of the stream, emit each
   * canonical fingerprint's FIRST document (minimum doc id within the
   * micro-batch that first sees it) and swallow every later duplicate —
   * the streaming twin of [[graft.pipeline.Dedup.exactGroups]]'s keep-list
   * for an ingestion pipeline that must not admit a doc twice.
   *
   * State per fingerprint is just the flag's presence (an empty state row),
   * so the state store is O(distinct fingerprints) with ~zero value bytes.
   * For unbounded corpora pass `stateTtl` (processing-time timeout): a
   * fingerprint idle longer than the TTL is forgotten and a much-later
   * duplicate would be re-admitted — the standard state-size/recall trade,
   * decided by the caller.
   */
  def streamingExactDedup(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stateTtl: Option[String] = None): Dataset[KeptDoc] = {
    import docs.sparkSession.implicits._
    val timeout = if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs
      .select(
        graft.pipeline.TextAnalysis.fingerprint(col(textCol)).as("fingerprint"),
        col(idCol).cast("long").as("doc_id"))
      .as[KeptDoc]
      .groupByKey(_.fingerprint)
      .flatMapGroupsWithState[Boolean, KeptDoc](OutputMode.Update(), timeout) {
        (fp: String, rows: Iterator[KeptDoc], state: GroupState[Boolean]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val isNew = !state.exists
            state.update(true)
            stateTtl.foreach(state.setTimeoutDuration)
            if (isNew && rows.hasNext) Iterator.single(KeptDoc(fp, rows.map(_.doc_id).min))
            else Iterator.empty
          }
      }
  }

  /**
   * [[streamingExactDedup]] keyed by the DOCUMENT ID, payload carried:
   * across the stream's life, emit each id's FIRST (id, text) row and
   * swallow every later arrival of the same id. This is the at-least-once
   * ingestion mitigation the append-only stores ask for (e.g.
   * [[ScoreStreaming.maintainPredictions]], whose store records arrivals,
   * not identities): composed in front of a maintainer it collapses both
   * intra-batch duplicates and cross-batch replays, so each document
   * commits exactly once. Within one batch the first row in arrival order
   * wins (replays carry identical payloads, so the choice is immaterial).
   *
   * TTL doctrine (same contract as [[streamingExactDedup]]): with the
   * default `stateTtl = None`, the keyed boolean state holds one flag
   * per DISTINCT id for the stream's entire life — fine for bounded
   * corpora and replay windows, a slow leak at firehose scale where ids
   * never stop arriving. There, pass a `stateTtl` at least as long as
   * the source's replay window (processing-time timeout): an id idle
   * longer than the TTL is forgotten, and a re-ingestion AFTER that
   * re-emits the row — the guarantee weakens from exactly-once to
   * at-most-once-per-TTL-window, the standard state-size/recall trade,
   * decided by the caller. A TTL shorter than the replay window is the
   * one misconfiguration: a replay arriving after state expiry commits
   * a duplicate downstream (StreamingSpec pins the expiry-then-re-emit
   * behavior). Operational note: with a processing-time timeout armed,
   * the engine treats a future deadline as "another batch may be
   * required", so `StreamingQuery.processAllAvailable` never sees the
   * no-new-data signal (it blocks indefinitely) and one-shot triggers
   * like `Trigger.AvailableNow` can park awaiting a wake-up no source
   * will deliver — drive TTL'd streams with a real periodic trigger.
   */
  def streamingFirstById(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      stateTtl: Option[String] = None): Dataset[KeptDocText] = {
    import docs.sparkSession.implicits._
    val timeout = if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    docs
      .select(col(idCol).cast("long").as("doc_id"), col(textCol).as("text"))
      .as[KeptDocText]
      .groupByKey(_.doc_id)
      .flatMapGroupsWithState[Boolean, KeptDocText](
        OutputMode.Update(), timeout)(firstByIdTransition(stateTtl))
  }

  /** The state-transition function behind [[streamingFirstById]], named
    * so the TTL contract is unit-testable against
    * `org.apache.spark.sql.streaming.TestGroupState` (real-clock drives
    * of ProcessingTimeTimeout deadlock every one-shot test harness —
    * see the operational note above): a timed-out group forgets its
    * flag (the NEXT arrival of that id re-emits); a live group swallows
    * every arrival after the first and re-arms its TTL. */
  private[graft] def firstByIdTransition(stateTtl: Option[String])
      : (Long, Iterator[KeptDocText], GroupState[Boolean]) => Iterator[KeptDocText] =
    (_: Long, rows: Iterator[KeptDocText], state: GroupState[Boolean]) =>
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val isNew = !state.exists
        state.update(true)
        stateTtl.foreach(state.setTimeoutDuration)
        if (isNew && rows.hasNext) Iterator.single(rows.next())
        else Iterator.empty
      }

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
