package graft.streaming

import graft.pipeline.{IVF, Pq}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/**
 * Streaming maintenance of a product-quantized ANN index: each
 * micro-batch of (id, vector) rows is encoded under FROZEN IVF + PQ
 * models (train once — a model retrained mid-stream would silently
 * re-cell and re-code the index) and appended as an immutable
 * cell-partitioned batch directory under a crash-safe marker commit.
 *
 * The daily-embedding-ingest story at 100 TB: vectors arrive
 * continuously, the index is always queryable at its last committed
 * state, and each batch costs one encode projection + one
 * partitioned write — never a rewrite of history.
 *
 * Operational note — small files: a long-running stream accumulates one
 * directory tree per batch, and probe planning cost grows with the file
 * count. Because batch directories are immutable and the markers are
 * the ONLY liveness signal, in-place compaction cannot be made safe for
 * concurrent readers under this scheme (a reader unioning old and new
 * copies would double-count candidates). The supported pattern is the
 * offline rebuild: `Pq.saveIndex(committedIndex-derived vectors, ...)`
 * — or re-encode from the source vector table — into a FRESH path, then
 * point new queries at it and retire the old store. Same train-once
 * models, so the rebuilt index is bit-identical per row. Because batch
 * directories are IMMUTABLE (append-only index; deletes are the
 * dedup store's job), the commit protocol is simpler than
 * [[TopnStreaming.maintainRollup]]'s manifest: data lands in
 * `data/b=<batchId>/cell=<c>/`, then one atomic rename of an empty
 * marker `_committed/b=<batchId>` publishes it. A replayed batch id
 * returns before writing; a crash between data and marker leaves an
 * orphan directory that the replay overwrites byte-identically
 * (deterministic encode) before committing.
 */
object PqStreaming {

  private def fsOf(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  private def markerDir(root: org.apache.hadoop.fs.Path) =
    new org.apache.hadoop.fs.Path(root, "_committed")

  /** Ids of committed batches (empty before the first commit). */
  def committedBatches(spark: SparkSession, storePath: String): Seq[Long] = {
    val (fs, root) = fsOf(spark, storePath)
    val dir = markerDir(root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith("b=")) scala.util.Try(n.stripPrefix("b=").toLong).toOption
      else None
    }.sorted
  }

  /** One micro-batch of the append protocol (exposed for deterministic
    * crash-path testing; [[maintainIndex]] drives it from foreachBatch). */
  private[graft] def appendBatch(
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      vecCol: String,
      pq: Pq.Model,
      ivf: IVF.Model,
      storePath: String): Unit = {
    val spark = batch.sparkSession
    val (fs, root) = fsOf(spark, storePath)
    if (committedBatches(spark, storePath).contains(batchId)) return
    if (batch.isEmpty) return

    Pq.index(batch, idCol, vecCol, pq, ivf)
      .write.mode("overwrite").partitionBy("cell")
      .parquet(s"$storePath/data/b=$batchId")

    // the atomic commit: rename of an empty marker file
    val dir = markerDir(root)
    fs.mkdirs(dir)
    val tmp = new org.apache.hadoop.fs.Path(dir,
      s".b=$batchId.tmp-${java.util.UUID.randomUUID()}")
    fs.create(tmp, true).close()
    val dst = new org.apache.hadoop.fs.Path(dir, s"b=$batchId")
    if (!fs.rename(tmp, dst)) {
      fs.delete(tmp, false)
      if (!fs.exists(dst)) {
        throw new java.io.IOException(s"could not commit index batch $dst")
      }
    }
  }

  /** The committed index: union of committed batch directories, schema
    * (cand_id, codes, cell). Empty-schema DataFrame before the first
    * commit. Orphan (uncommitted) directories are never read. */
  def committedIndex(spark: SparkSession, storePath: String): DataFrame =
    committedBatches(spark, storePath)
      .map(id => spark.read.parquet(s"$storePath/data/b=$id"))
      .reduceOption(_ unionByName _)
      .getOrElse(spark.emptyDataFrame)

  /**
   * Probe the committed index: the query batch's probed-cell set becomes
   * a `cell` filter (partition pruning inside each batch directory's
   * `cell=` layout), then the standard broadcast-LUT ADC scan + top-k,
   * with optional exact rerank against a raw-vector table.
   */
  def searchCommitted(
      spark: SparkSession,
      storePath: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      pq: Pq.Model,
      ivf: IVF.Model,
      nprobe: Int = 4,
      rerank: Int = 0,
      rerankWith: Option[DataFrame] = None): DataFrame = {
    require(rerank == 0 || rerank >= k,
      s"rerank shortlist ($rerank) must be 0 (off) or >= k ($k)")
    require((rerank == 0) == rerankWith.isEmpty,
      "rerank and rerankWith must be set together")
    // a store with no committed batch yet is empty, not broken — return
    // zero rows with the output schema instead of failing to resolve a
    // `cell` column on the schemaless empty fallback
    if (committedBatches(spark, storePath).isEmpty) {
      return queries.select(col(idCol).as("query_id"),
        lit(0L).as("rank"), col(idCol).as("neighbor_id")).limit(0)
    }
    val touched = Pq.probedCells(queries, vecCol, ivf, nprobe)
    val idx = committedIndex(spark, storePath).filter(col("cell").isin(touched: _*))
    Pq.searchOn(idx, queries, idCol, vecCol, k, pq, ivf, nprobe, rerank, rerankWith)
  }

  /** Drive [[appendBatch]] from a streaming (id, vector) source. */
  def maintainIndex(
      stream: DataFrame,
      idCol: String,
      vecCol: String,
      pq: Pq.Model,
      ivf: IVF.Model,
      storePath: String,
      checkpointDir: String): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, batchId, idCol, vecCol, pq, ivf, storePath)
      }
      .start()
}
