package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/**
 * Readers for the engine's table layouts (parquet-first; CSV ingest mirrors
 * the reference's \COPY test path, reference sql/copy_data.sql:1-17).
 */
object Tables {

  /** Plain parquet table read: `dir/name.parquet`. */
  def parquet(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /**
   * The events stream table has shipped two physical layouts for `ts`:
   * TIMESTAMP(NANOS) (which Spark's vectorized reader refuses by default —
   * read nanos as long via `spark.sql.legacy.parquet.nanosAsLong` and
   * convert) and plain `timestamp[us]` (read as TIMESTAMP_NTZ). Branch on
   * the loaded type so both layouts land on the same TimestampType column
   * (sessions run UTC, so the NTZ cast is value-preserving); preserve the
   * original column order.
   */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try {
      val raw = spark.read.parquet(s"$dir/events.parquet")
      val ts = raw.schema("ts").dataType match {
        // nanos-as-int64 layout; integer `div`, not `/`: nanos exceed 2^53,
        // float division loses precision
        case LongType => timestamp_micros(expr("ts div 1000"))
        case TimestampNTZType => col("ts").cast("timestamp")
        case _ => col("ts")
      }
      raw.withColumn("ts", ts)
        .select(raw.columns.map(col).toIndexedSeq: _*)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  /**
   * CSV ingest with an explicit schema (the reference's regression suite
   * loads its fixture with `\COPY ... WITH CSV`; this is the Spark
   * spelling, with the same no-header, explicit-schema discipline).
   */
  def csv(spark: SparkSession, path: String, ddl: String,
      header: Boolean = false): DataFrame =
    spark.read
      .option("header", header.toString)
      .schema(ddl)
      .csv(path)

  /**
   * JSONL (line-delimited JSON) ingest — the interchange format LLM
   * corpora actually ship in (one JSON object per line). Discipline for
   * 100 TB:
   *  - EXPLICIT schema, never inference: schema inference is a full
   *    extra pass over the data before the real read starts.
   *  - One object per line (`multiLine` stays false) so the input is
   *    splittable: each executor task parses its own byte range. A
   *    single-document JSON array would serialize the whole file through
   *    one task. (Same caveat for compression: `.jsonl.gz` files are not
   *    splittable — parallelism is then capped at #files — so shard the
   *    corpus into many files or use a splittable codec.)
   *  - PERMISSIVE by default: a corrupt line yields a null row, not a
   *    dead 100 TB job. Include `_corrupt_record STRING` in `ddl` to
   *    retain the bad lines for a quarantine audit, or pass
   *    `mode -> FAILFAST` in `options` when ingesting trusted output.
   */
  def jsonl(spark: SparkSession, path: String, ddl: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read
      .options(options)
      .schema(ddl)
      .json(path)

  /**
   * The matching JSONL writer: one JSON object per line, UTF-8, values
   * JSON-escaped by the writer so any text (newlines, quotes, control
   * chars) round-trips through [[jsonl]] byte-exactly. `shards` bounds
   * output file count — at scale, pick it so files land in the
   * 100 MB - 1 GB sweet spot (many small files punish the next reader's
   * task scheduler; one giant unsplittable-after-gzip file punishes
   * parallelism).
   */
  def writeJsonl(df: DataFrame, path: String, shards: Int = 0): Unit = {
    val out = if (shards > 0) df.repartition(shards) else df
    out.write.mode("overwrite").json(path)
  }
}
