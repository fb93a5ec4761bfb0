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
}
