package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Scale-safe GLOBAL running sum — the distributed prefix-sum primitive.
 *
 * The naive spelling, `sum(x).over(Window.orderBy(id))`, funnels the whole
 * table through ONE partition (Spark warns `No Partition Defined`): correct
 * at test scale, dead at 100 TB. This is the standard two-pass fix:
 *
 *   1. range-partition by the order column and compute each partition's
 *      within-partition running sum (a PARTITIONED window — parallel);
 *   2. aggregate one total per partition (P rows, P = #partitions), compute
 *      the exclusive prefix of those totals on the driver-sized side (a
 *      single-partition window over P rows — O(P), not O(rows)), and
 *      broadcast-join the offsets back.
 *
 * The result is invariant to where the (sampled, run-dependent) range
 * boundaries fall: offset + within-partition sum telescopes to the same
 * global prefix regardless of the cut points. Requires the order column to
 * be globally unique (ties across a boundary would make "preceding rows"
 * ambiguous).
 */
object PrefixSum {

  /**
   * Append `outCol` = inclusive running sum of `valueCol` over the global
   * `orderCol` ordering.
   */
  def runningSum(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      outCol: String,
      numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val parted = df
      .repartitionByRange(parts, col(orderCol))
      .withColumn("__graft_pid", spark_partition_id())

    // One row per partition; the single-partition window here is O(P).
    val offsets = parted
      .groupBy(col("__graft_pid"))
      .agg(sum(col(valueCol)).as("__graft_psum"))
      .withColumn("__graft_offset",
        coalesce(
          sum(col("__graft_psum")).over(
            Window.orderBy(col("__graft_pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col("__graft_pid"), col("__graft_offset"))

    parted
      .join(broadcast(offsets), "__graft_pid")
      .withColumn(outCol,
        col("__graft_offset") +
          sum(col(valueCol)).over(
            Window.partitionBy(col("__graft_pid")).orderBy(col(orderCol))))
      .drop("__graft_pid", "__graft_offset")
  }
}
