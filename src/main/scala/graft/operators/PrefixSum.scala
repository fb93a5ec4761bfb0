package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/**
 * Scale-safe GLOBAL running sum — the distributed prefix-sum primitive.
 *
 * The naive spelling, `sum(x).over(Window.orderBy(id))`, funnels the whole
 * table through ONE partition (Spark warns `No Partition Defined`): correct
 * at test scale, dead at 100 TB. This is the standard two-pass fix:
 *
 *   1. range-partition by the order column, sort within partitions;
 *   2. first pass: one `mapPartitionsWithIndex` job reduces each partition
 *      to its total — P longs collected to the driver;
 *   3. second pass: broadcast the exclusive prefix of those totals and add
 *      each partition's offset to its local running sum.
 *
 * Both passes run over the SAME RDD instance, so the (sampled) range
 * boundaries are fixed exactly once and the shuffle files are reused by the
 * second job — correctness does not depend on Catalyst exchange-reuse
 * deduplicating two copies of the plan, which is why this drops to the RDD
 * API (the rare justified case: per-partition imperative logic whose
 * determinism must survive plan re-execution).
 *
 * Requires a globally unique order column; null weights count as 0.
 */
object PrefixSum {

  /**
   * Append `outCol` = inclusive running sum of `valueCol` (summed as long —
   * fractional values are truncated toward zero for the SUM ONLY) over the
   * global `orderCol` ordering. The caller's `valueCol` passes through with
   * its original type and values — the long cast lives in an internal
   * column that never reaches the output.
   *
   * EAGER: calling this runs two Spark jobs immediately (the range
   * shuffle + per-partition-totals collect) — unlike ordinary DataFrame
   * transformations, which are lazy. That is inherent to the algorithm:
   * the offsets must exist before the result plan can be built.
   */
  def runningSum(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      outCol: String,
      numPartitions: Int = 0): DataFrame = {
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column; pick another outCol")
    val tmp = "__graft_prefix_val"
    require(!df.columns.contains(tmp),
      s"input already has a '$tmp' column; rename it")
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions

    // the long cast rides in a TRAILING internal column so the caller's
    // valueCol keeps its type/values in the output (no silent truncation)
    val sorted = df
      .withColumn(tmp, col(valueCol).cast("long"))
      .repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(orderCol)
    val schema = sorted.schema
    val vIdx = schema.fieldIndex(tmp) // == schema.length - 1

    // ONE RDD instance: the range partitioner's sampled boundaries are
    // computed once; the collect job's shuffle map output is reused by the
    // second pass (skipped stage), so partition ids line up by construction.
    val rdd = sorted.rdd

    val partSums = rdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => if (!r.isNullAt(vIdx)) s += r.getLong(vIdx))
        Iterator((pid, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _) // exclusive prefix, length P+1
    val bc = spark.sparkContext.broadcast(offsets)

    val withRun = rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bc.value(pid)
      it.map { r =>
        if (!r.isNullAt(vIdx)) run += r.getLong(vIdx)
        // drop the trailing internal cast column, append the running sum
        Row.fromSeq(r.toSeq.init :+ run)
      }
    }
    spark.createDataFrame(withRun,
      org.apache.spark.sql.types.StructType(schema.fields.init)
        .add(outCol, LongType, nullable = false))
  }
}
