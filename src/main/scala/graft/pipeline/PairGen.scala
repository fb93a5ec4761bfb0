package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Bucket-local candidate-pair generation shared by the dedup / similarity
 * operators.
 *
 * Input: a DataFrame holding one row per bucket with a SORTED array column
 * `xs` (element type is caller's choice: plain id or a small struct). Output:
 * one row per ordered pair `(xs(i), xs(j))`, `i < j`, named (`aName`,
 * `bName`).
 *
 * Memory contract (the 100 TB property): pairs are streamed through two
 * chained generators — `posexplode` anchors, then `explode` over the
 * anchor's strict suffix — so no single row ever materializes the O(b²)
 * pair array. Peak per-row footprint is one copy of the bucket array
 * (b × element size), NOT b²/2 pair structs; a 10 000-id bucket costs
 * ~80 KB per in-flight row instead of the ~800 MB a flattened pair array
 * would. Elements must therefore stay small (ids / fingerprints) — join
 * wide payloads (e.g. embedding vectors) back AFTER pair generation.
 */
private[graft] object PairGen {

  /** Ordered pairs from the sorted array column `xsCol`; output columns
    * (`aName`, `bName`) have the array's element type. */
  def explodePairs(
      bucketed: DataFrame,
      xsCol: String,
      aName: String,
      bName: String): DataFrame = {
    val xs = col(xsCol)
    bucketed
      .select(col(xsCol).as("__xs"), posexplode(xs).as(Seq("__i", aName)))
      // partners are the strict suffix after 0-based anchor __i:
      // 1-based slice start __i + 2, length size - __i - 1 (empty => dropped)
      .select(
        col(aName),
        explode(slice(col("__xs"), col("__i") + lit(2),
          size(col("__xs")) - col("__i") - lit(1))).as(bName))
  }

  /** groupBy(keys) -> sorted collect_list(item) -> size guard [2, maxBucket].
    * Oversize buckets are dropped WHOLE (the standard skew guard: they carry
    * quadratic pair cost and near-zero similarity signal). */
  def buckets(
      df: DataFrame,
      keys: Seq[Column],
      item: Column,
      maxBucket: Int): DataFrame =
    df.groupBy(keys: _*)
      .agg(sort_array(collect_list(item)).as("xs"))
      .filter(size(col("xs")) >= 2 && size(col("xs")) <= maxBucket)
}
