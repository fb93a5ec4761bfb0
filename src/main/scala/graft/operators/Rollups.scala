package graft.operators

import graft.TopnFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Rollup-table operators for sketch maintenance — the reference's
 * "INSERT ... SELECT topn_add_agg ... GROUP BY, then topn_union_agg over
 * intervals" pattern (reference README.md:73-116,
 * sql/customer_reviews_query.sql) expressed as reusable plan builders.
 */
object Rollups {

  /**
   * Sliding merge of per-period sketches over `ROWS (frameRows-1) PRECEDING
   * .. CURRENT ROW` — the scale path for the reference's seven_days window
   * (sql/customer_reviews_query.sql:58-70).
   *
   * A window with ORDER BY and no PARTITION BY forces ALL rollup rows into
   * one partition (both here and in PostgreSQL). This variant instead:
   *  1. ranks the distinct periods (a tiny dimension: one row per day/hour
   *     — the only single-partition step, over #periods rows, not data);
   *  2. broadcast range-joins period->frame member periods;
   *  3. re-aggregates sketches with `topn_union_agg` grouped by the target
   *     period — an ordinary shuffled aggregation, fully parallel in the
   *     number of periods x groups.
   *
   * Identical results to the window form (merge below eviction threshold is
   * order-free; above it, both forms are approximate by design).
   */
  /**
   * Skew-safe sketch build: two-level aggregation salting the group key.
   * Level 1 groups by (key, salt) — hot keys split across `saltBuckets`
   * reducers; level 2 merges the per-salt sketches with `topn_union_agg`.
   * Because sketches are mergeable, this is EXACT below the eviction
   * threshold and carries the same approximation contract above it —
   * salting a sketch aggregate is semantically just another partial/final
   * split, which is the whole point of the mergeable design.
   */
  def saltedTopnAdd(
      df: DataFrame,
      groupCol: String,
      itemCol: String,
      numCounters: Int,
      saltBuckets: Int = 32): DataFrame = {
    val salted = df
      .withColumn("__salt", pmod(xxhash64(col(itemCol)), lit(saltBuckets)))
      .groupBy(col(groupCol), col("__salt"))
      .agg(TopnFunctions.topn_add_agg(col(itemCol), numCounters).as("__partial"))
    salted
      .groupBy(col(groupCol))
      .agg(TopnFunctions.topn_union_agg(col("__partial"), numCounters).as("sketch"))
  }

  /**
   * Hierarchical global sketch union. A plain
   * `df.agg(topn_union_agg(sketch))` funnels every partition's partial
   * state into ONE final reducer — fine at hundreds of partitions, a
   * single-thread bottleneck at 100k. This fans in through an intermediate
   * level: partials are salted into `fanIn` groups, each group unions in
   * parallel, and only `fanIn` pre-merged sketches reach the final stage.
   * Identical result by merge associativity (exact below eviction; same
   * approximation contract above it).
   */
  def hierarchicalUnion(
      sketches: DataFrame,
      sketchCol: String,
      numCounters: Int,
      fanIn: Int = 64): DataFrame = {
    // fan-in key must be a pure function of the ROW, not of partition
    // layout (monotonically_increasing_id would re-deal rows on every
    // repartition, making above-eviction-threshold results vary run to
    // run). Spark refuses to hash MapType directly, so hash the canonical
    // JSON rendering — sketch maps materialize in the deterministic
    // (freq desc, key asc) pack order, so the rendering is stable.
    sketches
      .withColumn("__g", pmod(xxhash64(to_json(col(sketchCol))), lit(fanIn.toLong)))
      .groupBy(col("__g"))
      .agg(TopnFunctions.topn_union_agg(col(sketchCol), numCounters).as("__partial"))
      .agg(TopnFunctions.topn_union_agg(col("__partial"), numCounters).as(sketchCol))
  }

  def slidingUnion(
      rollup: DataFrame,
      periodCol: String,
      sketchCol: String,
      frameRows: Int,
      numCounters: Int): DataFrame = {
    val spark = rollup.sparkSession
    import spark.implicits._

    val ranked = rollup.select(col(periodCol)).distinct()
      .withColumn("rk", row_number().over(Window.orderBy(col(periodCol))))

    // (target period) -> (member period) pairs inside the frame
    val frame = ranked.as("d")
      .join(broadcast(ranked.as("m")),
        col("m.rk") >= col("d.rk") - (frameRows - 1) && col("m.rk") <= col("d.rk"))
      .select(col(s"d.$periodCol").as("target_period"),
        col(s"m.$periodCol").as("member_period"))

    rollup
      .join(broadcast(frame), col(periodCol) === col("member_period"))
      .groupBy(col("target_period").as(periodCol + "_out"))
      .agg(TopnFunctions.topn_union_agg(col(sketchCol), numCounters).as(sketchCol))
      .withColumnRenamed(periodCol + "_out", periodCol)
  }
}
