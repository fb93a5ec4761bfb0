package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Materialize the growth suite's replicated fixture as PARQUET, so the
 * cross-engine anchor basket ([[docs/BENCH_NOTES.md]], tools/
 * anchor_basket.py) times BOTH engines over byte-identical input files.
 *
 * Why this exists: at sf0.1 several basket rows finish in tens of
 * milliseconds on a native columnar engine while Spark pays its fixed
 * per-query floor (plan + codegen + schedule, ~0.3 s on local[32]) —
 * the ratio there measures the floor, not throughput. Replicating the
 * input 10x puts real work on both sides of the ratio while keeping
 * every basket operator EXACT (the rollup's budget, ExactN = 2,000,000,
 * dwarfs 10x the custkey cardinality), so the identical declared SQL
 * still computes the identical answer.
 *
 * Replication mirrors Bench's in-plan scaling doctrine:
 *  - events: the KEY axis (fresh user/event id block per copy) — the
 *    dimension sessionize/retention actually face at 100 TB;
 *  - documents: a per-copy BIJECTIVE token remap (Bench.scaledDocs'
 *    scheme) — each copy's internal structure (dup groups, shingle
 *    sets, token counts) replicates the original's exactly while
 *    nothing collides across copies, so pair counts grow linearly, not
 *    quadratically; n_chars is recomputed over the remapped text;
 *  - orders: fresh custkey/orderkey block per copy, timeline unchanged.
 *
 * Usage: runMain graft.BenchFixture <sfDir> <outDir> <copies>
 */
object BenchFixture {

  private def replicate(df: DataFrame, copies: Int)(
      copyOf: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until copies).map(i => if (i == 0) df else copyOf(df, i))
      .reduce(_.unionByName(_))

  /** The per-copy token remap (`_g<i>` suffixed onto every whitespace
    * token) is IN-BAND: a source token already ending in `_g<k>` would
    * collide with copy k's remap image of its prefix, silently creating
    * cross-copy duplicates that bend the linear-pair-growth property the
    * replication scheme guarantees. The driver corpus contains no such
    * token; this assert turns that fixture fact into a CHECKED
    * precondition of every materialization/scaling, so the bijectivity
    * claim holds on ANY input corpus — a colliding one fails fast instead
    * of corrupting slopes (r16 ADVICE / verdict item 4). One scan. */
  private[graft] def assertRemapSafe(
      docs: DataFrame, textCol: String, where: String): Unit = {
    val bad = docs
      .filter(col(textCol).rlike("(^|\\s)\\S*_g\\d+(\\s|$)"))
      .select(col(textCol)).limit(1).collect()
    require(bad.isEmpty,
      s"$where: the corpus contains a whitespace token ending in the " +
        "per-copy remap suffix '_g<i>' (e.g. in: \"" +
        bad.headOption.map(_.getString(0).take(80)).getOrElse("") +
        "\") — replication would create cross-copy collisions; use a " +
        "different corpus or change the suffix scheme")
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, copiesStr) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-fixture")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // broadcast when small, shuffled-hash when a partition's build side
      // fits an executor, sort-merge only giant x giant — the candidate x
      // vectors / candidate x shingle-sets verify joins in Similarity /
      // Dedup / SemDedup depend on this ladder past the broadcast
      // threshold (Similarity.lshNearDupPairs has the measurement)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    materialize(spark, sfDir, outDir, copiesStr.toInt)
    spark.stop()
  }

  /** Write the replicated events/documents/orders tables under `outDir`
    * (the body of [[main]], session-agnostic so the spec can drive it). */
  def materialize(
      spark: SparkSession, sfDir: String, outDir: String, copies: Int): Unit = {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    val Array(uStride, eStride) = ev.agg(max("user_id"), max("event_id"))
      .head.toSeq.map(_.asInstanceOf[Long] + 1L).toArray
    replicate(ev, copies)((d, i) => d
        .withColumn("event_id", col("event_id") + lit(i * eStride))
        .withColumn("user_id", col("user_id") + lit(i * uStride)))
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    if (copies > 1) assertRemapSafe(docs, "text", s"materialize($sfDir)")
    val dStride = docs.agg(max("doc_id")).head.getLong(0) + 1L
    replicate(docs, copies)((d, i) => d
        .withColumn("doc_id", col("doc_id") + lit(i * dStride))
        .withColumn("text",
          regexp_replace(col("text"), "(\\S+)", s"$$1_g$i")))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val ord = spark.read.parquet(s"$sfDir/orders.parquet")
    val Array(cStride, oStride) = ord.agg(max("o_custkey"), max("o_orderkey"))
      .head.toSeq.map(_.asInstanceOf[Long] + 1L).toArray
    replicate(ord, copies)((d, i) => d
        .withColumn("o_orderkey", col("o_orderkey") + lit(i * oStride))
        .withColumn("o_custkey", col("o_custkey") + lit(i * cStride)))
      .write.mode("overwrite").parquet(s"$outDir/orders.parquet")

    println(s"""{"fixture":"$outDir","copies":$copies,"from":"$sfDir"}""")
  }
}
