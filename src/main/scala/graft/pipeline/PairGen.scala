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
    * quadratic pair cost and near-zero similarity signal). Used where the
    * cap is part of the operator's documented semantics (the Jaccard
    * document-frequency cap); the LSH tiers use [[allPairs]], which keeps
    * every pair. */
  def buckets(
      df: DataFrame,
      keys: Seq[Column],
      item: Column,
      maxBucket: Int): DataFrame =
    df.groupBy(keys: _*)
      .agg(sort_array(collect_list(item)).as("xs"))
      .filter(size(col("xs")) >= 2 && size(col("xs")) <= maxBucket)

  /**
   * All ordered pairs from each key group — recall-preserving hot-bucket
   * handling. A hot bucket (a duplication flood — exactly the case dedup
   * exists for) is NOT dropped: every bucket's b×b pair matrix is cut into
   * `ceil(b/tileSize)²/2` tiles of at most `tileSize`² pairs (one diagonal
   * tile — the whole bucket — when b <= tileSize), the tiles are spread
   * across the cluster with a round-robin repartition, and pairs stream
   * out of each tile through the same chained-generator idiom as
   * [[explodePairs]]. Recall is exact at every bucket size; what was
   * silent data loss is now just distributed work.
   *
   * Why tiling instead of re-banding oversize buckets with extra signature
   * bits: an exact-duplicate flood has IDENTICAL signatures, so any
   * signature-derived sub-key puts the whole flood back into one bucket at
   * every depth and forces a drop anyway; tiling needs no signal from the
   * items at all. The O(b²) pair count itself is irreducible — those pairs
   * are the answer — so the only degrees of freedom are per-task memory
   * (bounded: a tile row holds two ≤`tileSize` chunks, never the full
   * bucket, never the pair array) and distribution (the repartition).
   *
   * Plan shape — deliberately SINGLE-CONSUMPTION: one aggregation feeds
   * one tile generator feeds one repartition, no branch. A small/hot
   * branch over the aggregation would read the expensive map side (source
   * scan + signatures) twice — Catalyst's static ReuseExchange dedupes the
   * branches, but AQE's runtime stage creation does NOT (measured: two
   * full scans in the adaptive final plan), and production runs AQE. The
   * price of the uniform path is the tile repartition for every bucket —
   * a shuffle of id-arrays, bytes comparable to the bucket shuffle itself
   * and negligible next to the map side it stops duplicating; it also
   * load-balances pair generation away from the bucket-key partitioning
   * (a flood key no longer pins its whole pair matrix to one reducer).
   *
   * `hardMaxBucket` is an explicit opt-in work bound: buckets beyond it are
   * dropped whole (a 10M-member bucket implies 5×10¹³ pairs — no engine
   * should emit that by accident). The default keeps everything; callers
   * that prefer bounded work over exact recall set it deliberately.
   *
   * Sorted-bucket ordering guarantee: because `xs` is sorted and tiles are
   * contiguous slices, every emitted pair satisfies a <= b in the array
   * element order — identical to [[explodePairs]] (equal elements from
   * duplicate inputs can pair with themselves in both paths; callers that
   * must exclude them filter a < b, as they do today).
   */
  def allPairs(
      df: DataFrame,
      keys: Seq[Column],
      item: Column,
      tileSize: Int,
      aName: String,
      bName: String,
      hardMaxBucket: Int = Int.MaxValue): DataFrame = {
    require(tileSize >= 2, s"tileSize must be >= 2, got $tileSize")
    val agged = df.groupBy(keys: _*)
      .agg(sort_array(collect_list(item)).as("xs"))
      .filter(size(col("xs")) >= 2 && size(col("xs")) <= hardMaxBucket)

    // Tile coordinates (i, j), 0 <= i <= j < nc; nc == 1 for buckets that
    // fit one tile. Each tile row carries ONLY its two chunks (sliced
    // before the repartition, so the shuffle moves O(b²/tileSize) elements
    // per hot bucket — and exactly the bucket array for ordinary ones —
    // never O(b²) pairs and never nc² copies of the full bucket). Chunk
    // extraction is staged BELOW the explodes (own projection — a
    // non-generator expression in the same select would be hoisted above
    // the Generate and re-evaluated per emitted row).
    val tiles = agged
      .select(col("xs"),
        ceil(size(col("xs")).cast("double") / tileSize).cast("int").as("nc"))
      .select(col("xs"), col("nc"), explode(sequence(lit(0), col("nc") - 1)).as("i"))
      .select(col("xs"), col("i"), explode(sequence(col("i"), col("nc") - 1)).as("j"))
      .select(
        slice(col("xs"), col("i") * tileSize + 1, lit(tileSize)).as("ca"),
        slice(col("xs"), col("j") * tileSize + 1, lit(tileSize)).as("cb"),
        (col("i") === col("j")).as("diag"))
      .repartition() // round-robin: spread tiles evenly across tasks

    // Per tile: anchors from ca; partners are ca's strict suffix on the
    // diagonal (within-chunk pairs, ca == cb there) or all of cb off it.
    tiles
      .select(col("cb"), col("diag"), posexplode(col("ca")).as(Seq("__i", aName)))
      .select(col(aName),
        explode(when(col("diag"),
          slice(col("cb"), col("__i") + lit(2), size(col("cb")) - col("__i") - lit(1)))
          .otherwise(col("cb"))).as(bName))
  }
}
