package graft.pipeline

import graft.expressions.{CosineSim, TopKAgg}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

/**
 * Approximate-nearest-neighbor search over an embedding column
 * (`array<float>`), two tiers:
 *
 *  - [[bruteForceTopK]]: exact cosine top-k — broadcast the (small) query
 *    set against the full candidate table, reduce with the [[TopKAgg]]
 *    bounded-heap aggregate. The candidate table is scanned once, never
 *    shuffled: each partition keeps a k-heap per query (map-side partial
 *    aggregation), only ~k rows per partition per query cross the wire.
 *    This is the 100 TB-safe exact baseline (cost: one full scan per batch
 *    of queries).
 *
 *  - [[lshTopK]]: random-hyperplane LSH — candidates limited to vectors
 *    whose sign-bucket matches the query in at least one of `tables`
 *    independent hash tables, then exact cosine rerank of candidates only.
 *    Sub-linear per query once bucketed; the bucketed table is reusable
 *    across query batches (the IVF-style scale path).
 *
 * Scores are accumulated in double precision, strictly sequentially, so
 * results are deterministic and cross-engine comparable; ordering ties
 * break by ascending id (TopKAgg's total order).
 */
object Similarity {

  def cosineSim(a: Column, b: Column): Column =
    GraftShim.column(CosineSim(GraftShim.expression(a), GraftShim.expression(b)))

  def topkByScore(id: Column, score: Column, k: Int): Column =
    GraftShim.column(TopKAgg(
      GraftShim.expression(id), GraftShim.expression(score), k).toAggregateExpression())

  /**
   * Exact top-k cosine neighbors for each query vector.
   * Output: (query_id, rank, neighbor_id) with rank 1..k by
   * (cosine desc, neighbor_id asc); self-matches excluded.
   */
  def bruteForceTopK(
      candidates: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val cand = candidates.select(col(idCol).as("cand_id"), col(vecCol).as("cand_vec"))
    val qs = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
    cand
      .join(broadcast(qs), col("cand_id") =!= col("query_id"))
      .select(col("query_id"),
        col("cand_id"),
        cosineSim(col("cand_vec"), col("query_vec")).as("sim"))
      .groupBy("query_id")
      .agg(topkByScore(col("cand_id"), col("sim"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"), col("r.id").as("neighbor_id"))
  }

  /** Deterministic random hyperplanes (seeded), one bucket id per table:
    * bit i of table t = sign of dot(vec, plane[t][i]). */
  private def hyperplanes(dim: Int, bitsPerTable: Int, tables: Int, seed: Long)
      : Array[Array[Array[Double]]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(tables, bitsPerTable, dim)(rnd.nextGaussian())
  }

  /** Column: array of `tables` bucket ids for a vector (one native
    * expression pass over the vector — see
    * [[graft.expressions.HyperplaneBuckets]]). */
  def lshBuckets(vec: Column, dim: Int, bitsPerTable: Int, tables: Int,
      seed: Long = 42L): Column =
    GraftShim.column(graft.expressions.HyperplaneBuckets(
      GraftShim.expression(vec), hyperplanes(dim, bitsPerTable, tables, seed)))

  /**
   * LSH-bucketed approximate top-k: candidates share a bucket with the
   * query in >= 1 table, exact cosine rerank. Same output schema as
   * [[bruteForceTopK]]; recall < 1 by design (tunable via bits/tables).
   */
  def lshTopK(
      candidates: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      dim: Int,
      bitsPerTable: Int = 4,
      tables: Int = 8,
      seed: Long = 42L): DataFrame = {
    def bucketed(df: DataFrame, idAs: String, vecAs: String): DataFrame =
      df.select(col(idCol).as(idAs), col(vecCol).as(vecAs),
        explode(lshBuckets(col(vecCol), dim, bitsPerTable, tables, seed)).as("bucket"))

    val cand = bucketed(candidates, "cand_id", "cand_vec")
    val qs = bucketed(queries, "query_id", "query_vec")

    cand
      .join(broadcast(qs), Seq("bucket"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        cosineSim(col("cand_vec"), col("query_vec")).as("sim"))
      .distinct() // same pair may collide in several tables
      .groupBy("query_id")
      .agg(topkByScore(col("cand_id"), col("sim"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"), col("r.id").as("neighbor_id"))
  }

  /**
   * Embedding-cosine near-duplicate pairs: the most-similar `topPairs`
   * pairs (a < b) across the table, exact brute force via a single
   * global TopKAgg over pair ids packed into one BIGINT (a << 32 | b).
   * For n too large for O(n^2), use [[lshTopK]] with each vector as query.
   *
   * Precondition: ids must fit in [0, 2^32) so the packed BIGINT is
   * collision-free — enforced per row with a raising check (negative or
   * >= 2^32 ids would silently collide otherwise).
   */
  def cosineNearDupPairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      topPairs: Int): DataFrame = {
    def packable(c: Column, name: String): Column =
      when(c >= 0 && c < lit(4294967296L), c)
        .otherwise(raise_error(concat(
          lit(s"cosineNearDupPairs: $name must be in [0, 2^32) to pack into " +
            "one BIGINT, got "), c.cast("string"))))
    val a = vectors.select(
      packable(col(idCol), idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = vectors.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(
        (col("id_a") * lit(4294967296L) + col("id_b")).as("pair"),
        cosineSim(col("vec_a"), col("vec_b")).as("sim"))
      .agg(topkByScore(col("pair"), col("sim"), topPairs).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "r")))
      .select(
        (col("pos") + 1).cast("long").as("rank"),
        floor(col("r.id") / lit(4294967296L)).cast("long").as("doc_a"),
        pmod(col("r.id"), lit(4294967296L)).cast("long").as("doc_b"))
  }
}
