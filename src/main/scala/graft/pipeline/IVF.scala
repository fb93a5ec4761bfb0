package graft.pipeline

import graft.expressions.NearestCentroids
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

/**
 * IVF (inverted-file) approximate-nearest-neighbor tier: a k-means coarse
 * quantizer partitions the vector space into cells; each candidate vector
 * is indexed under its nearest centroid; a query probes its `nprobe`
 * nearest cells and exact-reranks only those candidates.
 *
 * Scale design:
 *  - Training runs driver-side Lloyd's iterations on a bounded SAMPLE
 *    (deterministic, seeded) — at 100 TB you still train on ~100k sampled
 *    vectors; the model is just `k * dim` doubles, broadcast inside the
 *    [[NearestCentroids]] expression.
 *  - Indexing is a pure projection (cell id per row, no shuffle); the
 *    cell-partitioned index can be persisted `partitionBy("cell")` so a
 *    probe reads only `nprobe / k` of the data (partition pruning).
 *  - Search joins query probes to candidate cells (shuffle keyed by cell,
 *    or broadcast of the query probe set) and reranks with exact cosine +
 *    bounded-heap top-k.
 *
 * Cosine metric: centroids are L2-normalized, so nearest-by-dot ==
 * nearest-by-cosine; cell means are re-normalized each iteration
 * (spherical k-means).
 */
object IVF {

  /** Coarse quantizer model: k centroids, L2-normalized, row-major. */
  final case class Model(centroids: Array[Array[Double]]) {
    def k: Int = centroids.length
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    val inv = if (n == 0.0) 0.0 else 1.0 / math.sqrt(n)
    val out = new Array[Double](v.length)
    i = 0
    while (i < v.length) { out(i) = v(i) * inv; i += 1 }
    out
  }

  /**
   * Train the coarse quantizer: deterministic sample (first `sampleSize`
   * rows by id order), seeded spread initialization, `iters` Lloyd's
   * rounds of spherical k-means on the driver.
   */
  def train(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 10,
      sampleSize: Int = 10000): Model = {
    val sample: Array[Array[Double]] = vectors
      .orderBy(col(idCol))
      .limit(sampleSize)
      .select(col(vecCol).cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
      .map(normalize)
    require(sample.length >= k, s"sample (${sample.length}) smaller than k ($k)")

    // deterministic spread init: every (n/k)-th sample vector
    var centroids = Array.tabulate(k)(i => sample(i * sample.length / k))

    var iter = 0
    while (iter < iters) {
      val sums = Array.fill(k)(new Array[Double](sample.head.length))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0
        var bestDot = Double.NegativeInfinity
        var c = 0
        while (c < k) {
          var dot = 0.0
          var j = 0
          while (j < v.length) { dot += v(j) * centroids(c)(j); j += 1 }
          if (dot > bestDot) { bestDot = dot; best = c }
          c += 1
        }
        var j = 0
        while (j < v.length) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(k) { c =>
        if (counts(c) == 0) centroids(c) // empty cell: keep old centroid
        else normalize(sums(c))
      }
      iter += 1
    }
    Model(centroids)
  }

  /** Cell ids (nprobe nearest centroids, best first) for a vector column. */
  def cells(vec: Column, model: Model, nprobe: Int): Column =
    GraftShim.column(NearestCentroids(GraftShim.expression(vec), model.centroids, nprobe))

  /**
   * Persist a trained quantizer as a tiny parquet table (cell, centroid) —
   * k rows of dim doubles. At scale you train ONCE, save, and every
   * indexing/search job loads the same model: retraining per job would
   * silently re-cell the index.
   */
  def save(model: Model, path: String, spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq
      .toDF("cell", "centroid")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a quantizer persisted by [[save]]. Centroid order (= cell ids)
    * is restored exactly; round-trips bit-identically. */
  def load(path: String, spark: org.apache.spark.sql.SparkSession): Model = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select($"cell".cast("int"), $"centroid".cast("array<double>"))
      .as[(Int, Seq[Double])]
      .collect()
      .sortBy(_._1)
    require(rows.nonEmpty, s"no IVF model at $path")
    require(rows.map(_._1).toSeq == rows.indices.toSeq,
      s"corrupt IVF model at $path: non-contiguous cell ids")
    Model(rows.map(_._2.toArray))
  }

  /**
   * IVF top-k search: candidates indexed under their single nearest cell,
   * queries probe `nprobe` cells, exact cosine rerank via bounded-heap
   * top-k. Output schema matches the other ANN tiers:
   * (query_id, rank, neighbor_id).
   */
  def topK(
      candidates: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      model: Model,
      nprobe: Int = 4): DataFrame = {
    val cand = candidates.select(
      col(idCol).as("cand_id"), col(vecCol).as("cand_vec"),
      element_at(cells(col(vecCol), model, 1), 1).as("cell"))
    val qs = queries.select(
      col(idCol).as("query_id"), col(vecCol).as("query_vec"),
      explode(cells(col(vecCol), model, nprobe)).as("cell"))

    cand
      .join(broadcast(qs), Seq("cell"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        Similarity.cosineSim(col("cand_vec"), col("query_vec")).as("sim"))
      .groupBy("query_id")
      .agg(Similarity.topkByScore(col("cand_id"), col("sim"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("r.id").as("neighbor_id"))
  }
}
