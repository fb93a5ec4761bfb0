package graft.pipeline

import graft.expressions.{PqAdc, PqEncode, PqLut}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

/**
 * Product-quantized ANN (IVF-PQ): the compressed-index tier of the
 * similarity-search family (brute force -> LSH -> IVF -> IVF-PQ), after
 * Jegou et al., TPAMI 2011.
 *
 * Scale design — this is the tier that actually fits 100 TB of
 * embeddings:
 *  - The INDEX stores no raw vectors: each candidate row carries its IVF
 *    cell id plus M small codes (ARRAY<INT>, ks<=256 so byte-sized on
 *    disk after parquet dictionary encoding). At dim 768 / M=96 that is
 *    a ~32x smaller table than float32 — the difference between an index
 *    that fits in cluster page cache and one that doesn't.
 *  - Training is driver-side Lloyd's per subspace on the SAME bounded,
 *    deterministic sample discipline as [[IVF.train]]; the model is
 *    M*ks*dsub doubles, broadcast inside the codegen'd expressions.
 *  - Search: queries precompute an ADC lookup table once (PqLut), probe
 *    nprobe IVF cells, and every candidate in a probed cell costs M
 *    integer lookups (PqAdc) — no floats are read from the index at all.
 *    The scored stream reduces through the same bounded-heap top-k
 *    aggregate as every other tier (map-side partials, ~k rows per
 *    partition per query cross the wire).
 *  - Optional exact rerank: take a shortlist of `rerank` ADC candidates,
 *    join BACK to the raw-vector table by id (keyed join against the
 *    shortlist only — the full vector table is never scanned), and
 *    re-score exactly. Standard IVF-PQ practice: ADC recall at small M
 *    is approximate, rerank restores exactness on the shortlist.
 *
 * Sizing the rerank knob: ADC cannot order candidates whose true
 * distances differ by less than the quantization noise, so recall@k is
 * governed by whether the shortlist COVERS the query's near-tie
 * population. On corpora with organic distance spread a small shortlist
 * suffices (measured avg recall ~0.73 at rerank=50 on the sf0.1
 * embeddings); on a corpus with thousands of near-duplicates of the
 * query, rerank must reach that population size (500k-vector soak in
 * docs/BENCH_NOTES.md: recall 0.005 -> 1.000 as rerank grows 50 ->
 * near-tie count, probe time ~flat because the shortlist join stays
 * keyed). Near-dup-heavy corpora should dedup (SemDedup/LSH) BEFORE
 * indexing — which this library does upstream anyway.
 */
object Pq {

  /** PQ model: `m` codebooks of `ks` sub-centroids of `dim/m` doubles. */
  final case class Model(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def ks: Int = codebooks(0).length
    def dsub: Int = codebooks(0)(0).length
  }

  /**
   * Train per-subspace k-means on a deterministic sample (first
   * `sampleSize` rows by id order — the same discipline as IVF.train:
   * at 100 TB you still train on a bounded sample and broadcast the
   * model). Vectors are unit-normalized BEFORE splitting, matching the
   * kernels, so ADC sums approximate cosine. `dim` must divide by `m`.
   */
  def train(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      m: Int,
      ks: Int = 16,
      iters: Int = 10,
      sampleSize: Int = 10000): Model = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(ks >= 1 && ks <= 256, s"ks must be in [1, 256], got $ks")
    val sample: Array[Array[Double]] = vectors
      .orderBy(col(idCol))
      .limit(sampleSize)
      .select(col(vecCol).cast("array<double>"))
      .collect()
      .map(_.getSeq[Double](0).toArray)
      .map(unitNorm)
    require(sample.length >= ks,
      s"sample (${sample.length}) smaller than ks ($ks)")
    val dim = sample.head.length
    require(dim % m == 0, s"dim ($dim) must be divisible by m ($m)")
    val dsub = dim / m

    val codebooks = Array.tabulate(m) { s =>
      val sub = sample.map(v => java.util.Arrays.copyOfRange(v, s * dsub, (s + 1) * dsub))
      kmeansL2(sub, ks, iters)
    }
    Model(codebooks)
  }

  private def unitNorm(v: Array[Double]): Array[Double] = {
    var n = 0.0
    var i = 0
    while (i < v.length) { n += v(i) * v(i); i += 1 }
    if (n == 0.0) return v.clone()
    val inv = 1.0 / math.sqrt(n)
    val out = new Array[Double](v.length)
    i = 0
    while (i < v.length) { out(i) = v(i) * inv; i += 1 }
    out
  }

  /** Plain (non-spherical) Lloyd's in L2 — sub-centroids are means, NOT
    * re-normalized: subvectors of a unit vector are not unit themselves.
    * Deterministic spread init (every (n/ks)-th sample subvector), ties
    * in assignment break to the lowest centroid index, empty cells keep
    * their previous centroid — same determinism contract as IVF.train. */
  private def kmeansL2(
      sample: Array[Array[Double]], ks: Int, iters: Int): Array[Array[Double]] = {
    val dsub = sample.head.length
    var centroids = Array.tabulate(ks)(i => sample(i * sample.length / ks).clone())
    var iter = 0
    while (iter < iters) {
      val sums = Array.fill(ks)(new Array[Double](dsub))
      val counts = new Array[Int](ks)
      sample.foreach { v =>
        var best = 0
        var bestD = Double.MaxValue
        var c = 0
        while (c < ks) {
          var d = 0.0
          var j = 0
          while (j < dsub) { val t = v(j) - centroids(c)(j); d += t * t; j += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        var j = 0
        while (j < dsub) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      centroids = Array.tabulate(ks) { c =>
        if (counts(c) == 0) centroids(c)
        else {
          val out = new Array[Double](dsub)
          var j = 0
          while (j < dsub) { out(j) = sums(c)(j) / counts(c); j += 1 }
          out
        }
      }
      iter += 1
    }
    centroids
  }

  /** The M PQ codes of a vector column (ARRAY<INT>, each in [0, ks)). */
  def encode(vec: Column, model: Model): Column =
    GraftShim.column(PqEncode(GraftShim.expression(vec), model.codebooks))

  /** The flattened M*ks ADC lookup table of a query vector column. */
  def lut(vec: Column, model: Model): Column =
    GraftShim.column(PqLut(GraftShim.expression(vec), model.codebooks))

  /** ADC score: sum over subspaces of lut[s*ks + codes[s]] (~ cosine). */
  def adc(codes: Column, lutCol: Column): Column =
    GraftShim.column(PqAdc(GraftShim.expression(codes), GraftShim.expression(lutCol)))

  /**
   * Persist a PQ model as a tiny parquet table (subspace, centroid_id,
   * centroid) — m*ks rows of dsub doubles. Train ONCE, save, and every
   * indexing/search job loads the same model: an index encoded under one
   * model scored against a LUT from another is garbage (PqAdc fails fast
   * only when the SHAPES differ).
   */
  def save(model: Model, path: String, spark: SparkSession): Unit = {
    import spark.implicits._
    model.codebooks.zipWithIndex.flatMap { case (book, s) =>
      book.zipWithIndex.map { case (c, i) => (s, i, c.toSeq) }
    }.toSeq
      .toDF("subspace", "centroid_id", "centroid")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  /** Load a model persisted by [[save]]; round-trips bit-identically. */
  def load(path: String, spark: SparkSession): Model = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select($"subspace".cast("int"), $"centroid_id".cast("int"),
        $"centroid".cast("array<double>"))
      .as[(Int, Int, Seq[Double])]
      .collect()
      .sortBy(r => (r._1, r._2))
    require(rows.nonEmpty, s"no PQ model at $path")
    val m = rows.map(_._1).max + 1
    val ks = rows.map(_._2).max + 1
    require(rows.length == m * ks &&
        rows.map(r => (r._1, r._2)).toSeq ==
          (for (s <- 0 until m; c <- 0 until ks) yield (s, c)),
      s"corrupt PQ model at $path: non-contiguous (subspace, centroid_id)")
    Model(rows.map(_._3.toArray).grouped(ks).map(_.toArray).toArray)
  }

  /**
   * Build the compressed index: one pure projection, no shuffle —
   * (id, cell, codes). Persist `partitionBy("cell")` for probe-time
   * partition pruning; the raw vector column is dropped.
   */
  def index(
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      pq: Model,
      ivf: IVF.Model): DataFrame =
    candidates.select(
      col(idCol).as("cand_id"),
      element_at(IVF.cells(col(vecCol), ivf, 1), 1).as("cell"),
      encode(col(vecCol), pq).as("codes"))

  /**
   * Persist the compressed index PARTITIONED by IVF cell: the `cell=`
   * directory layout turns a probe's cell list into parquet partition
   * pruning, so a query batch reads O(nprobe/k) of the index bytes —
   * never the corpus. At 100 TB this is the difference between a probe
   * that touches a few hundred files and one that scans the index. Codes
   * are small ints, so parquet dictionary/byte encoding keeps each row
   * at ~M bytes on disk.
   */
  def saveIndex(
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      pq: Model,
      ivf: IVF.Model,
      path: String): Unit =
    index(candidates, idCol, vecCol, pq, ivf)
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /**
   * Probe a persisted index: the query batch's probed-cell set (bounded
   * by the quantizer's k — driver-side data by construction) becomes an
   * `isin` partition filter on the `cell=` layout, then the same
   * broadcast-LUT ADC scan and bounded-heap top-k as [[topK]]. Pass
   * `rerankWith` (the raw-vector table) + `rerank` to re-score the ADC
   * shortlist exactly — the vector table is only ever joined against
   * shortlist ids, never scanned. The query side must be a bounded
   * batch (<= [[MaxQueryBatch]] rows — it is broadcast); split larger
   * workloads into batches.
   */
  def searchIndex(
      path: String,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      pq: Model,
      ivf: IVF.Model,
      nprobe: Int = 4,
      rerank: Int = 0,
      rerankWith: Option[DataFrame] = None): DataFrame = {
    require(rerank == 0 || rerank >= k,
      s"rerank shortlist ($rerank) must be 0 (off) or >= k ($k)")
    require((rerank == 0) == rerankWith.isEmpty,
      "rerank and rerankWith must be set together")
    requireBoundedQueries(queries)
    val spark = queries.sparkSession
    val touched = probedCells(queries, vecCol, ivf, nprobe)
    val idx = spark.read.parquet(path).filter(col("cell").isin(touched: _*))
    searchOn(idx, queries, idCol, vecCol, k, pq, ivf, nprobe, rerank, rerankWith)
  }

  /** The probed-cell set of a query batch — bounded by the quantizer's k,
    * so collecting it driver-side is free; it becomes the partition
    * filter on `cell=`-layout indexes. */
  def probedCells(
      queries: DataFrame, vecCol: String, ivf: IVF.Model, nprobe: Int): Seq[Int] =
    queries
      .select(explode(IVF.cells(col(vecCol), ivf, nprobe)).as("cell"))
      .distinct().collect().map(_.getInt(0)).toSeq

  /** Query batches are BROADCAST (per-probe, after the nprobe explode):
    * every search entry point assumes a bounded batch or sample, never a
    * corpus. The cap makes that contract executable — a corpus-sized
    * query side fails fast with a clear message instead of a driver-side
    * broadcast blow-up. At `nprobe` rows per query after the explode,
    * 2^20 queries is already ~1 GiB of broadcast LUTs at m*ks=256 — the
    * practical ceiling, not a tight bound. Split larger workloads into
    * batches (the streaming maintenance path does exactly that). */
  private[graft] val MaxQueryBatch: Long = 1L << 20

  /** Enforced once per PUBLIC entry point (topK / searchIndex /
    * driftScore / the streaming searchCommitted) — NOT inside searchOn,
    * which some of those call twice: the guard is an eager Spark job over
    * the query side, so placing it in the shared internal would scan an
    * unpersisted query plan once per internal call and make plan
    * construction eager at every layer. */
  private[graft] def requireBoundedQueries(queries: DataFrame): Unit = {
    // limit(cap+1).count() instead of count(): stops as soon as the cap is
    // exceeded rather than scanning an arbitrarily large query side
    val n = queries.limit(MaxQueryBatch.toInt + 1).count()
    require(n <= MaxQueryBatch,
      s"query batch exceeds $MaxQueryBatch rows: query batches are broadcast " +
        "(per-probe LUTs), so they must be bounded samples/batches, never a " +
        "corpus. Split the workload into batches.")
  }

  /** ADC search over an already-materialized index DataFrame
    * ((cand_id, cell, codes) — e.g. a partition-pruned read of a
    * [[saveIndex]] layout, or a streaming store's committed union).
    * The query side must be a bounded batch (see [[MaxQueryBatch]]). */
  private[graft] def searchOn(
      idx: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      pq: Model,
      ivf: IVF.Model,
      nprobe: Int,
      rerank: Int,
      rerankWith: Option[DataFrame]): DataFrame = {
    val qs = queries.select(
      col(idCol).as("query_id"),
      lut(col(vecCol), pq).as("q_lut"),
      explode(IVF.cells(col(vecCol), ivf, nprobe)).as("cell"))
    val shortlistK = if (rerank > 0) rerank else k
    val scored = idx
      .join(broadcast(qs), Seq("cell"))
      .filter(col("cand_id") =!= col("query_id"))
      .select(col("query_id"), col("cand_id"),
        adc(col("codes"), col("q_lut")).as("sim"))
      .groupBy("query_id")
      .agg(Similarity.topkByScore(col("cand_id"), col("sim"), shortlistK).as("top"))
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "r")))
      .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
        col("r.id").as("neighbor_id"))
    rerankWith match {
      case None => scored
      case Some(vecs) =>
        val cand = vecs.select(col(idCol).as("neighbor_id"), col(vecCol).as("cand_vec"))
        val qvec = queries.select(col(idCol).as("query_id"), col(vecCol).as("query_vec"))
        scored.select("query_id", "neighbor_id")
          .join(cand, Seq("neighbor_id"))
          .join(broadcast(qvec), Seq("query_id"))
          .select(col("query_id"), col("neighbor_id"),
            Similarity.cosineSim(col("cand_vec"), col("query_vec")).as("sim"))
          .groupBy("query_id")
          .agg(Similarity.topkByScore(col("neighbor_id"), col("sim"), k).as("top"))
          .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "r")))
          .select(col("query_id"), (col("pos") + 1).cast("long").as("rank"),
            col("r.id").as("neighbor_id"))
    }
  }

  /**
   * Quantizer drift score: per sampled query, the rank agreement between
   * the pure-ADC top-k and the exact-reranked top-k over the same probed
   * candidate stream — `agree_e6 = floor(1e6 * |adc_topk INTERSECT
   * exact_topk| / k)`, exact integer arithmetic (order-independent,
   * deterministic — the token_entropy discipline), so the score is
   * hash-stable and oracle-checkable.
   *
   * Why this detects drift: IVF/PQ codebooks are FROZEN at train time
   * (train-once contract — see [[PqStreaming.maintainIndex]]). As the
   * ingested distribution drifts away from the training sample, PQ
   * quantization error grows and the ADC ordering decouples from the
   * exact ordering — recall decays SILENTLY because probes still return
   * k rows. The exact-rerank side is ground truth on the shortlist, so
   * falling agreement is a direct, bounded-cost measurement of that
   * decay: cost is two probes of the same index for K sampled queries
   * (the ADC scan is shared work; the exact side joins raw vectors
   * against shortlist ids only — never a corpus scan).
   *
   * The retrain loop it gates: run periodically over a sample of recent
   * committed queries; when the mean of `agree_e6` falls below the floor
   * measured at deploy time, (1) retrain [[IVF.train]] + [[train]] on a
   * fresh sample of the CURRENT corpus, (2) re-encode the source vector
   * table under the new models with [[saveIndex]] — or, for a streaming
   * store, rebuild into a fresh path and retire the old one
   * ([[graft.streaming.PqStreaming.rebuildIndex]] is the file-layout
   * half; re-encoding under new models additionally requires the raw
   * vector source, since codes are not invertible) — and (3) point
   * queries at the new index. Never retrain in place: an index encoded
   * under one model scored against another's LUT is garbage.
   *
   * `queries` is a bounded sample batch (same contract as [[topK]]);
   * `rerank` sizes the exact side's shortlist (>= k, larger = stricter
   * ground truth). Output: (query_id, agree_e6), one row per query whose
   * probed cells held STRICTLY more than k candidates (at <= k the two
   * top-k sets are trivially equal — see the exclusion in the body).
   */
  def driftScore(
      index: DataFrame,
      vectors: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      pq: Model,
      ivf: IVF.Model,
      nprobe: Int = 4,
      rerank: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rerank >= k, s"rerank ($rerank) must be >= k ($k) for a drift audit")
    requireBoundedQueries(queries)
    // ask the ADC side for k+1: the extra rank is a zero-cost candidate
    // counter — a query returning k+1 rows had STRICTLY more than k probed
    // candidates, so its ADC top-k was a real selection. A query with <= k
    // candidates has ADC top-k == exact top-k trivially (both are all
    // candidates) — including the exactly-k case, where both sides are all
    // k candidates and agree_e6 is trivially 1e6 — so under sparse probes
    // or heavy drift those rows would report perfect agreement and mask
    // the decay the audit exists to detect. Keep only the k+1-row queries.
    val adcWide = searchOn(index, queries, idCol, vecCol, k + 1, pq, ivf,
      nprobe, rerank = 0, rerankWith = None)
    val exactTop = searchOn(index, queries, idCol, vecCol, k, pq, ivf,
      nprobe, rerank, rerankWith = Some(vectors))
      .select(col("query_id").as("eq"), col("neighbor_id").as("en"))
    adcWide
      .join(exactTop,
        col("query_id") === col("eq") && col("neighbor_id") === col("en"), "left")
      .groupBy(col("query_id"))
      // the rank-(k+1) row is the candidate probe, never a compared member:
      // count matches over ranks <= k only (exactTop has k rows, so the
      // extra rank could only ever match by k-vs-k+1 asymmetry anyway)
      .agg(count(when(col("rank") <= k, col("en"))).as("__matches"),
        count(lit(1)).as("__rows"))
      .filter(col("__rows") === (k + 1))
      .select(col("query_id"),
        (col("__matches") * lit(1000000L) / lit(k.toLong)).cast("long")
          .as("agree_e6"))
  }

  /**
   * IVF-PQ top-k: probe `nprobe` cells, ADC-score every candidate code
   * in a probed cell, bounded-heap top-k per query. With `rerank > k`,
   * the ADC shortlist of that size is re-scored exactly against the raw
   * vectors (keyed join on the shortlist ids only) before the final
   * top-k. Output matches the other ANN tiers:
   * (query_id, rank, neighbor_id). The query side must be a bounded
   * batch (<= [[MaxQueryBatch]] rows — it is broadcast).
   */
  def topK(
      candidates: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      pq: Model,
      ivf: IVF.Model,
      nprobe: Int = 4,
      rerank: Int = 0): DataFrame = {
    require(rerank == 0 || rerank >= k,
      s"rerank shortlist ($rerank) must be 0 (off) or >= k ($k)")
    requireBoundedQueries(queries)
    searchOn(index(candidates, idCol, vecCol, pq, ivf), queries,
      idCol, vecCol, k, pq, ivf, nprobe, rerank,
      if (rerank == 0) None else Some(candidates))
  }
}
