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

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

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

  /** `bitsPerTable` sentinel for [[lshNearDupPairs]]: size the tables from
    * the corpus count at plan-build time — see [[autoBits]]. A FIXED bit
    * width is a scale bug waiting: candidate pairs per bucket grow with
    * occupancy², so a knob tuned at 1× turns quadratic at 10× (the
    * g_lsh_neardup growth row's r13 finding). Cost note: AUTO runs one
    * count() job over `vectors` at plan-build time — a caller whose
    * vectors carry an expensive unpersisted lineage should persist it
    * first or pass explicit bits. */
  val AutoBits = 0

  /** Bits so that expected bucket occupancy n / 2^bits stays near
    * `targetOccupancy` as the corpus grows: round(log2(n / target)),
    * clamped to [1, 24]. The default target reproduces the tuned series
    * at the real corpora: the 2k-vector sf0.1 table gets the classic 4
    * bits, its 4×/10× replicas get 6/7 — constant expected candidate
    * work per vector, recall governed by `tables` as before. */
  private[graft] def autoBits(n: Long, targetOccupancy: Long = 128L): Int = {
    require(targetOccupancy >= 1L)
    val ratio = math.max(1.0, n.toDouble / targetOccupancy)
    math.max(1, math.min(24, math.round(math.log(ratio) / math.log(2.0)).toInt))
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
    GraftShim.column(lshBucketsExpression(
      GraftShim.expression(vec), dim, bitsPerTable, tables, seed))

  /** Expression-level twin of [[lshBuckets]] (also the builder behind the
    * SQL function `lsh_buckets`). */
  private[graft] def lshBucketsExpression(
      vec: org.apache.spark.sql.catalyst.expressions.Expression,
      dim: Int, bitsPerTable: Int, tables: Int, seed: Long)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    // HyperplaneBuckets tags the table index from bit 32 up, so bucket bits
    // above 32 would silently overlap the tag and merge buckets ACROSS
    // tables — reject instead.
    require(bitsPerTable >= 1 && bitsPerTable <= 32,
      s"bitsPerTable must be in [1, 32], got $bitsPerTable")
    require(tables >= 1, s"tables must be >= 1, got $tables")
    require(dim >= 1, s"dim must be >= 1, got $dim")
    graft.expressions.HyperplaneBuckets(
      vec, hyperplanes(dim, bitsPerTable, tables, seed))
  }

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
   * Raising guard: ids must be in [0, 2^31) so a pair packs losslessly
   * into one positive BIGINT via `a << 32 | b` (bit ops, no floating-point
   * round-trip) AND packed values order lexicographically by (a, b) — the
   * tie-break order TopKAgg relies on. Ids at or above 2^31 would set the
   * sign bit after the shift and silently break both properties, so they
   * raise instead.
   */
  private def packableId(c: Column, name: String, op: String): Column =
    when(c >= 0 && c < lit(2147483648L), c)
      .otherwise(raise_error(concat(
        lit(s"$op: $name must be in [0, 2^31) to pack into one BIGINT, got "),
        c.cast("string"))))

  private def packPair(a: Column, b: Column): Column =
    shiftleft(a, 32).bitwiseOR(b)

  private def unpackA(pair: Column): Column = shiftrightunsigned(pair, 32)
  private def unpackB(pair: Column): Column = pair.bitwiseAND(lit(0xFFFFFFFFL))

  /**
   * Embedding-cosine near-duplicate pairs: the most-similar `topPairs`
   * pairs (a < b) across the table, exact brute force via a single
   * global TopKAgg over pair ids packed into one BIGINT (a << 32 | b).
   * This is the exact O(n^2) tier — correct at any similarity level but
   * quadratic in n; for large corpora use [[lshNearDupPairs]] (same output
   * shape, sub-quadratic candidate generation).
   *
   * Precondition: ids in [0, 2^31) (see [[packableId]]) — checked on both
   * join sides — and unique: a duplicated id makes the self-join emit one
   * row per copy of the pair, each eligible for its own rank (the scale
   * tier, [[lshNearDupPairs]], collapses duplicates defensively; this
   * exact tier stays lean and treats unique ids as a contract).
   */
  def cosineNearDupPairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      topPairs: Int): DataFrame = {
    val a = vectors.select(
      packableId(col(idCol), idCol, "cosineNearDupPairs").as("id_a"),
      col(vecCol).as("vec_a"))
    val b = vectors.select(
      packableId(col(idCol), idCol, "cosineNearDupPairs").as("id_b"),
      col(vecCol).as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .select(
        packPair(col("id_a"), col("id_b")).as("pair"),
        cosineSim(col("vec_a"), col("vec_b")).as("sim"))
      .agg(topkByScore(col("pair"), col("sim"), topPairs).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "r")))
      .select(
        (col("pos") + 1).cast("long").as("rank"),
        unpackA(col("r.id")).as("doc_a"),
        unpackB(col("r.id")).as("doc_b"))
  }

  /**
   * Sub-quadratic embedding near-duplicate pair scan — the 100 TB path for
   * [[cosineNearDupPairs]] (same `(rank, doc_a, doc_b)` output shape).
   *
   * Plan shape (no O(n^2) join anywhere, and no row ever holds more than
   * one bucket's ID LIST — vectors never enter the pair space):
   *  1. one scan computes all `tables` hyperplane bucket ids per vector in
   *     a single native-expression pass ([[graft.expressions.HyperplaneBuckets]])
   *     and explodes them — n * tables (id, bucket) rows, 16 bytes each;
   *  2. one shuffle by bucket; candidate ID pairs stream out of each bucket
   *     via the chained-generator idiom ([[PairGen]]) — peak per-row memory
   *     is one id array (8 bytes x bucket size), never the O(b²) pair array,
   *     and never a vector. Buckets past `maxBucket` are tiled across tasks
   *     with exact recall ([[PairGen.allPairs]]), never silently dropped;
   *     `hardMaxBucket` opts into dropping as an explicit work bound;
   *  3. one shuffle by packed pair id dedupes multi-table collisions while
   *     pairs are still 8-byte longs;
   *  4. vectors are joined back by id (two shuffled equi-joins that touch
   *     only surviving candidate pairs), exact cosine is computed once per
   *     distinct pair, and the global bounded-heap TopKAgg (map-side
   *     partial top-k) reports.
   *
   * Recall < 1 by design: a pair is found iff its vectors agree on every
   * bit of at least one table. P(found) = 1-(1-(1-theta/pi)^bits)^tables —
   * with the 4-bit x 16-table default, cosine 0.9 pairs are caught w.p.
   * ~0.99999, cosine 0.5 w.p. ~0.97; tune bits up / tables down for fewer
   * candidates at lower recall. Deterministic: seeded planes, id-sorted
   * buckets, exact rerank, TopKAgg total order. Duplicate input ids never
   * produce self-pairs: pair generation is over the sorted id list and
   * keeps strictly-increasing pairs only, matching the exact tier's
   * `id_a < id_b` join.
   *
   * Cost caveat (the [[AutoBits]] default): sizing the tables needs the
   * corpus count, so a call with the default `bitsPerTable` runs one
   * count() job over `vectors` AT PLAN-BUILD TIME — over an expensive
   * unpersisted lineage that job re-prices the lineage. Callers that
   * already know the corpus size (table stats, a prior count, a fixed
   * fixture) pass it as `knownCount` and skip the job entirely; the
   * chosen width is identical (`autoBits(knownCount)`) and is logged
   * either way so result drift from auto-sizing stays diagnosable.
   */
  def lshNearDupPairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      topPairs: Int,
      dim: Int,
      bitsPerTable: Int = AutoBits,
      tables: Int = 16,
      seed: Long = 42L,
      maxBucket: Int = 10000,
      hardMaxBucket: Int = Int.MaxValue,
      knownCount: Long = -1L): DataFrame = {
    // resolve the corpus count ONCE: AutoBits needs it anyway, and it
    // also decides the verify-join strategy below. Explicit-bits callers
    // without knownCount keep their no-count-job promise (None).
    val nOpt: Option[Long] =
      if (knownCount >= 0) Some(knownCount)
      else if (bitsPerTable == AutoBits) Some(vectors.count())
      else None
    val bits =
      if (bitsPerTable != AutoBits) bitsPerTable
      else {
        val b = autoBits(nOpt.get)
        log.info(s"lshNearDupPairs: autoBits picked $b bits for n=${nOpt.get} vectors")
        b
      }
    val pairs = lshCandidatePairs(vectors, idCol, vecCol, dim, bits,
      tables, seed, maxBucket, hardMaxBucket, knownCount)

    // The verify joins are CANDIDATES x VECTORS — the candidate table is
    // ~tables x occupancy/2 (≈1000x) ROWS-larger than the vector table,
    // but its STATS are structurally underestimated (a generator's
    // fanout is invisible to the planner), so the stats ladder alone
    // keeps sort-merge past the broadcast threshold and SORTS the huge
    // candidate table (measured: the g_lsh_neardup x32 point was 109 s
    // with two sorts, 53 s as shuffled hash joins). Strategy, using the
    // count already paid for AutoBits: vectors that fit the broadcast
    // threshold get NO hint — Spark's size-based BroadcastHashJoin is
    // strictly best and a hint would bypass it (measured: x1 2.1 s
    // broadcast vs 2.7 s hinted) — while a vector side provably past the
    // threshold is hinted shuffle_hash, building the hash table on the
    // side whose per-partition memory scales gently
    // (|vectors|/partitions) and never sorting the candidate stream.
    // Unknown count (explicit bits, no knownCount): no hint; set
    // `spark.sql.join.preferSortMergeJoin=false` (every main here does —
    // the recommended deployment conf) so the stats ladder can still
    // pick shuffled-hash where its estimates allow.
    // the threshold is read from the VECTORS' OWN session (SQLConf.get is
    // the thread-local active session — in a multi-session JVM it can be
    // another session's conf and flip the decision), and the per-element
    // width from the column's actual schema: an array<double> corpus is
    // 2x the float estimate, exactly the margin that decides the regime
    // this fix targets
    val elemBytes = vectors.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(et, _) => math.max(4L, et.defaultSize.toLong)
      case _ => 4L
    }
    val vecBytes = nOpt.map(_ * (8L + elemBytes * dim))
    val threshold = vectors.sparkSession.sessionState.conf
      .autoBroadcastJoinThreshold
    val hintBuild = vecBytes.exists(b => threshold < 0 || b > threshold)
    def side(named: DataFrame): DataFrame =
      if (hintBuild) named.hint("shuffle_hash") else named
    val va = side(vectors.select(col(idCol).as("ja"), col(vecCol).as("vec_a")))
    val vb = side(vectors.select(col(idCol).as("jb"), col(vecCol).as("vec_b")))

    pairs
      .join(va, unpackA(col("pair")) === col("ja"))
      .join(vb, unpackB(col("pair")) === col("jb"))
      .select(col("pair"), cosineSim(col("vec_a"), col("vec_b")).as("sim"))
      // duplicate input ids multiply pairs through the joins; collapse so
      // each (a, b) holds at most one rank in the top-k
      .groupBy("pair").agg(max(col("sim")).as("sim"))
      .agg(topkByScore(col("pair"), col("sim"), topPairs).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "r")))
      .select(
        (col("pos") + 1).cast("long").as("rank"),
        unpackA(col("r.id")).as("doc_a"),
        unpackB(col("r.id")).as("doc_b"))
  }

  /** Stage 1-3 of [[lshNearDupPairs]] — the DISTINCT candidate-pair table
    * (one packed 8-byte id per pair) before any vector is joined back.
    * Shared with the verify stage and exposed so operators (and the
    * bench's slope decomposition) can measure candidate volume directly:
    * candidates/input staying ~flat across corpus growth means AutoBits
    * is holding occupancy, and the scan cost is verify-side. */
  private[graft] def lshCandidatePairs(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      bitsPerTable: Int = AutoBits,
      tables: Int = 16,
      seed: Long = 42L,
      maxBucket: Int = 10000,
      hardMaxBucket: Int = Int.MaxValue,
      knownCount: Long = -1L): DataFrame = {
    require(bitsPerTable == AutoBits || (bitsPerTable >= 1 && bitsPerTable <= 32),
      s"bitsPerTable must be AutoBits (0) or in [1, 32], got $bitsPerTable")
    val bits =
      if (bitsPerTable != AutoBits) bitsPerTable
      else {
        val n = if (knownCount >= 0) knownCount else vectors.count()
        val b = autoBits(n)
        // one line per call so result drift from auto-sizing is diagnosable
        // (the chosen width changes the candidate set, hence the report)
        log.info(s"lshNearDupPairs: autoBits picked $b bits for n=$n vectors")
        b
      }
    val blocked = vectors.select(
      packableId(col(idCol), idCol, "lshNearDupPairs").as("vid"),
      explode(lshBuckets(col(vecCol), dim, bits, tables, seed)).as("bucket"))

    PairGen.allPairs(
      blocked, Seq(col("bucket")), col("vid"), maxBucket,
      "vid_a", "vid_b", hardMaxBucket)
      .filter(col("vid_a") < col("vid_b")) // drop self-pairs from duplicate ids
      .select(packPair(col("vid_a"), col("vid_b")).as("pair"))
      .distinct() // multi-table collision dedup on 8-byte keys
  }
}
