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

  /** `shortlist` sentinel for [[lshNearDupPairs]] opting IN to the
    * two-pass signature verify at the default size,
    * `max(1024 * topPairs, 65536)`. NOT the default — see the verify
    * contract on the operator: on a low-margin corpus (organic top-k,
    * no true near-dups) a signature rank cannot separate the boundary
    * pairs and the report drifts (measured: 45/50 overlap on sf0.1's
    * 1.28M candidates), so the knob is for the HIGH-MARGIN near-dup
    * regime where the top pairs sit far above the candidate crowd. */
  val AutoShortlist = 0

  /** `shortlist` default for [[lshNearDupPairs]]: every candidate pair
    * fetches full vectors and is reranked exactly — results depend only
    * on the candidate set (bits/tables), never on a signature rank. */
  val NoShortlist = -1

  /** `shortlist` sentinel for [[lshNearDupPairs]] delegating the regime
    * question to a MEASUREMENT: run [[shortlistMargin]] once at
    * plan-build and choose the two-pass signature verify iff the
    * measured margin clears [[SafeMarginBits]], exact otherwise — the
    * r18 doctrine ("high-margin corpora may opt in") wired to its own
    * audit so the 4× x100 win is mechanically safe, not doctrine-safe.
    * Cost: the audit is an ACTION at plan-build (two passes over the
    * candidate Hamming stream + a shortlist-sized exact rerank — see
    * [[shortlistMargin]]'s cost note); callers on a stable corpus
    * family should run [[auditShortlist]] once themselves and pass
    * [[AutoShortlist]] / [[NoShortlist]] explicitly thereafter. */
  val AuditedShortlist = -2

  /** The audited-mode safety bar, in signature-Hamming bits: a true top
    * pair's Hamming draw is Binomial(128, theta/pi) around its expected
    * value with sigma <= sqrt(128)/2 = 5.66 bits, so a cut line >= 18
    * bits (~3 sigma) above the boundary pair's expectation means the
    * shortlist report matches exact verification essentially surely
    * (the [[shortlistMargin]] contract; PipelineSpec pins both regimes:
    * planted near-dups audit >= 18, the organic sf0.1 corpus audits 7). */
  val SafeMarginBits = 18

  /** [[AutoShortlist]]'s resolved size, Long-safe: `1024 * topPairs`
    * would overflow Int for topPairs > 2^21 and silently truncate the
    * report below `topPairs` (r18 ADVICE) — compute in Long, clamp to
    * Int.MaxValue. The result is >= topPairs for every positive input:
    * 1024 * topPairs >= topPairs until the clamp, and the clamp itself
    * is >= any Int topPairs. */
  private[graft] def autoShortlistN(topPairs: Int): Int =
    math.min(Int.MaxValue.toLong, math.max(1024L * topPairs, 65536L)).toInt

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

  /** [[cosineNearDupPairs]]' auto-dispatch bar: above this corpus size
    * the exact O(n²) tier self-routes to [[lshNearDupPairs]] (the
    * [[graft.operators.Rollups]] slidingMerge dispatch precedent — the
    * r19 verdict's last standing exact-tier scale hazard). MEASURED
    * crossover on the sf0.1 corpus family (graft.tools.SentCal
    * crossover; the r20 BENCH_NOTES table): the codegen'd exact tier
    * WINS every octave to x32 — 2k 1.6 s/0.63x, 8k 4.2 s/0.55x, 20k
    * 11.8 s/0.58x, 64k 39.5 s/0.74x of the LSH tier — because it
    * streams pairs through whole-stage codegen into a bounded heap with
    * no shuffle at all; but its n² compute crosses the LSH trend near
    * n≈100k (extrapolated against the measured 200k LSH point) and is
    * catastrophic at corpus scale. The bar sits at the LAST MEASURED
    * octave where exact still wins, so dispatch only ever fires where
    * the quadratic term provably dominates. Pass
    * `maxExactRows = Long.MaxValue` to pin the exact plan at any n. */
  val ExactTierMaxRows: Long = 65536L

  /**
   * Embedding-cosine near-duplicate pairs: the most-similar `topPairs`
   * pairs (a < b) across the table, exact brute force via a single
   * global TopKAgg over pair ids packed into one BIGINT (a << 32 | b).
   * This is the exact O(n^2) tier — correct at any similarity level but
   * quadratic in n; for large corpora use [[lshNearDupPairs]] (same output
   * shape, sub-quadratic candidate generation).
   *
   * AUTO-DISPATCH (r19 verdict task 7): a corpus past `maxExactRows`
   * ([[ExactTierMaxRows]]) self-routes to [[lshNearDupPairs]] — same
   * output shape, sub-quadratic, recall < 1 by design (the default
   * bits/tables catch cosine-0.9 pairs w.p. ~0.99999) — with one WARN
   * naming the switch, so the exact spelling can no longer turn into an
   * accidental O(n²) scan at scale. Resolving n reads the optimizer's
   * row-count statistic when it carries one and falls back to one
   * column-pruned count() at plan-build (the [[Dedup.minhashLshPairs]]
   * short-circuit); `knownCount` skips even that. Callers needing exact
   * results at any size pass `maxExactRows = Long.MaxValue`; the
   * dispatch path infers `dim` from one head() row (only ever paid past
   * the bar).
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
      topPairs: Int,
      maxExactRows: Long = ExactTierMaxRows,
      knownCount: Long = -1L): DataFrame = {
    require(maxExactRows >= 1L,
      s"maxExactRows must be >= 1, got $maxExactRows")
    val n =
      if (knownCount >= 0) knownCount
      else if (maxExactRows == Long.MaxValue) 0L // exact pinned: no job
      else vectors.queryExecution.optimizedPlan.stats.rowCount
        .map(_.toLong).getOrElse(vectors.count())
    if (n > maxExactRows) {
      val dim = vectors.select(size(col(vecCol)).as("d")).head().getInt(0)
      log.warn(s"cosineNearDupPairs: n=$n exceeds maxExactRows=$maxExactRows — " +
        s"dispatching to lshNearDupPairs (dim=$dim; sub-quadratic, recall < 1 " +
        "by design — pass maxExactRows = Long.MaxValue to pin the exact O(n^2) plan)")
      return lshNearDupPairs(vectors, idCol, vecCol, topPairs, dim,
        knownCount = n)
    }
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
   * Verify stage: by DEFAULT every candidate fetches both full vectors
   * and is scored exactly — the report depends only on the candidate
   * set (bits/tables), never on a rank approximation.
   *
   * `shortlist > 0` (or [[AutoShortlist]]) opts into the TWO-PASS
   * verify for the extreme-candidate-volume regime: pass 1 joins the
   * candidate stream against a 128-BIT HYPERPLANE SIGNATURE table
   * (24 B/row — broadcastable to ~400k vectors, `shuffle_hash`-hinted
   * past that), ranks pairs by signature Hamming distance (an unbiased
   * angle estimate: E[ham] = 128·theta/pi), keeps the best `shortlist`
   * pairs; pass 2 fetches full vectors for the SHORTLIST ONLY
   * (broadcast pair list, bounded by construction) and reranks with
   * exact cosine. The candidate stream never meets a vector payload —
   * the measured x100 spill regime (230.8M candidates through two
   * shuffled-hash joins carrying 256-B embedding rows, per-candidate
   * cost drifting 0.65 -> 1.11 us on one 32-core JVM) shrinks to a
   * map-side signature pass.
   *
   * WHY opt-in and not the default: a true top pair is lost iff its
   * signature Hamming ranks below `shortlist` among all candidates —
   * which only has margin when the top pairs sit far above the crowd
   * (the DEDUP regime: planted/replicated near-dups at cosine 0.9+,
   * E[ham] <= 15 vs a crowd at 30+; PipelineSpec pins two-pass ==
   * exact there). On a LOW-MARGIN corpus (organic top-k over random-ish
   * embeddings, boundary pairs within a few degrees of the crowd) no
   * practical signature width separates them — measured on sf0.1's
   * 1.28M candidates: 45/50 overlap at the default shortlist. The
   * default therefore stays exact; callers hunting true near-dups at
   * 100 TB volumes opt in, like choosing bits/tables — or pass
   * [[AuditedShortlist]] to let the measured margin choose
   * ([[auditShortlist]]; two-pass iff margin >= [[SafeMarginBits]]).
   *
   * Two-pass fine print on DUPLICATE ids: pass 1 signs ONE
   * representative vector per id (min-struct collapse in
   * [[signatureTable]]) while the exact tier scores every duplicate row
   * and keeps max(sim) — so the bit-identical-to-exact guarantee
   * assumes unique ids (or identical payloads per id). Ids duplicated
   * with DIFFERENT vectors can rank a pair by the wrong copy's
   * signature in pass 1 and drop a true top pair; dedupe ids first (or
   * use [[NoShortlist]]) in that case.
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
      knownCount: Long = -1L,
      shortlist: Int = NoShortlist): DataFrame = {
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
    // broadcast vs 2.7 s hinted) — a vector side past the threshold but
    // under the verify broadcast cap is hinted broadcast (r21: the
    // candidate stream then never shuffles at all), and one past the cap
    // is hinted shuffle_hash, building the hash table on the side whose
    // per-partition memory scales gently (|vectors|/partitions) and
    // never sorting the candidate stream.
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
    // the shared three-tier ladder (VerifyJoin): no hint under the session
    // broadcast threshold, explicit broadcast up to the verify cap — the
    // candidate stream then never shuffles; measured at the x32 growth
    // point this removed the two ~280 B/row stream shuffles that were the
    // bulk of the 61.8 s — shuffle_hash past the cap
    def sized(named: DataFrame, rowBytes: Long): DataFrame =
      VerifyJoin.sizeAwareBuild(named, nOpt.map(_ * rowBytes))

    require(shortlist == AutoShortlist || shortlist == NoShortlist ||
      shortlist == AuditedShortlist || shortlist >= topPairs,
      s"shortlist must be AutoShortlist (0), NoShortlist (-1), " +
        s"AuditedShortlist (-2), or >= topPairs=$topPairs, got $shortlist")
    // AUDITED mode: measure the margin once at plan-build and let the
    // documented bar choose — two-pass only when a boundary pair provably
    // cannot cross the cut line (see AuditedShortlist / SafeMarginBits)
    val resolvedShortlist =
      if (shortlist != AuditedShortlist) shortlist
      else {
        val (_, useTwoPass) = auditShortlist(vectors, idCol, vecCol,
          topPairs, dim, bitsPerTable, tables, seed, maxBucket,
          hardMaxBucket, knownCount = nOpt.getOrElse(-1L))
        if (useTwoPass) AutoShortlist else NoShortlist
      }
    val shortlistN =
      if (resolvedShortlist == AutoShortlist) autoShortlistN(topPairs)
      else resolvedShortlist
    require(shortlistN <= 0 || shortlistN >= topPairs,
      s"resolved shortlist $shortlistN < topPairs=$topPairs")

    // Candidate-volume advisory (plan-build, exact-verify path only): the
    // expected candidate stream times the verify-row width, against the
    // measured single-JVM spill boundary — the documented "x100 exact
    // verify needs SPARK_DRIVER_MEM=24g" doctrine observable AT THE
    // OPERATOR instead of only in docs. Cluster deployments size executors
    // instead; the WARN names both knobs.
    if (shortlistN <= 0) nOpt.foreach { n =>
      val est = expectedVerifyBytes(n, bits, tables, elemBytes, dim)
      if (est > SingleJvmSpillAdvisoryBytes)
        log.warn(f"lshNearDupPairs: expected candidate volume ~${est / (1L << 30)}%.0f GiB " +
          f"(n=$n, $bits bits x $tables tables, ${elemBytes}B x $dim dims) is past the " +
          f"measured single-JVM spill regime (~${SingleJvmSpillAdvisoryBytes / (1L << 30)} GiB; " +
          "the 8g-heap OOM boundary sat at 231M candidates x 536 B). On one JVM set " +
          "SPARK_DRIVER_MEM >= 24g, or audit the corpus with auditShortlist and opt " +
          "into shortlist = AutoShortlist (measured 2-4x cheaper across recorded x100 " +
          "runs — BENCH_NOTES has the series; exact when the margin clears " +
          s"$SafeMarginBits bits); on a cluster, size executor memory for " +
          "|vectors|/partitions hash builds.")
    }

    val scored =
      if (shortlistN <= 0) {
        // single-pass exact verify of every candidate (NoShortlist):
        // both full vectors fetched per pair, the pre-r18 plan
        val va = sized(
          vectors.select(col(idCol).as("ja"), col(vecCol).as("vec_a")),
          8L + elemBytes * dim)
        val vb = sized(
          vectors.select(col(idCol).as("jb"), col(vecCol).as("vec_b")),
          8L + elemBytes * dim)
        pairs
          .join(va, unpackA(col("pair")) === col("ja"))
          .join(vb, unpackB(col("pair")) === col("jb"))
          .select(col("pair"), cosineSim(col("vec_a"), col("vec_b")).as("sim"))
      } else {
        // PASS 1 — signature rank: one row per id carrying a 128-bit
        // hyperplane signature (independent seed — signatures correlated
        // with the bucketing planes would compress Hamming resolution on
        // exactly the pairs the buckets already agree on), packed into
        // two longs from four 32-bit tables. The per-id collapse (min
        // struct) is defensive against duplicate input ids, mirroring
        // the exact tier's max(sim); it also guarantees unique build
        // keys for the broadcast.
        val sigs = signatureTable(vectors, idCol, vecCol, dim, seed)
        val sa = sized(sigs.select(col("sid").as("ja"),
          col("sig1").as("a1"), col("sig2").as("a2")), 24L)
        val sb = sized(sigs.select(col("sid").as("jb"),
          col("sig1").as("b1"), col("sig2").as("b2")), 24L)
        // the candidate stream meets only 24-byte signature rows — with
        // the sig table broadcast (every corpus to ~400k vectors) the
        // whole pass is map-side on the distinct output, and the global
        // TopKAgg ships at most `shortlist` rows per partition
        val short = pairs
          .join(sa, unpackA(col("pair")) === col("ja"))
          .join(sb, unpackB(col("pair")) === col("jb"))
          .select(col("pair"),
            (bit_count(col("a1").bitwiseXOR(col("b1"))) +
              bit_count(col("a2").bitwiseXOR(col("b2")))).as("ham"))
          .agg(topkByScore(col("pair"),
            (lit(0) - col("ham")).cast("double"), shortlistN).as("top"))
          .select(explode(col("top")).as("r"))
          .select(col("r.id").as("pair"))
        // PASS 2 — exact rerank of the shortlist only. Shape: the pair
        // list (bounded at `shortlist` rows by construction) broadcasts
        // against the vector table ONCE PER SIDE — the corpus streams
        // through un-shuffled, each map-side join emits one
        // (pair, vector) row per shortlist hit — and the two
        // shortlist-sized halves meet in a trivial pair-keyed join.
        // (The tempting pairs->join(va)->join(vb) chain would carry
        // vec_a through the second join with join-output stats past the
        // broadcast threshold — a wide-row sort-merge hazard at large
        // dim; two half-fetches never put a vector on a big join's
        // build or sort path.)
        val aHalf = vectors
          .join(broadcast(short.select(col("pair"),
            unpackA(col("pair")).as("ja"))), col(idCol) === col("ja"))
          .select(col("pair"), col(vecCol).as("vec_a"))
        val bHalf = vectors
          .join(broadcast(short.select(col("pair"),
            unpackB(col("pair")).as("jb"))), col(idCol) === col("jb"))
          .select(col("pair"), col(vecCol).as("vec_b"))
        aHalf.join(bHalf, Seq("pair"))
          .select(col("pair"), cosineSim(col("vec_a"), col("vec_b")).as("sim"))
      }

    scored
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

  /** Expected bytes flowing through the exact verify stage: candidate
    * pairs (`tables * n * occupancy / 2` with occupancy `n / 2^bits` —
    * the expectation under uniform hashing; real corpora run ~1.1-1.5x
    * from bucket skew, the right order for an advisory) times the
    * verify-row width (8 B packed pair + two fetched vectors). At the
    * measured x100 point (n=200k, 11 bits, 16 tables, 4 B x 64 dims)
    * this is ~78 GiB vs 231M distinct candidates observed — the regime
    * where the 8g single-JVM heap hit its OOM boundary. */
  private[graft] def expectedVerifyBytes(
      n: Long, bits: Int, tables: Int, elemBytes: Long, dim: Int): Double = {
    val occupancy = n.toDouble / (1L << bits)
    val expCandidates = tables.toDouble * n.toDouble * occupancy / 2.0
    expCandidates * (8.0 + 2.0 * (8.0 + elemBytes.toDouble * dim))
  }

  /** Advisory boundary for [[expectedVerifyBytes]] on one JVM: the x32
    * growth point (~34 GiB expected, 64M candidates) ran clean on the
    * default 8g heap while the x100 point (~78 GiB expected, 231M
    * candidates) sat at the 8g OOM boundary and needed 24g — the bar
    * sits between them, at the start of the measured spill regime. */
  val SingleJvmSpillAdvisoryBytes: Long = 64L << 30

  /**
   * The audited-shortlist decision as a reusable measurement: runs
   * [[shortlistMargin]] (an ACTION — see its cost note) and applies the
   * [[SafeMarginBits]] bar. Returns `(marginBits, useTwoPass)`; a corpus
   * with no candidates (or a null margin) reports `Int.MinValue` and
   * chooses exact — the safe default. One INFO line records the choice
   * so report provenance stays diagnosable. Run once per corpus family,
   * then pass [[AutoShortlist]]/[[NoShortlist]] explicitly on the hot
   * path; or pass `shortlist = AuditedShortlist` to fold the audit into
   * the operator's own plan-build.
   */
  def auditShortlist(
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
      knownCount: Long = -1L): (Int, Boolean) = {
    val row = shortlistMargin(vectors, idCol, vecCol, topPairs, dim,
      bitsPerTable, tables, seed, maxBucket, hardMaxBucket, knownCount)
      .head()
    val margin =
      if (row.isNullAt(row.fieldIndex("margin"))) Int.MinValue
      else row.getAs[Int]("margin")
    val useTwoPass = margin >= SafeMarginBits
    log.info(s"auditShortlist: margin=$margin bits vs bar $SafeMarginBits -> " +
      (if (useTwoPass) "two-pass signature shortlist (safe: a boundary pair cannot cross the cut)"
       else "exact verify (thin margin: the shortlist tail would drift)"))
    (margin, useTwoPass)
  }

  /** The 128-bit hyperplane signature table behind the two-pass verify:
    * one row per id, two longs from four 32-bit tables at an independent
    * seed (signatures correlated with the bucketing planes would
    * compress Hamming resolution on exactly the pairs the buckets
    * already agree on). The per-id collapse (min struct) is defensive
    * against duplicate input ids — mirroring the exact tier's max(sim) —
    * and guarantees unique build keys for the broadcast. */
  private def signatureTable(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      seed: Long): DataFrame = {
    val sigSeed = seed ^ 0x5EEDC0DEL
    val mask32 = lit(0xFFFFFFFFL)
    vectors
      .select(
        packableId(col(idCol), idCol, "lshNearDupPairs").as("sid"),
        lshBuckets(col(vecCol), dim, 32, 4, sigSeed).as("sb"))
      .select(col("sid"),
        shiftleft(element_at(col("sb"), 1).bitwiseAND(mask32), 32)
          .bitwiseOR(element_at(col("sb"), 2).bitwiseAND(mask32)).as("sig1"),
        shiftleft(element_at(col("sb"), 3).bitwiseAND(mask32), 32)
          .bitwiseOR(element_at(col("sb"), 4).bitwiseAND(mask32)).as("sig2"))
      .groupBy(col("sid"))
      .agg(min(struct(col("sig1"), col("sig2"))).as("s"))
      .select(col("sid"), col("s.sig1").as("sig1"), col("s.sig2").as("sig2"))
  }

  /**
   * Margin AUDIT for the two-pass shortlist — answers "is this corpus in
   * the regime where `shortlist` is safe?" with a measurement instead of
   * a guess (the scaladoc's high-margin/low-margin doctrine, made
   * checkable). One row:
   *
   *  - `n_candidates` — the distinct candidate-pair count;
   *  - `ham_shortlist` — the `shortlist`-th smallest 128-bit signature
   *    Hamming among candidates (the CUT LINE pass 1 applies);
   *  - `sim_top` — the exact cosine of the `topPairs`-th best pair
   *    found within the shortlist (where the report's boundary lives);
   *  - `expected_ham_top` — the Hamming a pair AT that cosine draws in
   *    expectation: 128·arccos(sim_top)/pi;
   *  - `margin` — `ham_shortlist - expected_ham_top`, in bits;
   *  - `ham_median` — the candidate crowd's median, for context.
   *
   * Why this is the right statistic (and not the naive "k-th smallest
   * Hamming vs the cut", which reads safe exactly when it is not): a
   * true top pair is lost iff ITS Hamming draw exceeds the cut, and its
   * draw is Binomial(128, theta/pi) around `expected_ham_top` with
   * sigma <= sqrt(128)/2 = 5.66 bits. So `margin >= 18` (~3 sigma)
   * means a pair at the boundary cosine essentially cannot cross the
   * cut and the shortlist report will match exact verification; a
   * margin near or below ~11 means boundary pairs sit inside the crowd
   * and the tail WILL drift (use [[NoShortlist]]). The estimate is
   * CONSERVATIVE: if true top pairs are already missing from the
   * shortlist, the measured `sim_top` is an underestimate, which
   * inflates `expected_ham_top` and shrinks the reported margin —
   * an unsafe corpus cannot audit as safe. PipelineSpec pins the
   * discriminator on both regimes: the planted near-dup fixture audits
   * wide, the organic sf0.1 corpus (measured 45/50 overlap) audits
   * thin.
   *
   * Cost: two passes over the candidate Hamming stream (cut stats +
   * shortlist extraction) plus the shortlist-sized exact rerank — run
   * it once per corpus family before choosing the knob.
   */
  def shortlistMargin(
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
      knownCount: Long = -1L,
      shortlist: Int = AutoShortlist): DataFrame = {
    require(topPairs >= 1, s"topPairs must be >= 1, got $topPairs")
    val shortlistN =
      if (shortlist == AutoShortlist) autoShortlistN(topPairs)
      else shortlist
    require(shortlistN >= topPairs,
      s"shortlist must be >= topPairs=$topPairs, got $shortlistN")
    val pairs = lshCandidatePairs(vectors, idCol, vecCol, dim, bitsPerTable,
      tables, seed, maxBucket, hardMaxBucket, knownCount)
    val sigs = signatureTable(vectors, idCol, vecCol, dim, seed)
    val hams = pairs
      .join(sigs.select(col("sid").as("ja"),
        col("sig1").as("a1"), col("sig2").as("a2")),
        unpackA(col("pair")) === col("ja"))
      .join(sigs.select(col("sid").as("jb"),
        col("sig1").as("b1"), col("sig2").as("b2")),
        unpackB(col("pair")) === col("jb"))
      .select(col("pair"),
        (bit_count(col("a1").bitwiseXOR(col("b1"))) +
          bit_count(col("a2").bitwiseXOR(col("b2")))).as("ham"))

    // cut-line stats over the full candidate Hamming stream
    val stats = hams.agg(
      count(lit(1)).as("n_candidates"),
      topkByScore(col("pair"),
        (lit(0) - col("ham")).cast("double"), shortlistN).as("__top"),
      percentile_approx(col("ham"), lit(0.5), lit(10000)).as("__med"))
      .select(
        col("n_candidates"),
        (-col("__top")(size(col("__top")) - 1).getField("score"))
          .cast("int").as("ham_shortlist"),
        col("__med").cast("int").as("ham_median"))

    // the report boundary: exact cosine of the topPairs-th best pair in
    // the shortlist (same deterministic plan as the operator's pass 2)
    val short = hams
      .agg(topkByScore(col("pair"),
        (lit(0) - col("ham")).cast("double"), shortlistN).as("top"))
      .select(explode(col("top")).as("r"))
      .select(col("r.id").as("pair"))
    val aHalf = vectors
      .join(broadcast(short.select(col("pair"),
        unpackA(col("pair")).as("ja"))), col(idCol) === col("ja"))
      .select(col("pair"), col(vecCol).as("vec_a"))
    val bHalf = vectors
      .join(broadcast(short.select(col("pair"),
        unpackB(col("pair")).as("jb"))), col(idCol) === col("jb"))
      .select(col("pair"), col(vecCol).as("vec_b"))
    val simTop = aHalf.join(bHalf, Seq("pair"))
      .select(col("pair"), cosineSim(col("vec_a"), col("vec_b")).as("sim"))
      .groupBy("pair").agg(max(col("sim")).as("sim"))
      .agg(topkByScore(col("pair"), col("sim"), topPairs).as("t"))
      .select(col("t")(least(lit(topPairs), size(col("t"))) - 1)
        .getField("score").as("sim_top"))

    stats.crossJoin(simTop)
      .withColumn("expected_ham_top",
        round(acos(least(lit(1.0), greatest(lit(-1.0), col("sim_top"))))
          * 128.0 / math.Pi).cast("int"))
      .withColumn("margin", col("ham_shortlist") - col("expected_ham_top"))
      .select(col("n_candidates"), col("ham_shortlist"), col("sim_top"),
        col("expected_ham_top"), col("margin"), col("ham_median"))
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
