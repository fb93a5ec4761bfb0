package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * SemDeDup-style semantic deduplication (Abbas et al. 2023,
 * arXiv:2303.09540): cluster the embedding space with a k-means coarse
 * quantizer, compare vectors pairwise ONLY within their cluster, and
 * keep one representative per connected group of near-duplicates. The
 * published recipe for pruning semantically redundant web data before
 * LLM training — near-identical paraphrases land in the same cell and
 * only one survives.
 *
 * Composition of existing tiers (nothing new to trust):
 *  - the coarse quantizer is [[IVF]]'s spherical k-means (train once on
 *    a bounded sample, persist with [[IVF.save]], broadcast inside the
 *    cell-assignment expression — no shuffle to assign);
 *  - within-cell pair generation is [[PairGen.allPairs]] keyed by cell:
 *    id-only pair space, oversize cells tiled across tasks with exact
 *    recall (a duplication flood is precisely when this matters);
 *  - vectors re-join the surviving pairs by id, exact cosine gates at
 *    `tau`, and [[Clustering.connectedComponents]] labels each
 *    near-duplicate group by its minimum id.
 *
 * Scale shape: one scan to assign cells, one shuffle by cell for pair
 * generation, two id-keyed joins to fetch vectors for candidate pairs
 * only, then the CC rounds (equi-join + hash agg each). The k knob
 * bounds per-cell pair work: at 100 TB you raise k so expected cell
 * size stays in the 10^4-10^5 range, exactly as the paper scales it.
 *
 * Like the paper's algorithm, duplicates are only found WITHIN a cell:
 * a near-dup pair split by the quantizer boundary is missed (raise k
 * less aggressively, or lower nprobe=1 assignment granularity, to trade
 * recall vs cost). Deterministic end to end: seeded deterministic
 * k-means, sorted buckets, exact cosine, min-id representatives.
 */
object SemDedup {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** `knownCount` sentinel for [[edges]] (and everything composed on
    * it): OPT OUT of the verify-join ladder entirely — no plan-build
    * count, no size estimate, NO hint ever; Spark's own stats ladder
    * decides under the recommended `preferSortMergeJoin=false`
    * deployment conf. This is the streaming maintainers' contract
    * ([[graft.streaming.TopnStreaming.semanticBatch]]): their scan set
    * is batch + touched-cell residents — bounded by construction — and
    * counting it would re-execute the whole union every micro-batch.
    * Before this sentinel they passed `knownCount = 0`, which relied on
    * [[VerifyJoin.sizeAwareBuild]] treating a zero estimate as
    * "never hint" — true only while the broadcast threshold was
    * positive (r19 ADVICE: with broadcast DISABLED, threshold < 0, any
    * Some(estimate) hinted). The opt-out is now explicit and
    * threshold-independent. */
  val LadderOptOut: Long = -2L

  /** Expected bytes through [[edges]]' within-cell verify stage:
    * candidate pairs (n · occupancy / 2 with occupancy n / k — the
    * expectation under balanced cells; real corpora run hotter on
    * skewed cells, the right order for an advisory) times the verify
    * row width (two 8-B ids + two fetched vectors). The SemDedup
    * sibling of [[Similarity.expectedVerifyBytes]], priced against the
    * same measured single-JVM boundary
    * ([[Similarity.SingleJvmSpillAdvisoryBytes]]). */
  private[graft] def expectedVerifyBytes(
      n: Long, k: Int, elemBytes: Long, dim: Long): Double = {
    val occupancy = n.toDouble / math.max(1, k)
    (n.toDouble * occupancy / 2.0) * (16.0 + 2.0 * (8.0 + elemBytes.toDouble * dim))
  }

  /**
   * Semantic near-duplicate labels: one row per input vector,
   * (doc_id, cell, cluster_id, keep) where `cluster_id` is the minimum
   * doc id of the doc's within-cell near-duplicate group (its own id if
   * it has no near-dups) and `keep` marks the representative.
   *
   * `tau` is the cosine threshold for "semantic duplicate" (the paper
   * sweeps 0.9-0.95 for web text). `tileSize` bounds per-task pair-matrix
   * blocks for oversize cells (exact recall at any cell size).
   */
  /**
   * The semantic-duplicate graph itself: within-cell pairs (id_a, id_b)
   * with exact cosine >= `tau`. This is the lazily-planned subgraph that
   * [[labels]] clusters — also the right input for incremental
   * maintenance ([[Clustering.incrementalUpdate]] /
   * [[graft.streaming.TopnStreaming.maintainClusters]]) when a daily
   * ingest only needs NEW edges, not a full relabel.
   *
   * Verify-join strategy (the [[Similarity.lshNearDupPairs]] ladder via
   * [[VerifyJoin]]): the within-cell candidate table's stats are
   * generator-underestimated, so the vector fetch joins decide their
   * build side from the corpus count × the exact per-row vector width
   * (8 B id + element width × dim, dim from the model's centroids) —
   * broadcast under the threshold, `shuffle_hash` provably over it,
   * never a sort of the candidate stream. Resolving the count runs one
   * column-pruned count() job at plan-build unless the caller passes
   * `knownCount` (the [[Similarity.AutoBits]] precedent) —
   * [[LadderOptOut]] skips both the count and the ladder, for callers
   * whose candidate volume is bounded by construction (the streaming
   * maintainers).
   *
   * Why there is NO audited-shortlist knob here (the
   * [[Similarity.AuditedShortlist]] exemption, documented rather than
   * wired): the two-pass signature shortlist is a TOP-K device — it
   * needs a bounded report to cut the candidate stream down to. This
   * operator's report is a THRESHOLD-gated edge SET (every pair at
   * cosine >= tau), which has no k: a signature pre-filter at the
   * tau-equivalent Hamming would drop ~half the true edges right at the
   * threshold (the signature is an unbiased but noisy angle estimate —
   * sigma ~5.66 bits on 128), and any safety margin wide enough to
   * preserve recall re-admits nearly the whole stream. The escape hatch
   * for candidate volume here is the QUANTIZER: candidates are
   * n·(n/k)/2 in expectation, so raising k (the paper's own scaling
   * knob) divides the verify stream — the plan-build advisory below
   * fires when the expected volume crosses the measured single-JVM
   * spill boundary and names that knob.
   */
  def edges(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      model: IVF.Model,
      tau: Double,
      tileSize: Int = 10000,
      knownCount: Long = -1L): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")
    val assigned = vectors.select(
      col(idCol).as("doc_id"),
      col(vecCol).as("vec"),
      element_at(IVF.cells(col(vecCol), model, 1), 1).as("cell"))

    val candidates = PairGen.allPairs(
      assigned.select(col("doc_id"), col("cell")),
      Seq(col("cell")), col("doc_id"), tileSize, "id_a", "id_b")

    val nOpt: Option[Long] =
      if (knownCount == LadderOptOut) None
      else Some(if (knownCount >= 0) knownCount else vectors.count())
    val elemBytes = vectors.schema(vecCol).dataType match {
      case org.apache.spark.sql.types.ArrayType(et, _) =>
        math.max(4L, et.defaultSize.toLong)
      case _ => 4L
    }
    val dim = model.centroids.headOption.map(_.length.toLong).getOrElse(64L)
    // candidate-volume advisory (plan-build): the Similarity doctrine at
    // this operator — when the expected within-cell verify stream
    // crosses the measured single-JVM boundary, say so and name the
    // operator's own escape (k), since the shortlist escape does not
    // apply to a threshold-gated edge set (see the contract above)
    nOpt.foreach { n =>
      val k = math.max(1, model.centroids.length)
      val est = expectedVerifyBytes(n, k, elemBytes, dim)
      if (est > Similarity.SingleJvmSpillAdvisoryBytes)
        log.warn(f"SemDedup.edges: expected within-cell candidate volume ~${est / (1L << 30)}%.0f GiB " +
          f"(n=$n over k=$k cells, ${elemBytes}B x $dim dims) is past the measured " +
          f"single-JVM spill regime (~${Similarity.SingleJvmSpillAdvisoryBytes / (1L << 30)} GiB). " +
          "Raise the quantizer's k so expected cell occupancy drops (candidates scale " +
          "with n^2/k; the paper's own scaling knob), or on one JVM set " +
          "SPARK_DRIVER_MEM >= 24g; on a cluster, size executor memory for " +
          "|vectors|/partitions hash builds.")
    }
    val vecBytes = nOpt.map(n => n * (8L + elemBytes * dim))
    def side(named: DataFrame): DataFrame =
      VerifyJoin.sizeAwareBuild(named, vecBytes)

    val va = side(assigned.select(col("doc_id").as("id_a"), col("vec").as("vec_a")))
    val vb = side(assigned.select(col("doc_id").as("id_b"), col("vec").as("vec_b")))
    candidates
      .join(va, Seq("id_a"))
      .join(vb, Seq("id_b"))
      .filter(Similarity.cosineSim(col("vec_a"), col("vec_b")) >= tau)
      .select(col("id_a"), col("id_b"))
  }

  def labels(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      model: IVF.Model,
      tau: Double,
      tileSize: Int = 10000,
      knownCount: Long = -1L): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")
    val assigned = vectors.select(
      col(idCol).as("doc_id"),
      element_at(IVF.cells(col(vecCol), model, 1), 1).as("cell"))

    val groups = Clustering.connectedComponents(
      edges(vectors, idCol, vecCol, model, tau, tileSize, knownCount),
      "id_a", "id_b")
      .withColumnRenamed("cluster_id", "__graft_cc_id")

    assigned
      .join(groups, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        col("cell"),
        coalesce(col("__graft_cc_id"), col("doc_id")).as("cluster_id"))
      .withColumn("keep", col("doc_id") === col("cluster_id"))
  }

  /** Keep-list composition: the input rows whose vector is its group's
    * representative under [[labels]] — the deduplicated corpus. */
  def deduplicate(
      vectors: DataFrame,
      idCol: String,
      vecCol: String,
      model: IVF.Model,
      tau: Double,
      tileSize: Int = 10000,
      knownCount: Long = -1L): DataFrame = {
    val drop = labels(vectors, idCol, vecCol, model, tau, tileSize, knownCount)
      .filter(!col("keep"))
      .select(col("doc_id").as("__graft_semdrop_id"))
    vectors.join(drop, vectors(idCol) === col("__graft_semdrop_id"), "left_anti")
  }

  /**
   * Cross-table semantic contamination: every (train_id, eval_id) pair
   * whose EXACT cosine is >= `tau` and whose cells collide — the
   * embedding-space sibling of [[Dedup.contamination]]'s n-gram test.
   * Eval-set decontamination is the pipeline stage this serves: a
   * benchmark answer paraphrased into the training corpus shares no
   * trigram but sits at cosine ~1 to the benchmark's embedding.
   *
   * Candidate generation probes the EVAL side: each eval vector explodes
   * into its `nprobe` nearest cells (recall knob across quantizer
   * boundaries), each train vector is assigned once to its home cell,
   * and the pair space is the cell equi-join. The eval side is the
   * benchmark — small by definition — so it is the side that is
   * replicated (`nprobe`×) and broadcast; the 100 TB train side is
   * scanned once, never shuffled (the broadcast hash join needs no
   * exchange on the probe side). A pair can meet in at most one cell
   * (train has ONE home cell), so no post-join dedup is needed.
   *
   * Exact cosine gates every candidate, so precision is 1 by
   * construction; recall is the standard IVF trade — a contaminated
   * pair is missed only when the train copy's home cell is outside the
   * eval vector's `nprobe` probe list (raise `nprobe` to tighten).
   * Deterministic end to end: seeded k-means, exact cosine.
   */
  def crossContamination(
      train: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      vecCol: String,
      model: IVF.Model,
      tau: Double,
      nprobe: Int = 2): DataFrame = {
    require(tau > 0 && tau <= 1, s"tau must be in (0, 1], got $tau")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val trainCells = train.select(
      col(idCol).as("train_id"),
      col(vecCol).as("train_vec"),
      element_at(IVF.cells(col(vecCol), model, 1), 1).as("cell"))
    val evalCells = evalSet.select(
      col(idCol).as("eval_id"),
      col(vecCol).as("eval_vec"),
      explode(IVF.cells(col(vecCol), model, nprobe)).as("cell"))
    trainCells
      .join(org.apache.spark.sql.functions.broadcast(evalCells), Seq("cell"))
      .filter(Similarity.cosineSim(col("train_vec"), col("eval_vec")) >= tau)
      .select(col("train_id"), col("eval_id"))
  }

  /** Removal composition of [[crossContamination]]: the train rows that
    * share NO probed-cell cosine >= `tau` neighbor with the eval set —
    * the decontaminated corpus ([[Dedup.removeContaminated]]'s semantic
    * sibling). Left-anti on the distinct contaminated train ids, so the
    * train table streams through un-shuffled. */
  def removeContaminatedSemantic(
      train: DataFrame,
      evalSet: DataFrame,
      idCol: String,
      vecCol: String,
      model: IVF.Model,
      tau: Double,
      nprobe: Int = 2): DataFrame = {
    val drop = crossContamination(train, evalSet, idCol, vecCol, model, tau, nprobe)
      .select(col("train_id").as("__graft_contam_id"))
      .distinct()
    train.join(drop, train(idCol) === col("__graft_contam_id"), "left_anti")
  }
}
