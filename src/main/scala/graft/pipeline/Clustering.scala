package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Corpus-level duplicate clustering: turns a near-duplicate PAIR list (the
 * output of [[Dedup.jaccardPairs]] / [[Dedup.minhashLshPairs]] /
 * [[graft.pipeline.Similarity.lshNearDupPairs]]) into duplicate CLUSTERS, so
 * a pipeline can keep one canonical document per connected component instead
 * of reasoning about raw pairs (pairs alone under-delete: a~b, b~c with a!~c
 * still means only one of {a,b,c} should survive).
 *
 * Algorithm: alternating large-star / small-star connected components — the
 * standard MapReduce/Spark formulation (Kiveris et al., "Connected
 * Components in MapReduce and Beyond", SoCC'14). Each round is two
 * groupBy+join passes over the edge list; convergence is O(log^2 n) rounds
 * on adversarial graphs (long chains) and 1-2 rounds on real dup clusters
 * (dense, tiny diameter). No step ever materializes a neighborhood as an
 * in-memory array — per-node minima come from `groupBy.min`, so a hub node
 * with millions of neighbors is just a big aggregation group, handled by
 * ordinary map-side partial aggregation.
 *
 * Scale notes (100 TB): state is only the current edge list, shuffled by
 * node id; every pass is equi-join + hash aggregate, no cartesian anywhere.
 * `localCheckpoint` truncates the loop-carried lineage each round (plan
 * growth, not data growth, is the usual killer of iterative DataFrame
 * algorithms); on a real cluster with reliable storage pass
 * `reliableCheckpoint = true` (the [[Graph.pageRank]] knob) to also
 * survive executor loss. The driver-side loop holds two longs per round
 * (edge-set fingerprint), never row data.
 */
object Clustering {

  /**
   * Connected components over an undirected pair list. Returns one row per
   * node that appears in `pairs`: (doc_id, cluster_id) where cluster_id is
   * the component's minimum id under the id column's natural ordering —
   * deterministic, independent of partition layout and iteration order.
   * Works for any orderable id type (long, string/UUID, ...); both pair
   * columns must share one type.
   *
   * @param maxIter hard bound on large-star/small-star rounds (log^2 of the
   *                longest chain; 25 covers graphs far beyond 2^32 nodes)
   * @param reliableCheckpoint per-round lineage truncation through the
   *                session's reliable checkpoint dir instead of
   *                `localCheckpoint` — the [[Graph.pageRank]] knob
   *                mirrored (the r19 nit): `localCheckpoint` blocks live
   *                in executor storage, so on a real cluster an executor
   *                loss mid-loop kills the job (the truncated lineage
   *                cannot recompute them); the reliable path survives it
   *                at the cost of a dir write per round. Requires
   *                `spark.sparkContext.setCheckpointDir(...)` first.
   */
  def connectedComponents(
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      maxIter: Int = 25,
      reliableCheckpoint: Boolean = false): DataFrame = {
    val (ta, tb) = (pairs.schema(aCol).dataType, pairs.schema(bCol).dataType)
    require(ta == tb,
      s"pair columns must share one id type, got $aCol: $ta vs $bCol: $tb")
    if (reliableCheckpoint)
      require(pairs.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "reliableCheckpoint = true needs spark.sparkContext.setCheckpointDir(...) first")
    // lazy either way: the fingerprint action right after each truncation
    // is what materializes it
    def truncate(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(false) else df.localCheckpoint(false)

    // Canonical edge list, oriented u > v, self-loops and dups dropped.
    var edges = truncate(pairs
      .select(col(aCol).as("x"), col(bCol).as("y"))
      .filter(col("x") =!= col("y"))
      .select(greatest(col("x"), col("y")).as("u"), least(col("x"), col("y")).as("v"))
      .distinct())

    // Order-independent edge-set fingerprint: (count, two independent
    // bounded hash sums). Summands are capped at 2^30 so the sum cannot
    // overflow a long (ANSI mode) below ~8e9 edges; two hash orders make a
    // cross-round collision astronomically unlikely. Equal fingerprints
    // across rounds = converged.
    def fingerprint(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(
        count(lit(1)).as("c"),
        coalesce(sum(pmod(xxhash64(col("u"), col("v")), lit(1L << 30))), lit(0L)).as("h1"),
        coalesce(sum(pmod(xxhash64(col("v"), col("u")), lit(1L << 30))), lit(0L)).as("h2"))
        .head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }

    var fp = fingerprint(edges)
    var done = fp._1 == 0L
    var it = 0
    while (!done && it < maxIter) {
      // Large-star: every node connects its LARGER neighbors to the minimum
      // of its closed neighborhood. Emitted edges keep the u > v invariant
      // (v > u >= m), so the next pass needs no re-orientation.
      val sym = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val m1 = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      val large = sym.join(m1, "u")
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .where(col("u") =!= col("v"))
        .distinct()

      // Small-star: every node rewires its SMALLER neighbors (and itself)
      // to their minimum. Again emits u > v by construction.
      val m2 = large.groupBy("u").agg(min("v").as("m"))
      val next = truncate(large.join(m2, "u")
        .where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(m2.select(col("u"), col("m").as("v")))
        .where(col("u") =!= col("v"))
        .distinct())

      val nfp = fingerprint(next)
      // fingerprint(next) materialized next's checkpoint, so the previous
      // round's blocks are dead weight — free them, or executor storage
      // grows linearly with rounds for the life of the job
      org.apache.spark.sql.graftshim.GraftShim.unpersistCheckpoint(edges)
      done = nfp == fp
      edges = next
      fp = nfp
      it += 1
    }
    // Unconverged labels are silently WRONG (a chain's tail still points at
    // an intermediate node) — fail loudly instead. 25 rounds covers graphs
    // far beyond any real corpus; hitting this means something degenerate.
    if (!done) throw new IllegalStateException(
      s"connectedComponents did not converge within $maxIter rounds " +
        s"(${fp._1} edges live); raise maxIter")

    // Converged edge set is a union of stars (member -> component minimum).
    edges.select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .union(edges.select(col("v").as("doc_id"), col("v").as("cluster_id")).distinct())
      .distinct()
  }

  /**
   * Incremental connected components: fold a batch of NEW near-dup pairs
   * into an existing labeling without re-clustering the whole corpus — the
   * daily-ingest path (a real pipeline adds documents continuously; full
   * re-clustering is a corpus-sized job, this is a new-edges-sized one).
   *
   * `labels` is a previous [[connectedComponents]] (or incrementalUpdate)
   * output: (doc_id, cluster_id), cluster_id = component minimum. The
   * result is exactly `connectedComponents(oldPairs ++ newPairs)` restated
   * over `labels ++ nodes(newPairs)` — verified by CurationSpec against
   * the batch run on a random edge split.
   *
   * How it stays new-edges-sized: each new edge's endpoints are CONTRACTED
   * to their current representative (their cluster_id; themselves if
   * unseen). Edges internal to one existing cluster vanish; what's left is
   * a graph over representatives whose size is bounded by the NEW pair
   * list, never the corpus. [[connectedComponents]] runs on that contracted
   * graph, producing rep -> merged-cluster-min; relabeling is then one
   * broadcast-sized join per side (the rep map is small by the same bound):
   *  - old rows: cluster_id rewrites through the rep map (hits only
   *    touched components, everything else passes through);
   *  - new nodes: their rep's merged label, or their own id when their
   *    only edges were to themselves.
   * Because every existing cluster_id is a real doc id (the component
   * minimum), contracting to cluster ids both preserves connectivity and
   * keeps the "label = min id" invariant through the merge.
   *
   * Scale shape: one shuffle of newPairs for each endpoint lookup against
   * `labels` (equi-join on doc id — AQE broadcasts `newPairs`' side when
   * small), the iterative CC on the contracted graph, then broadcast
   * relabel joins. The corpus-sized `labels` table is scanned once and
   * never shuffled.
   */
  def incrementalUpdate(
      labels: DataFrame,
      newPairs: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val (repMap, labeledNew) = contractAndMerge(labels, newPairs, aCol, bCol)

    // old rows rewrite through the rep map (untouched components pass through)
    val updatedOld = labels
      .join(repMap, labels("cluster_id") === col("__rep"), "left")
      .select(labels("doc_id"),
        coalesce(col("__merged"), labels("cluster_id")).as("cluster_id"))

    updatedOld.union(labeledNew)
  }

  /**
   * The CHANGED-rows view of [[incrementalUpdate]]: only rows whose label
   * differs from (or is absent in) `labels` — relabeled members of merged
   * components plus brand-new nodes. `incrementalUpdate(labels, p) ==
   * (labels minus delta's doc_ids) union delta` (CurationSpec). This is
   * what an incremental COMMIT wants to write: its size is bounded by the
   * members of touched components, never the corpus.
   */
  def incrementalUpdateDelta(
      labels: DataFrame,
      newPairs: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val (repMap, labeledNew) = contractAndMerge(labels, newPairs, aCol, bCol)

    // a component relabels only when its minimum changed (merged != rep);
    // the labels scan stays shuffle-free — the rep map is tiny, AQE
    // broadcasts it into this join
    val changedOld = labels
      .join(repMap.filter(col("__merged") =!= col("__rep")),
        labels("cluster_id") === col("__rep"))
      .select(labels("doc_id"), col("__merged").as("cluster_id"))

    changedOld.union(labeledNew)
  }

  /** Shared incremental core: contract new edges through the current
    * labeling, run CC on the contracted (new-edges-sized) graph. Returns
    * (repMap: __rep -> __merged component minimum, labeledNew: labels for
    * nodes absent from `labels`). */
  private def contractAndMerge(
      labels: DataFrame,
      newPairs: DataFrame,
      aCol: String,
      bCol: String): (DataFrame, DataFrame) = {
    val reps = labels.select(col("doc_id").as("__n"), col("cluster_id").as("__r"))

    // self-pairs dropped up front, mirroring connectedComponents — a node
    // appearing ONLY in self-pairs gets no label there either
    val cleanPairs = newPairs.filter(col(aCol) =!= col(bCol))

    val withReps = cleanPairs
      .select(col(aCol).as("__a"), col(bCol).as("__b"))
      .join(reps.select(col("__n").as("__a"), col("__r").as("__ra")), Seq("__a"), "left")
      .join(reps.select(col("__n").as("__b"), col("__r").as("__rb")), Seq("__b"), "left")
      .select(
        coalesce(col("__ra"), col("__a")).as("__u"),
        coalesce(col("__rb"), col("__b")).as("__v"))
      .filter(col("__u") =!= col("__v"))

    // CC over the contracted (representative) graph: rep -> merged minimum
    val repMap = connectedComponents(withReps, "__u", "__v")
      .select(col("doc_id").as("__rep"), col("cluster_id").as("__merged"))

    // brand-new nodes: rep == themselves (no labels row). Their merged
    // label comes from the rep map; a new node whose every contracted edge
    // collapsed (paired only with one existing cluster... impossible: that
    // edge survives contraction) always appears in repMap — but a defensive
    // coalesce keeps isolated ids self-labeled rather than dropped.
    val newNodes = cleanPairs.select(col(aCol).as("doc_id"))
      .union(cleanPairs.select(col(bCol).as("doc_id")))
      .distinct()
      .join(labels.select(col("doc_id")), Seq("doc_id"), "left_anti")
    val labeledNew = newNodes
      .join(repMap, newNodes("doc_id") === col("__rep"), "left")
      .select(newNodes("doc_id"),
        coalesce(col("__merged"), newNodes("doc_id")).as("cluster_id"))

    (repMap, labeledNew)
  }

  /**
   * The keep-list composition most pipelines actually want: drop every
   * document that belongs to a near-dup cluster but is not its canonical
   * (minimum-id) member. Docs not mentioned in `pairs` pass through.
   *
   * Scale shape: the drop list is one row per non-canonical cluster member
   * — tiny relative to the corpus — so the left-anti join broadcasts.
   */
  def canonicalize(
      docs: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val drop = connectedComponents(pairs, aCol, bCol)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as("__graft_drop_id"))
    docs.join(drop, docs(idCol) === col("__graft_drop_id"), "left_anti")
  }

  /**
   * Quality-aware keeper flags: for every CLUSTERED document, its
   * cluster label, score, and whether it is the cluster's best member —
   * highest `scoreCol`, ties to the smallest id, so the choice is total
   * and deterministic. This is the selection pipelines actually want
   * from near-dup clusters: [[canonicalize]]'s min-id keeper throws away
   * a long original in favor of a truncated copy whenever the copy got
   * the smaller id; keeping the best-scoring member (longest, highest
   * quality score, newest snapshot...) preserves the most valuable
   * representative.
   *
   * Scale shape: one keyed join of the (duplication-sized) label table
   * against the docs' score projection, then ONE hash-partitioned window
   * per cluster — partitions are cluster-sized, never corpus-sized, and
   * there is no global sort.
   */
  def clusterKeepers(
      docs: DataFrame,
      idCol: String,
      scoreCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    // reserved-output guard (keepLatest/dedupLines convention): a scoreCol
    // named like an output column would alias back over it and emit a
    // duplicate/shadowed column instead of a clear error
    for (c <- Seq("doc_id", "cluster_id", "kept"))
      require(scoreCol != c,
        s"scoreCol '$scoreCol' collides with output column '$c'; rename it — " +
          s"clusterKeepers emits (doc_id, cluster_id, <scoreCol>, kept)")
    val labels = connectedComponents(pairs, aCol, bCol)
    val scored = labels.join(
      docs.select(col(idCol).as("doc_id"), col(scoreCol).as("__score")),
      Seq("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("__score").desc, col("doc_id"))
    scored
      .withColumn("kept", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster_id"),
        col("__score").as(scoreCol), col("kept"))
  }

  /** The keep-list composition over [[clusterKeepers]]: drop every
    * clustered document that is not its cluster's best-scoring member;
    * docs not mentioned in `pairs` pass through. The drop list is
    * duplication-sized, so the anti join broadcasts. */
  def canonicalizeBy(
      docs: DataFrame,
      idCol: String,
      scoreCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String): DataFrame = {
    val drop = clusterKeepers(docs, idCol, scoreCol, pairs, aCol, bCol)
      .filter(!col("kept"))
      .select(col("doc_id").as("__graft_drop_id"))
    docs.join(drop, docs(idCol) === col("__graft_drop_id"), "left_anti")
  }
}
