package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Link-graph analysis: PageRank over the domain (or URL) graph that
 * [[graft.expressions.HtmlLinks]] + [[Urls]] extract from a crawl — the
 * classic quality prior for web-scale curation (rank a domain by who
 * links to it, then gate or weight documents by their domain's rank).
 *
 * The rank loop follows this repo's iterative-numeric doctrine
 * ([[Classifier]] is the worked example): EXACT integer fixed point —
 * ranks are `rank_e6` longs, every step uses integer `div` on
 * non-negative operands (trunc == floor, identical in Spark and DuckDB
 * at ANY magnitude — no transcendentals, no 2^53 window to guard), so a
 * K-iteration run is bit-identical cross-engine and the oracle replays
 * TRAINING-style as K unrolled CTE stages ([[pageRankCtes]]).
 *
 * Pinned semantics (documented divergences from the textbook real-valued
 * formulation, chosen for exact replayability):
 *
 *  - parallel edges and self-loops are dropped (DISTINCT src->dst,
 *    src != dst); the node set is every endpoint of the cleaned edges;
 *  - `r0 = 1e6` per node; each iteration
 *    `r' = ((100-d)*1e6 + d * sum(r_u div deg_u)) div 100` with the
 *    damping `d` an integer PERCENT (85 = 0.85);
 *  - dangling nodes (no outlinks) contribute nothing — their mass
 *    decays toward the teleport floor instead of being redistributed
 *    (the redistribution variant needs a global scalar per iteration;
 *    this one keeps every step a local join + keyed aggregation);
 *  - truncation in `div` loses at most deg-1 sub-units per node per
 *    step: ranks are conservative to within 1e-6 — noise far below any
 *    curation decision made on them.
 *
 * Scale shape: the rank table is node-sized (domains, not pages — orders
 * of magnitude smaller than the corpus) and each iteration is ONE join
 * of the degree-annotated edge list with the ranks (both hash-partitioned
 * on the join key) plus one keyed aggregation — the standard distributed
 * PageRank plan. Per-iteration `localCheckpoint` keeps the loop's lineage
 * flat (pass `reliableCheckpoint = true` for executor-loss recovery on
 * long runs, same trade as [[Classifier.train]]).
 */
object Graph {

  val ScaleE6: Long = 1000000L

  /**
   * Exact integer PageRank. `edges` is any DataFrame with the two named
   * columns (cast to string); returns `(node, rank_e6)`.
   *
   * `weightCol` makes it WEIGHTED: parallel edges aggregate by weight sum
   * (longs; non-positive totals dropped) and a source's rank splits
   * proportionally — `contrib = (rank * w) div W_src` instead of
   * `rank div deg`. Unweighted is exactly the weight-1 special case, so
   * the two modes share one loop and one set of pinned semantics.
   *
   * `personalization` (a two-column (node, prior) DataFrame, positive
   * longs, arbitrary relative scale) makes it PERSONALIZED: the teleport
   * mass lands per node proportionally to its prior instead of uniformly
   * — `share_e6 = (prior * N * 1e6) div sumPrior` (uniform prior yields
   * exactly 1e6 per node, the unpersonalized spelling), `r0 = share_e6`,
   * and each step is `((100-d) * share_e6 + d * in_sum) div 100`. Nodes
   * missing from the prior get zero teleport mass (reachable only through
   * links — the "random surfer restarts at my seed set" curation prior).
   * `prior * N * 1e6` must fit a signed 64-bit: priors are relative, keep
   * them small.
   */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      dampingPct: Int = 85,
      reliableCheckpoint: Boolean = false,
      weightCol: Option[String] = None,
      personalization: Option[DataFrame] = None): DataFrame =
    runPageRank(edges, srcCol, dstCol, iterations, dampingPct,
      reliableCheckpoint, weightCol, personalization, tolE6 = None)._1

  /**
   * [[pageRank]] with an L1-delta convergence stop: after each iteration
   * the total absolute rank movement `sum(|r_k - r_(k-1)|)` (e6 units,
   * exact integers) is compared against `tolE6`; the loop stops at the
   * first iteration at or under the tolerance, or at `maxIterations`.
   * Returns (ranks, iterationsRun). The check is one extra node-sized
   * aggregation per iteration — the price of not running a fixed K past
   * convergence; with damping d the delta contracts geometrically
   * (~d per step), so tolE6 ≈ nodes/20 stops within a few dozen steps.
   * Because the stop rule is a pure function of the same integer ranks
   * both engines compute, the oracle replays it data-driven
   * ([[pageRankFlexCtes]] with `tolE6`) and lands on the identical K.
   */
  def pageRankConverged(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIterations: Int,
      tolE6: Long,
      dampingPct: Int = 85,
      reliableCheckpoint: Boolean = false,
      weightCol: Option[String] = None,
      personalization: Option[DataFrame] = None): (DataFrame, Int) = {
    require(tolE6 >= 0, s"tolE6 must be non-negative, got $tolE6")
    runPageRank(edges, srcCol, dstCol, maxIterations, dampingPct,
      reliableCheckpoint, weightCol, personalization, Some(tolE6))
  }

  private def runPageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      dampingPct: Int,
      reliableCheckpoint: Boolean,
      weightCol: Option[String],
      personalization: Option[DataFrame],
      tolE6: Option[Long]): (DataFrame, Int) = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations must be in [1, 100], got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0, 100], got $dampingPct")
    require(edges.columns.contains(srcCol) && edges.columns.contains(dstCol),
      s"edges must contain '$srcCol' and '$dstCol', got ${edges.columns.mkString(", ")}")
    weightCol.foreach(c => require(edges.columns.contains(c),
      s"edges must contain weight column '$c'"))
    if (reliableCheckpoint)
      require(edges.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "reliableCheckpoint = true needs spark.sparkContext.setCheckpointDir(...) first")

    val base = edges
      .select(col(srcCol).cast("string").as("src"),
        col(dstCol).cast("string").as("dst"),
        weightCol.map(c => col(c).cast("long")).getOrElse(lit(1L)).as("w"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
    // unweighted: DISTINCT pairs at weight 1 (parallel edges collapse);
    // weighted: parallel edges aggregate by weight sum, non-positive drop
    val e = weightCol match {
      case None => base.select(col("src"), col("dst")).distinct()
        .withColumn("w", lit(1L))
      case Some(_) => base.groupBy(col("src"), col("dst"))
        .agg(sum(col("w")).as("w")).filter(col("w") > 0)
    }
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val wOut = e.groupBy(col("src")).agg(sum(col("w")).as("w_out"))
    val edgesW = e.join(wOut, "src").persist(StorageLevel.MEMORY_AND_DISK)

    // per-node teleport share (e6): uniform 1e6, or prior-proportional
    val share = (personalization match {
      case None => nodes.select(col("node"), lit(ScaleE6).as("share_e6"))
      case Some(p) =>
        require(p.columns.length == 2,
          s"personalization must be a two-column (node, prior) DataFrame, got ${p.columns.mkString(", ")}")
        val pri = p.select(col(p.columns(0)).cast("string").as("node"),
          col(p.columns(1)).cast("long").as("__prior"))
        val joined = nodes.join(pri, Seq("node"), "left")
          .select(col("node"), coalesce(col("__prior"), lit(0L)).as("__prior"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        val tot = joined.agg(sum(col("__prior"))).head.getLong(0)
        require(tot > 0, "personalization priors must sum to a positive value over graph nodes")
        val n = nodes.count()
        val out = joined.select(col("node"),
          expr(s"(__prior * ${n}L * $ScaleE6) div ${tot}L").as("share_e6"))
          .localCheckpoint()
        joined.unpersist(blocking = false)
        out
    }).persist(StorageLevel.MEMORY_AND_DISK)

    val dp = dampingPct
    var ranks = share.select(col("node"), col("share_e6").as("rank_e6"))
    var ran = 0
    var stop = false
    while (ran < iterations && !stop) {
      val contribs = edgesW.join(ranks, col("src") === col("node"))
        .select(col("dst").as("node"),
          expr("(rank_e6 * w) div w_out").as("contrib"))
      val sums = contribs.groupBy(col("node")).agg(sum(col("contrib")).as("in_sum"))
      val next0 = share.join(sums, Seq("node"), "left")
        .select(col("node"),
          expr(s"((${100 - dp}) * share_e6 + $dp * coalesce(in_sum, 0L)) div 100")
            .as("rank_e6"))
      // materialize the bounded (node-sized) rank table each step so the
      // K-iteration loop never grows a K-deep lineage
      val next = if (reliableCheckpoint) next0.checkpoint() else next0.localCheckpoint()
      tolE6.foreach { tol =>
        val row = next.withColumnRenamed("rank_e6", "__next")
          .join(ranks, "node")
          .agg(sum(abs(col("__next") - col("rank_e6")))).head
        val delta = if (row.isNullAt(0)) 0L else row.getLong(0)
        if (delta <= tol) stop = true
      }
      ranks = next
      ran += 1
    }
    // The returned ranks are checkpointed — lineage no longer reaches the
    // cached tables. Without this, every pageRank call in a long-lived
    // session leaks cached tables until LRU pressure evicts them.
    nodes.unpersist(blocking = false)
    edgesW.unpersist(blocking = false)
    share.unpersist(blocking = false)
    (ranks, ran)
  }

  /**
   * The engine-neutral replay as CTE stages over an arbitrary relation
   * `src` carrying raw `src`/`dst` columns — edge cleanup, node set,
   * degrees, and the K unrolled iterations, mirroring [[pageRank]] step
   * for step (DuckDB `//` on non-negative BIGINTs == Spark `div`).
   * Returns (ctesString, finalCteName); the final CTE yields
   * `(node, rank_e6)`. `prefix` namespaces every CTE name.
   */
  def pageRankCtes(
      src: String,
      iterations: Int,
      dampingPct: Int = 85,
      prefix: String = "p"): (String, String) = {
    require(iterations >= 1 && iterations <= 100)
    require(dampingPct >= 0 && dampingPct <= 100)
    OracleSql.requireNoCteHead(src, "src")
    val p = prefix
    val baseE6 = (100L - dampingPct) * ScaleE6
    val header =
      s"""${p}e AS (SELECT DISTINCT src, dst FROM $src
         |       WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
         |${p}n AS (SELECT src AS node FROM ${p}e UNION SELECT dst FROM ${p}e),
         |${p}d AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS out_deg FROM ${p}e GROUP BY 1),
         |${p}ed AS (SELECT e.src, e.dst, d.out_deg FROM ${p}e e JOIN ${p}d d USING (src)),
         |${p}r0 AS (SELECT node, CAST($ScaleE6 AS BIGINT) AS rank_e6 FROM ${p}n)""".stripMargin
    val iters = (1 to iterations).map { k =>
      s"""${p}c$k AS (SELECT e.dst AS node,
         |        CAST(SUM(r.rank_e6 // e.out_deg) AS BIGINT) AS in_sum
         |        FROM ${p}ed e JOIN ${p}r${k - 1} r ON e.src = r.node GROUP BY 1),
         |${p}r$k AS (SELECT n.node,
         |        CAST(($baseE6 + $dampingPct * COALESCE(c.in_sum, 0)) // 100 AS BIGINT) AS rank_e6
         |        FROM ${p}n n LEFT JOIN ${p}c$k c USING (node))""".stripMargin
    }.mkString(",\n")
    // MATERIALIZED pragma: see OracleSql.materializeCtes (each rank
    // stage is read by multiple downstream stages)
    (OracleSql.materializeCtes(s"$header,\n$iters"), s"${p}r$iterations")
  }

  /**
   * The engine-neutral replay of the FULL [[pageRank]]/[[pageRankConverged]]
   * surface — weighted edges, personalization, and the data-driven L1
   * convergence stop — as CTE stages mirroring [[runPageRank]] step for
   * step. `src` carries `src`/`dst` (+ `w` when `weighted`); `persSrc`, if
   * given, names a `(node, prior)` relation. With `tolE6` set, every stage
   * up to `maxIterations` is unrolled alongside its L1 delta, the stop
   * iteration is selected by the SAME first-at-or-under-tolerance rule the
   * Spark loop applies (so it adapts to the data like the engine does),
   * and the final CTE yields that iteration's `(node, rank_e6)`.
   */
  def pageRankFlexCtes(
      src: String,
      maxIterations: Int,
      dampingPct: Int = 85,
      prefix: String = "pf",
      weighted: Boolean = false,
      persSrc: Option[String] = None,
      tolE6: Option[Long] = None): (String, String) = {
    require(maxIterations >= 1 && maxIterations <= 100)
    require(dampingPct >= 0 && dampingPct <= 100)
    OracleSql.requireNoCteHead(src, "src")
    persSrc.foreach(OracleSql.requireNoCteHead(_, "persSrc"))
    val p = prefix
    val dp = dampingPct
    val eCte =
      if (weighted)
        s"""${p}e AS (SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w FROM $src
           |       WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst
           |       GROUP BY 1, 2 HAVING SUM(w) > 0)""".stripMargin
      else
        s"""${p}e AS (SELECT src, dst, CAST(1 AS BIGINT) AS w
           |       FROM (SELECT DISTINCT src, dst FROM $src
           |             WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst))""".stripMargin
    val shareCte = persSrc match {
      case None =>
        s"${p}pp AS (SELECT node, CAST($ScaleE6 AS BIGINT) AS share_e6 FROM ${p}n)"
      case Some(ps) =>
        s"""${p}pj AS (SELECT n.node, CAST(COALESCE(pr.prior, 0) AS BIGINT) AS prior
           |       FROM ${p}n n LEFT JOIN $ps pr USING (node)),
           |${p}pp AS (SELECT node,
           |       CAST((prior * (SELECT COUNT(*) FROM ${p}n) * $ScaleE6)
           |            // (SELECT SUM(prior) FROM ${p}pj) AS BIGINT) AS share_e6
           |       FROM ${p}pj)""".stripMargin
    }
    val header =
      s"""$eCte,
         |${p}n AS (SELECT src AS node FROM ${p}e UNION SELECT dst FROM ${p}e),
         |${p}d AS (SELECT src, CAST(SUM(w) AS BIGINT) AS w_out FROM ${p}e GROUP BY 1),
         |${p}ed AS (SELECT e.src, e.dst, e.w, d.w_out FROM ${p}e e JOIN ${p}d d USING (src)),
         |$shareCte,
         |${p}r0 AS (SELECT node, share_e6 AS rank_e6 FROM ${p}pp)""".stripMargin
    val iters = (1 to maxIterations).map { k =>
      val stage =
        s"""${p}c$k AS (SELECT e.dst AS node,
           |        CAST(SUM((r.rank_e6 * e.w) // e.w_out) AS BIGINT) AS in_sum
           |        FROM ${p}ed e JOIN ${p}r${k - 1} r ON e.src = r.node GROUP BY 1),
           |${p}r$k AS (SELECT n.node,
           |        CAST((${100 - dp} * n.share_e6 + $dp * COALESCE(c.in_sum, 0)) // 100 AS BIGINT) AS rank_e6
           |        FROM ${p}pp n LEFT JOIN ${p}c$k c USING (node))""".stripMargin
      tolE6 match {
        case None => stage
        case Some(_) =>
          stage + s""",
             |${p}dl$k AS (SELECT $k AS k,
             |        CAST(COALESCE(SUM(ABS(a.rank_e6 - b.rank_e6)), 0) AS BIGINT) AS d
             |        FROM ${p}r$k a JOIN ${p}r${k - 1} b USING (node))""".stripMargin
      }
    }.mkString(",\n")
    tolE6 match {
      case None =>
        (OracleSql.materializeCtes(s"$header,\n$iters"),
          s"${p}r$maxIterations")
      case Some(tol) =>
        val tail =
          s"""${p}dls AS (${(1 to maxIterations)
            .map(k => s"SELECT k, d FROM ${p}dl$k").mkString(" UNION ALL ")}),
             |${p}ks AS (SELECT CAST(COALESCE(MIN(CASE WHEN d <= $tol THEN k END),
             |        $maxIterations) AS BIGINT) AS ks FROM ${p}dls),
             |${p}all AS (${(1 to maxIterations)
            .map(k => s"SELECT $k AS k, node, rank_e6 FROM ${p}r$k").mkString(" UNION ALL ")}),
             |${p}fin AS (SELECT node, rank_e6 FROM ${p}all
             |        WHERE k = (SELECT ks FROM ${p}ks))""".stripMargin
        (OracleSql.materializeCtes(s"$header,\n$iters,\n$tail"),
          s"${p}fin")
    }
  }
}
