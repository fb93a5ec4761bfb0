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
   */
  def pageRank(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int,
      dampingPct: Int = 85,
      reliableCheckpoint: Boolean = false): DataFrame = {
    require(iterations >= 1 && iterations <= 100,
      s"iterations must be in [1, 100], got $iterations")
    require(dampingPct >= 0 && dampingPct <= 100,
      s"dampingPct must be in [0, 100], got $dampingPct")
    require(edges.columns.contains(srcCol) && edges.columns.contains(dstCol),
      s"edges must contain '$srcCol' and '$dstCol', got ${edges.columns.mkString(", ")}")
    if (reliableCheckpoint)
      require(edges.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "reliableCheckpoint = true needs spark.sparkContext.setCheckpointDir(...) first")

    val e = edges
      .select(col(srcCol).cast("string").as("src"), col(dstCol).cast("string").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    val edgesDeg = e.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)

    val baseE6 = (100L - dampingPct) * ScaleE6
    var ranks = nodes.select(col("node"), lit(ScaleE6).as("rank_e6"))
    for (_ <- 1 to iterations) {
      val contribs = edgesDeg.join(ranks, col("src") === col("node"))
        .select(col("dst").as("node"),
          expr("rank_e6 div out_deg").as("contrib"))
      val sums = contribs.groupBy(col("node")).agg(sum(col("contrib")).as("in_sum"))
      val next = nodes.join(sums, Seq("node"), "left")
        .select(col("node"),
          expr(s"(${baseE6}L + $dampingPct * coalesce(in_sum, 0L)) div 100")
            .as("rank_e6"))
      // materialize the bounded (node-sized) rank table each step so the
      // K-iteration loop never grows a K-deep lineage
      ranks = if (reliableCheckpoint) next.checkpoint() else next.localCheckpoint()
    }
    // The returned ranks are checkpointed — lineage no longer reaches the
    // cached tables. Without this, every pageRank call in a long-lived
    // session leaks two cached tables until LRU pressure evicts them.
    nodes.unpersist(blocking = false)
    edgesDeg.unpersist(blocking = false)
    ranks
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
    (s"$header,\n$iters", s"${p}r$iterations")
  }
}
