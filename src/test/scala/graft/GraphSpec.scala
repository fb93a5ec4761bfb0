package graft

import graft.pipeline.Graph
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  /** Independent reference: the same pinned integer semantics, computed
    * sequentially (distinct edges, self-loops dropped, floor div on
    * non-negative longs, dangling mass decays). */
  private def refPageRank(edges: Seq[(String, String)], iters: Int,
      d: Int = 85): Map[String, Long] = {
    val e = edges.filter(p => p._1 != p._2).distinct
    val nodes = e.flatMap(p => Seq(p._1, p._2)).distinct
    val deg = e.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = nodes.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for ((s, t) <- e) in(t) += r(s) / deg(s)
      r = nodes.map(n => n -> ((100L - d) * 1000000L + d * in(n)) / 100L).toMap
    }
    r
  }

  private def run(edges: Seq[(String, String)], iters: Int,
      d: Int = 85): Map[String, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters, d)
      .as[(String, Long)].collect().toMap

  test("matches the sequential reference on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val n = 8 + trial * 5
      val edges = Seq.fill(n * 4)(
        (s"n${rnd.nextInt(n)}", s"n${rnd.nextInt(n)}"))
      for (iters <- Seq(1, 3, 7)) {
        assert(run(edges, iters) === refPageRank(edges, iters),
          s"trial $trial iters $iters")
      }
    }
  }

  test("cycle graph is the uniform fixed point, exactly") {
    val cyc = Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a")
    val out = run(cyc, 10)
    assert(out.values.toSet === Set(1000000L),
      "out_deg == in_deg == 1 everywhere must preserve the uniform rank")
  }

  test("star graph: leaves decay to the teleport floor, hub accumulates") {
    val star = (1 to 6).map(i => s"leaf$i" -> "hub")
    val out = run(star, 5)
    // a leaf has no in-links: rank = (15 * 1e6) div 100 after one step
    assert((1 to 6).forall(i => out(s"leaf$i") === 150000L))
    // the hub is DANGLING (no outlinks): its mass decays between steps,
    // but it must still sit far above the teleport floor of its leaves
    assert(out("hub") > out("leaf1") * 3)
    assert(out === refPageRank(star, 5))
  }

  test("parallel edges and self-loops do not change the result") {
    val base = Seq("a" -> "b", "b" -> "c", "c" -> "a", "a" -> "c")
    val noisy = base ++ base ++ Seq("a" -> "a", "b" -> "b", "a" -> "b")
    assert(run(noisy, 4) === run(base, 4))
  }

  test("deterministic under repartitioning") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(60)((s"d${rnd.nextInt(12)}", s"d${rnd.nextInt(12)}"))
    val df = edges.toDF("src", "dst")
    val a = Graph.pageRank(df.repartition(13), "src", "dst", 4)
      .as[(String, Long)].collect().toMap
    val b = Graph.pageRank(df.coalesce(1), "src", "dst", 4)
      .as[(String, Long)].collect().toMap
    assert(a === b)
  }

  test("damping 100 and 0 edge cases") {
    val e = Seq("a" -> "b", "b" -> "a")
    // d = 0: pure teleport, every node pinned at 1e6 * 100/100... = 1e6
    assert(run(e, 3, d = 0).values.toSet === Set(1000000L))
    assert(run(e, 3, d = 100) === refPageRank(e, 3, 100))
  }

  test("no cached tables leak after pageRank returns") {
    // nodes/edgesDeg are persisted for the iteration loop and must be
    // released once the checkpointed ranks no longer need them — a
    // long-lived service calling pageRank repeatedly would otherwise
    // accumulate cached tables until LRU pressure. (localCheckpoint blocks
    // for the RETURNED ranks are expected and excluded: they live in the
    // RDD store, not the DataFrame cache manager asserted here.)
    spark.sharedState.cacheManager.clearCache()
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "a").toDF("src", "dst")
    val out = Graph.pageRank(e, "src", "dst", 3)
    out.collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "pageRank must unpersist its loop-scoped tables")
  }

  /** The weighted/personalized sequential reference: per-pair weight sums,
    * proportional splits, prior-proportional teleport shares. */
  private def refWeighted(edges: Seq[(String, String, Long)], iters: Int,
      d: Int, prior: Option[Map[String, Long]]): Map[String, Long] = {
    val e = edges.filter(p => p._1 != p._2)
      .groupBy(p => (p._1, p._2)).view
      .mapValues(_.map(_._3).sum).filter(_._2 > 0).toMap
    val nodes = e.keys.flatMap(p => Seq(p._1, p._2)).toSeq.distinct
    val wOut = e.toSeq.groupBy(_._1._1).map { case (s, v) => s -> v.map(_._2).sum }
    val share: Map[String, Long] = prior match {
      case None => nodes.map(_ -> 1000000L).toMap
      case Some(pr) =>
        val joined = nodes.map(n => n -> pr.getOrElse(n, 0L)).toMap
        val tot = joined.values.sum
        joined.map { case (n, p) => n -> (p * nodes.size * 1000000L) / tot }
    }
    var r = share
    for (_ <- 1 to iters) {
      val in = scala.collection.mutable.Map.empty[String, Long].withDefaultValue(0L)
      for (((s, t), w) <- e) in(t) += (r(s) * w) / wOut(s)
      r = nodes.map(n => n -> ((100L - d) * share(n) + d * in(n)) / 100L).toMap
    }
    r
  }

  test("weighted: proportional splits match the sequential reference; weight-1 equals unweighted") {
    val edges = Seq(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 2L),
      ("c", "a", 5L), ("a", "b", 2L), ("b", "a", 1L)) // parallel a->b sums to 5
    val df = edges.toDF("src", "dst", "w")
    for (iters <- Seq(1, 4)) {
      val got = Graph.pageRank(df, "src", "dst", iters, weightCol = Some("w"))
        .as[(String, Long)].collect().toMap
      assert(got === refWeighted(edges, iters, 85, None), s"iters $iters")
    }
    // all-equal weights reduce to the unweighted result exactly
    val eq = edges.map(e => (e._1, e._2, 7L)).distinct
    val w1 = Graph.pageRank(eq.toDF("src", "dst", "w"), "src", "dst", 4,
      weightCol = Some("w")).as[(String, Long)].collect().toMap
    assert(w1 === run(eq.map(e => (e._1, e._2)), 4))
  }

  test("personalization: teleport mass follows the prior; missing nodes get zero restart") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d", "d" -> "a")
    val prior = Map("a" -> 3L, "d" -> 1L)
    val got = Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", 5,
      personalization = Some(prior.toSeq.toDF("node", "prior")))
      .as[(String, Long)].collect().toMap
    val ref = refWeighted(edges.map(e => (e._1, e._2, 1L)), 5, 85, Some(prior))
    assert(got === ref)
    // zero-prior nodes have no restart term: their rank is purely the
    // damped in-flow (the reference replays that exactly, asserted above);
    // the seeded share itself is pinned: prior 3 of total 4 over the
    // 4-node graph {a,b,c,d} -> (3 * 4 * 1e6) div 4
    assert(refWeighted(edges.map(e => (e._1, e._2, 1L)), 0, 85, Some(prior))("a")
      === 3L * 4L * 1000000L / 4L)
  }

  test("convergence stop: stopped-K result equals the fixed-K replay at that K") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(80)((s"n${rnd.nextInt(14)}", s"n${rnd.nextInt(14)}"))
    val df = edges.toDF("src", "dst")
    val (ranks, k) = Graph.pageRankConverged(
      df, "src", "dst", maxIterations = 60, tolE6 = 20000L, dampingPct = 50)
    assert(k >= 1 && k < 60, s"50% damping must converge early, ran $k")
    val replay = Graph.pageRank(df, "src", "dst", iterations = k, dampingPct = 50)
      .as[(String, Long)].collect().toMap
    assert(ranks.as[(String, Long)].collect().toMap === replay)
    // and the L1 delta at the stopped step really is at or under tolerance
    val prev = Graph.pageRank(df, "src", "dst", iterations = k - 1, dampingPct = 50)
      .as[(String, Long)].collect().toMap
    val delta = replay.map { case (n, r) => math.abs(r - prev(n)) }.sum
    assert(delta <= 20000L, s"delta $delta")
    // a tolerance nothing meets runs to the cap
    val (_, kAll) = Graph.pageRankConverged(
      df, "src", "dst", maxIterations = 3, tolE6 = 0L, dampingPct = 85)
    assert(kAll === 3)
  }

  test("no cached tables leak from the weighted/personalized/converged path") {
    spark.sharedState.cacheManager.clearCache()
    val e = Seq(("a", "b", 2L), ("b", "c", 1L), ("c", "a", 3L)).toDF("src", "dst", "w")
    val (out, _) = Graph.pageRankConverged(e, "src", "dst", 4, tolE6 = 100L,
      weightCol = Some("w"),
      personalization = Some(Seq(("a", 1L)).toDF("node", "prior")))
    out.collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "pageRankConverged must unpersist its loop-scoped tables")
  }

  test("parameter guards") {
    val e = Seq("a" -> "b").toDF("src", "dst")
    intercept[IllegalArgumentException] { Graph.pageRank(e, "src", "dst", 0) }
    intercept[IllegalArgumentException] { Graph.pageRank(e, "src", "dst", 3, 101) }
    intercept[IllegalArgumentException] { Graph.pageRank(e, "nope", "dst", 3) }
    intercept[IllegalArgumentException] {
      Graph.pageRank(e, "src", "dst", 3, reliableCheckpoint = true)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(e, "src", "dst", 3, weightCol = Some("nope"))
    }
    intercept[IllegalArgumentException] {
      Graph.pageRankConverged(e, "src", "dst", 3, tolE6 = -1L)
    }
    intercept[IllegalArgumentException] { // 3-column personalization
      Graph.pageRank(e, "src", "dst", 3,
        personalization = Some(Seq(("a", 1L, 2L)).toDF("n", "p", "x")))
    }
    intercept[IllegalArgumentException] { // zero prior mass over graph nodes
      Graph.pageRank(e, "src", "dst", 3,
        personalization = Some(Seq(("zz", 1L)).toDF("node", "prior")))
    }
  }
}
