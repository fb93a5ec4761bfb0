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

  test("parameter guards") {
    val e = Seq("a" -> "b").toDF("src", "dst")
    intercept[IllegalArgumentException] { Graph.pageRank(e, "src", "dst", 0) }
    intercept[IllegalArgumentException] { Graph.pageRank(e, "src", "dst", 3, 101) }
    intercept[IllegalArgumentException] { Graph.pageRank(e, "nope", "dst", 3) }
    intercept[IllegalArgumentException] {
      Graph.pageRank(e, "src", "dst", 3, reliableCheckpoint = true)
    }
  }
}
