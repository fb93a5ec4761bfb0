package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * The replicated cross-engine fixture must actually have the properties
 * the anchor basket's validity rests on: exact c-fold row growth,
 * id-disjoint copies (no silent key collisions corrupting keyed aggs),
 * token-remapped document text (copies must not become cross-copy
 * exact/near dups, which would turn linear pair growth quadratic —
 * and the remap must be BIJECTIVE so each copy's internal dup
 * structure and token counts replicate the original's exactly), and
 * a recomputed n_chars (the remapped text invalidates the original).
 */
class BenchFixtureSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft_bfx").toString
    BenchFixture.materialize(spark, sf, dir, copies = 3)
    dir
  }

  test("every table grows exactly c-fold with id-disjoint copies") {
    for ((table, idCol) <- Seq(("events", "event_id"),
        ("documents", "doc_id"), ("orders", "o_orderkey"))) {
      val base = spark.read.parquet(s"$sf/$table.parquet")
      val scaled = spark.read.parquet(s"$out/$table.parquet")
      assert(scaled.count() === 3 * base.count(), table)
      // ids stay unique across copies — the strided blocks are disjoint
      assert(scaled.select(col(idCol)).distinct().count() ===
        3 * base.select(col(idCol)).distinct().count(), s"$table.$idCol")
    }
    // the keyed-growth axes are disjoint too (user/cust blocks)
    val ev = spark.read.parquet(s"$out/events.parquet")
    assert(ev.select($"user_id").distinct().count() === 3 *
      spark.read.parquet(s"$sf/events.parquet")
        .select($"user_id").distinct().count())
  }

  test("document copies are decorrelated, not duplicated") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    // no byte-identical text across the whole scaled corpus beyond what
    // the BASE corpus already contains per copy: an exact-dup group may
    // repeat within each copy, never across copies
    val baseMax = spark.read.parquet(s"$sf/documents.parquet")
      .groupBy($"text").count().agg(max($"count")).head.getLong(0)
    val scaledMax = docs.groupBy($"text").count()
      .agg(max($"count")).head.getLong(0)
    assert(scaledMax === baseMax,
      "a cross-copy exact dup would inflate the largest text group")
    assert(docs.filter($"n_chars" =!= length($"text").cast("long")).count() === 0,
      "n_chars must be recomputed over the remapped text")
    // the bijection invariant: token counts replicate exactly — the old
    // interleaved-marker scheme DOUBLED them, making every token-volume
    // slope part fixture artifact
    def toks(df: org.apache.spark.sql.DataFrame) = df
      .agg(sum(graft.pipeline.TextAnalysis.tokenCount($"text").cast("long")))
      .head.getLong(0)
    assert(toks(docs) ===
      3 * toks(spark.read.parquet(s"$sf/documents.parquet")))
  }

  test("a corpus with an in-band remap-suffix token is refused, not silently bent") {
    // the bijectivity claim's checked precondition (r16 verdict item 4 /
    // ADVICE): a source token ending in _g<i> collides with copy i's remap
    // image of its prefix — materialization must fail fast on such input
    val poisoned = Seq(
      (1L, "perfectly normal words"),
      (2L, "this token collides_g1 with copy one")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      BenchFixture.assertRemapSafe(poisoned, "text", "spec")
    }
    assert(e.getMessage.contains("_g<i>"))
    // mid-token digits or a non-terminal suffix are NOT collisions
    BenchFixture.assertRemapSafe(
      Seq((1L, "fine_g1x also x_g tok_g1suffix g1 _g")).toDF("doc_id", "text"),
      "text", "spec")
    // and the driver corpus passes — the fixture fact the assert pins
    BenchFixture.assertRemapSafe(
      spark.read.parquet(s"$sf/documents.parquet"), "text", "spec")
  }
}
