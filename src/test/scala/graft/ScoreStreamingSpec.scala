package graft

import graft.pipeline.Classifier
import graft.streaming.ScoreStreaming
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Streaming model serving: the committed prediction store must equal the
 * one-shot batch kernel (calibrated scoring under the frozen model) over
 * everything ingested, under any batch split; the frozen-model contract
 * is pinned (a different model refuses to resume or read); replay and
 * compaction follow the shared manifest protocol.
 */
class ScoreStreamingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  private lazy val docs = graft.sources.Tables
    .parquet(spark, "/root/testdata/sf0.001", "documents")
    .select($"doc_id", $"text", $"lang").limit(120).cache()

  private lazy val model: Classifier.MultiModel = Classifier.MultiModel(
    Classifier.trainMulti(docs, "doc_id", "text", "lang",
      numBuckets = 512, iters = 2), 512)
  private lazy val fp = ScoreStreaming.modelFingerprint(model)

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/s"

  private def batchKernel = Classifier
    .calibrateScores(Classifier.scoreMulti(model, docs, "doc_id", "text"))
    .join(docs.select($"doc_id",
      graft.pipeline.TextAnalysis.tokenCount($"text")
        .cast("long").as("n_tokens")), "doc_id")
    .select($"doc_id", $"cls_pred", $"score_e6", $"margin_e6",
      $"share_bp", $"n_tokens")

  private def rows(df: org.apache.spark.sql.DataFrame) = df
    .select($"doc_id", $"cls_pred", $"score_e6", $"margin_e6",
      $"share_bp", $"n_tokens")
    .as[(Long, String, Long, Long, Long, Long)].collect().toSet

  test("committed predictions == batch kernel, any split; replay is a no-op") {
    val store = tmp("graft_score")
    // split by doc_id % 3 — scoring is per-doc, so arrival order and
    // batch boundaries must not matter
    for (i <- 0 until 3)
      ScoreStreaming.scoreBatch(docs.filter($"doc_id" % 3 === i),
        i.toLong, model, fp, store, "doc_id", "text", "sc")
    val got = rows(ScoreStreaming.committedPredictions(spark, store))
    assert(got === rows(batchKernel))
    assert(got.nonEmpty)
    // replay of a committed batch id appends nothing
    ScoreStreaming.scoreBatch(docs.filter($"doc_id" % 3 === 1), 1L,
      model, fp, store, "doc_id", "text", "sc")
    assert(rows(ScoreStreaming.committedPredictions(spark, store)) === got)
  }

  test("frozen-model pin: a different model refuses to resume or read") {
    val store = tmp("graft_score_pin")
    ScoreStreaming.scoreBatch(docs.filter($"doc_id" % 2 === 0), 0L,
      model, fp, store, "doc_id", "text", "sc")
    val other = Classifier.MultiModel(
      Classifier.trainMulti(docs, "doc_id", "text", "lang",
        numBuckets = 512, iters = 1), 512)
    val ofp = ScoreStreaming.modelFingerprint(other)
    assert(ofp !== fp, "fixture models must differ or the pin test is vacuous")
    val e = intercept[IllegalStateException] {
      ScoreStreaming.scoreBatch(docs.filter($"doc_id" % 2 === 1), 1L,
        other, ofp, store, "doc_id", "text", "sc")
    }
    assert(e.getMessage.contains("different model"))
    val eR = intercept[IllegalStateException] {
      ScoreStreaming.committedGatedReport(spark, store, other)
    }
    assert(eR.getMessage.contains("different model"))
  }

  test("gated report over the store == batch gate over the same corpus") {
    val store = tmp("graft_score_gate")
    for (i <- 0 until 2)
      ScoreStreaming.scoreBatch(docs.filter($"doc_id" % 2 === i),
        i.toLong, model, fp, store, "doc_id", "text", "sc")
    val got = ScoreStreaming.committedGatedReport(spark, store, model)
      .as[(String, Long, Long)].collect().toSet
    val want = Classifier.gateAtMedianMargin(batchKernel)
      .groupBy($"cls_gated".as("lang_gated"))
      .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens"))
      .as[(String, Long, Long)].collect().toSet
    assert(got === want)
    assert(got.map(_._2).sum === docs.count())
  }

  test("compaction folds the chain and the same stream resumes against it") {
    val store = tmp("graft_score_c")
    for (i <- 0 until 2)
      ScoreStreaming.scoreBatch(docs.filter($"doc_id" % 3 === i),
        i.toLong, model, fp, store, "doc_id", "text", "sc")
    val before = rows(ScoreStreaming.committedPredictions(spark, store))
    val dst = tmp("graft_score_c2")
    ScoreStreaming.compactStore(spark, store, dst)
    assert(rows(ScoreStreaming.committedPredictions(spark, dst)) === before)
    // the remaining slice arrives at the compacted store
    ScoreStreaming.scoreBatch(docs.filter($"doc_id" % 3 === 2), 2L,
      model, fp, dst, "doc_id", "text", "sc")
    assert(rows(ScoreStreaming.committedPredictions(spark, dst)) ===
      rows(batchKernel))
  }

  test("empty store reads empty; reserved id column names fail fast") {
    assert(ScoreStreaming
      .committedPredictions(spark, tmp("graft_score_e")).columns.isEmpty)
    val e = intercept[IllegalArgumentException] {
      ScoreStreaming.scoreBatch(
        docs.withColumnRenamed("doc_id", "cls_pred"), 0L, model, fp,
        tmp("graft_score_r"), "cls_pred", "text", "sc")
    }
    assert(e.getMessage.contains("collides"))
  }

  test("end-to-end: maintainPredictions via readStream") {
    val src = java.nio.file.Files
      .createTempDirectory("graft_score_src").toString
    val store = tmp("graft_score_e2e")
    docs.filter($"doc_id" % 2 === 0).write.mode("overwrite")
      .parquet(s"$src/b0")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*")
    val q = ScoreStreaming.maintainPredictions(stream, model, store,
      "doc_id", "text",
      checkpointLocation = Some(tmp("graft_score_ckpt")))
    try {
      q.processAllAvailable()
      docs.filter($"doc_id" % 2 === 1).write.mode("overwrite")
        .parquet(s"$src/b1")
      q.processAllAvailable()
    } finally q.stop()
    assert(rows(ScoreStreaming.committedPredictions(spark, store)) ===
      rows(batchKernel))
  }
}
