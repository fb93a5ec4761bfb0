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

  test("the chain read is ONE scan node, not a per-batch union") {
    val store = tmp("graft_score_plan")
    for (i <- 0 until 3)
      ScoreStreaming.scoreBatch(docs.filter($"doc_id" % 3 === i),
        i.toLong, model, fp, store, "doc_id", "text", "sc")
    // a union chain builds O(batches) plan nodes and plan construction
    // itself becomes the reader's bottleneck on a long-lived store; the
    // multi-root read must keep the plan flat at any chain length
    val plan = ScoreStreaming.committedPredictions(spark, store)
      .queryExecution.optimizedPlan
    val unions = plan.collect {
      case u: org.apache.spark.sql.catalyst.plans.logical.Union => u }
    assert(unions.isEmpty, s"expected no Union in the chain read:\n$plan")
  }

  test("intra-batch duplicate ids fail fast (join would fan out k×k)") {
    val store = tmp("graft_score_dup")
    val slice = docs.filter($"doc_id" % 7 === 0)
    val dup = docs.unionAll(slice)
    val e = intercept[IllegalArgumentException] {
      ScoreStreaming.scoreBatch(dup, 0L, model, fp, store,
        "doc_id", "text", "sc")
    }
    assert(e.getMessage.contains("duplicate ids"))
    // nothing committed: the guard fired before any data write
    assert(ScoreStreaming.committedPredictions(spark, store).columns.isEmpty)
  }

  test("filesPerBatch parameterizes the batch write's file count") {
    val store = tmp("graft_score_fpb")
    intercept[IllegalArgumentException] {
      ScoreStreaming.scoreBatch(docs, 0L, model, fp, store,
        "doc_id", "text", "sc", filesPerBatch = 0)
    }
    // filesPerBatch is a CAP (coalesce — no shuffle), not a floor: at
    // micro-batch scale AQE folds the plan to one partition regardless,
    // so observe the lifted ceiling with AQE off for this one write
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      ScoreStreaming.scoreBatch(docs, 0L, model, fp, store,
        "doc_id", "text", "sc", filesPerBatch = 4)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    val parts = Option(new java.io.File(s"$store/data/b=0/preds").listFiles())
      .getOrElse(Array.empty).count(_.getName.startsWith("part-"))
    assert(parts > 1 && parts <= 4,
      s"expected 2..4 part files under filesPerBatch=4, got $parts")
    // contents identical to the single-file spelling
    assert(rows(ScoreStreaming.committedPredictions(spark, store)) ===
      rows(batchKernel))
  }

  test("modelFingerprint: order-independent, one-row deltas never collide") {
    def m(rows: Seq[(String, Long, Long)]): Classifier.MultiModel =
      Classifier.MultiModel(rows.toDF("cls", "f", "w_e6"), 512)
    val base = Seq(("en", 1L, 10L), ("fr", 2L, -7L), ("de", 3L, 42L))
    // same rows, any order -> same fingerprint (wrapping sum)
    assert(ScoreStreaming.modelFingerprint(m(base)) ===
      ScoreStreaming.modelFingerprint(m(base.reverse)))
    // every single-row weight perturbation lands on a distinct fingerprint
    val fps = (Seq(m(base)) ++ (1L to 50L).map(d =>
      m(base.updated(0, ("en", 1L, 10L + d)))))
      .map(ScoreStreaming.modelFingerprint)
    assert(fps.distinct.size === fps.size,
      "one-row weight deltas must not collide")
    // the feature-space pins fold in: same weights, different buckets
    assert(ScoreStreaming.modelFingerprint(m(base)) !==
      ScoreStreaming.modelFingerprint(
        Classifier.MultiModel(base.toDF("cls", "f", "w_e6"), 1024)))
  }

  test("compaction refuses a destination pinned to another stream") {
    val store = tmp("graft_score_cl")
    ScoreStreaming.scoreBatch(docs.filter($"doc_id" % 2 === 0), 0L,
      model, fp, store, "doc_id", "text", "sc")
    // dst initialized (stamps written) under a DIFFERENT scope but never
    // committed — exactly the state the write-once guard must protect
    val dst = tmp("graft_score_cl2")
    ScoreStreaming.scoreBatch(docs.limit(0), 0L, model, fp, dst,
      "doc_id", "text", "other-scope")
    val e = intercept[IllegalStateException] {
      ScoreStreaming.compactStore(spark, store, dst)
    }
    assert(e.getMessage.contains("different _graft_scope"))
    // and no data landed at the refused destination
    assert(ScoreStreaming.committedPredictions(spark, dst).columns.isEmpty)
  }

  test("streamed store feeds gate + mixture, equal to the batch chain") {
    val store = tmp("graft_score_mix")
    for (i <- 0 until 3)
      ScoreStreaming.scoreBatch(docs.filter($"doc_id" % 3 === i),
        i.toLong, model, fp, store, "doc_id", "text", "sc")
    // the mixture_gated_lid composition (gate -> mixCorpus keep -> per-
    // bucket rollup) applied to the STREAMED store vs the batch kernel:
    // the keep rule is a deterministic hash, so the kept ID SETS must
    // match, not just the counts
    def keptAndReport(preds: org.apache.spark.sql.DataFrame) = {
      val labeled = Classifier.gateAtMedianMargin(preds)
        .select($"doc_id", $"cls_gated", $"n_tokens")
      val kept = graft.pipeline.Sampling.mixCorpus(labeled, "doc_id",
        "cls_gated", pctByGroup = Map("en" -> 100, "und" -> 25),
        defaultPct = 50)
      val report = labeled.groupBy($"cls_gated")
        .agg(count(lit(1)).as("n_in"), sum($"n_tokens").as("t_in"))
        .join(kept.groupBy($"cls_gated")
          .agg(count(lit(1)).as("n_kept"), sum($"n_tokens").as("t_kept")),
          Seq("cls_gated"), "left")
        .na.fill(0L, Seq("n_kept", "t_kept"))
        .as[(String, Long, Long, Long, Long)].collect().toSet
      (kept.select($"doc_id").as[Long].collect().toSet, report)
    }
    val (keptS, repS) =
      keptAndReport(ScoreStreaming.committedPredictions(spark, store))
    val (keptB, repB) = keptAndReport(batchKernel)
    assert(repS === repB)
    assert(keptS === keptB)
    assert(keptS.nonEmpty && repS.nonEmpty)
  }

  test("migrateStore: a v1-stamped store re-stamps to v2 under the verified model") {
    // build a store, then rewind its params stamp to the LEGACY (pre-v2)
    // spelling — exactly what an upgraded deployment finds on disk
    val store = tmp("graft_score_v1")
    for (i <- 0 until 2)
      ScoreStreaming.scoreBatch(docs.filter($"doc_id" % 2 === i),
        i.toLong, model, fp, store, "doc_id", "text", "sc")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(store, "_graft_params"),
      ScoreStreaming.paramsV1Of(model, ScoreStreaming.fingerprintV1(model)))
    // drop the Hadoop LocalFileSystem checksum sidecar the raw rewrite
    // invalidated (a real v1 store's crc matches its v1 stamp)
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(store, "._graft_params.crc"))
    // the upgrade break this helper exists for: v2 readers/streams refuse
    val eRead = intercept[IllegalStateException] {
      ScoreStreaming.committedGatedReport(spark, store, model)
    }
    assert(eRead.getMessage.contains("different model"))
    // a model that did NOT write the store is refused with the reason
    val other = Classifier.MultiModel(
      Classifier.trainMulti(docs, "doc_id", "text", "lang",
        numBuckets = 512, iters = 1), 512)
    val eWrong = intercept[IllegalStateException] {
      ScoreStreaming.migrateStore(spark, store, tmp("graft_score_v1w"), other)
    }
    assert(eWrong.getMessage.contains("did not write it"))
    // the writing model migrates; the dst serves reads AND resumes
    val dst = tmp("graft_score_v2")
    ScoreStreaming.migrateStore(spark, store, dst, model)
    assert(rows(ScoreStreaming.committedPredictions(spark, dst)) ===
      rows(batchKernel))
    assert(ScoreStreaming.committedGatedReport(spark, dst, model)
      .count() > 0)
    // replay of an already-committed batch id is still a no-op at dst
    ScoreStreaming.scoreBatch(docs.filter($"doc_id" % 2 === 0), 1L,
      model, fp, dst, "doc_id", "text", "sc")
    assert(rows(ScoreStreaming.committedPredictions(spark, dst)) ===
      rows(batchKernel))
    // a v2 source is not migratable — compactStore is the tool there
    val eV2 = intercept[IllegalStateException] {
      ScoreStreaming.migrateStore(spark, dst, tmp("graft_score_v2m"), model)
    }
    assert(eV2.getMessage.contains("compactStore"))
  }

  test("compactStore files>1 writes a parallel fold with identical reads") {
    val store = tmp("graft_score_pf")
    for (i <- 0 until 2)
      ScoreStreaming.scoreBatch(docs.filter($"doc_id" % 2 === i),
        i.toLong, model, fp, store, "doc_id", "text", "sc")
    val dst = tmp("graft_score_pf2")
    ScoreStreaming.compactStore(spark, store, dst, files = 3)
    val parts = Option(new java.io.File(s"$dst/data/b=1/preds").listFiles())
      .getOrElse(Array.empty).count(_.getName.startsWith("part-"))
    assert(parts > 1 && parts <= 3,
      s"expected 2..3 part files under files=3, got $parts")
    assert(rows(ScoreStreaming.committedPredictions(spark, dst)) ===
      rows(batchKernel))
  }

  test("at-least-once recipe: streamingFirstById in front of the store commits each doc once") {
    val src = java.nio.file.Files
      .createTempDirectory("graft_score_alo_src").toString
    val store = tmp("graft_score_alo")
    val half0 = docs.filter($"doc_id" % 2 === 0)
    half0.write.mode("overwrite").parquet(s"$src/b0")
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$src/*")
    // THE RECIPE the store contract documents, via its public spelling
    // (maintainPredictionsFirstById — the Update-mode foreachBatch wiring
    // an Update-mode flatMapGroupsWithState requires): first-arrival-wins
    // keyed state in front of the scoring sink — intra-batch duplicates
    // collapse (the scoreBatch guard never fires) and cross-batch replays
    // are swallowed before they can append
    val q = ScoreStreaming.maintainPredictionsFirstById(
      stream, model, store, "doc_id", "text",
      checkpointLocation = Some(tmp("graft_score_alo_ck")))
    try {
      q.processAllAvailable()
      // the at-least-once reality: batch 1 REPLAYS batch 0's docs (and a
      // doc duplicated within the batch) alongside the genuinely new half
      half0.unionAll(half0.limit(1))
        .unionAll(docs.filter($"doc_id" % 2 === 1))
        .write.mode("overwrite").parquet(s"$src/b1")
      q.processAllAvailable()
    } finally q.stop()
    val got = ScoreStreaming.committedPredictions(spark, store)
    // duplicate-free: every doc committed exactly once despite the replay
    assert(got.groupBy($"doc_id").count().filter($"count" > 1).isEmpty,
      "replayed ids must not append duplicate prediction rows")
    assert(rows(got) === rows(batchKernel))
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
