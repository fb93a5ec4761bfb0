package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{avg, coalesce, col, count, length, lit, slice, sum}

/** Usage example / smoke driver for the SQL surface. Run with:
  * `sbt "runMain graft.Demo"`.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // the recommended deployment conf (see Similarity.lshNearDupPairs):
      // broadcast small sides, shuffled-hash medium, sort-merge only
      // giant x giant
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    TopnFunctions.register(spark)

    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .createOrReplaceTempView("orders")

    println("== flagship entry ==")
    SparkEntry.entry(spark).show(5, truncate = false)

    println("== pure SQL surface ==")
    spark.sql(
      """SELECT r.item, r.frequency
        |FROM (SELECT topn(topn_add_agg(CAST(o_custkey AS STRING)), 5) AS t FROM orders)
        |LATERAL VIEW explode(t) AS r""".stripMargin).show(false)

    println("== set-returning topn_rows via LATERAL VIEW ==")
    spark.sql(
      """SELECT t.item, t.frequency
        |FROM (SELECT topn_add_agg(o_orderpriority) AS s FROM orders)
        |LATERAL VIEW topn_rows(s, 3) t AS item, frequency""".stripMargin).show(false)

    println("== SET conf rebinding (n=3 prunes sketch to 3 entries) ==")
    spark.sql(s"SET ${GraftConf.NumberOfCountersKey}=3")
    spark.sql(
      "SELECT topn_to_json(topn_add_agg(o_orderpriority)) AS sketch FROM orders")
      .show(false)
    spark.sql(s"SET ${GraftConf.NumberOfCountersKey}=1000")

    println("== error path: k > number_of_counters ==")
    try {
      spark.sql("SELECT topn(topn_add_agg(o_orderpriority), 2000) FROM orders").collect()
      println("ERROR: should have thrown")
    } catch {
      case e: Exception =>
        val cause = rootCause(e)
        println(s"got expected error: ${cause.getMessage}")
        cause match {
          case st: org.apache.spark.SparkThrowable =>
            // the GRAFT_* error-class surface: stable condition + SQLSTATE
            // for tooling, not just message text
            println(s"error class: ${st.getCondition}  SQLSTATE: ${st.getSqlState}")
          case _ =>
        }
    }

    println("== error path: wrong input type without cast ==")
    try {
      spark.sql("SELECT topn_add_agg(o_custkey) FROM orders").collect()
      println("ERROR: should have thrown")
    } catch {
      case e: Exception =>
        println(s"got expected analysis error: ${e.getMessage.linesIterator.next()}")
    }

    println("== curation tour: dedup-cluster -> quality gate -> split, from SQL ==")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.createOrReplaceTempView("documents")
    val pairs = pipeline.Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5)
    val canonical = pipeline.Clustering.canonicalize(docs, "doc_id", pairs, "doc_a", "doc_b")
    println(s"${docs.count()} docs -> ${canonical.count()} after near-dup clustering")
    canonical.createOrReplaceTempView("canonical_docs")
    spark.sql(
      """SELECT CASE WHEN hash_bucket(doc_id) < 90 THEN 'train' ELSE 'eval' END AS split_name,
        |       count(*) AS docs,
        |       round(avg(quality_score(text)), 3) AS avg_quality,
        |       topn_to_json(topn_add_agg(language_id(text))) AS langs
        |FROM canonical_docs
        |WHERE quality_score(text) >= 0.4
        |GROUP BY 1 ORDER BY 1""".stripMargin).show(false)

    println("== selection tour: span rewrite -> top-quality half -> per-source cap ==")
    val rewritten = pipeline.Spans
      .dropDuplicatedSpans(docs, "doc_id", "text", n = 8).cache()
    val cut = rewritten.agg(sum("n_dropped_spans")).head.getLong(0)
    println(s"span rewrite cut $cut duplicated 8-token spans corpus-wide")
    val scored = rewritten
      .withColumn("score", length(col("clean_text")).cast("long"))
    val best = pipeline.Selection
      .selectTopFraction(scored, "doc_id", "score", pct = 50).cache()
    val capped = pipeline.Selection.topKPerGroup(
      best.join(docs.select("doc_id", "source"), "doc_id"),
      "doc_id", "source", k = 10, priority = col("score"))
    println(s"${rewritten.count()} docs -> top-50% ${best.count()} -> " +
      s"per-source cap ${capped.count()}")

    println("== ingest tour: bloom cross-corpus dedup -> trained quality filter ==")
    // yesterday's corpus is the reference; today's batch re-sends a slice
    val ref = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .unionByName(ref.limit(25).select(
        (-col("doc_id") - 1L).as("doc_id"), col("text"), col("lang"),
        col("source"), col("n_chars")))
    val fresh = pipeline.Dedup.crossCorpusDedup(
      batch, ref, "doc_id", "text", expectedRefItems = 1000L).cache()
    println(s"${batch.count()} batch docs -> ${fresh.count()} after " +
      "bloom-pruned dedup against the reference corpus")
    val raw = pipeline.Classifier.trainScores(
      fresh, "doc_id", "text", col("lang") === "en", iters = 2)
      .filter(!col("is_target")).cache()
    val kept = pipeline.Selection.selectTopFraction(
      raw, "doc_id", "score_e6", pct = 50)
    println(s"classifier keeps the ${kept.count()} most en-like of the " +
      s"${raw.count()} non-en docs")

    println("== ops tour: shuffle-key skew profile (the salting diagnostic) ==")
    operators.Diagnostics.keySkewReport(docs, "source", k = 5, counters = 100000)
      .show(false)

    println("== ANN ops tour: quantizer drift audit (frozen models, agree_e6) ==")
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ivf = pipeline.IVF.train(emb, "vec_id", "embedding", k = 8)
    val pqm = pipeline.Pq.train(emb, "vec_id", "embedding", m = 16, ks = 16)
    val drift = pipeline.Pq.driftScore(
      pipeline.Pq.index(emb, "vec_id", "embedding", pqm, ivf), emb,
      emb.filter(col("vec_id") < 10), "vec_id", "embedding",
      k = 5, pqm, ivf, nprobe = 4, rerank = 50)
    drift.agg(avg(col("agree_e6")).cast("long").as("mean_agree_e6"),
      count(lit(1)).as("n_queries")).show(false)

    println("== decontamination tour: eval-set paraphrases caught in embedding space ==")
    val evalSet = emb.filter(col("vec_id") % 13 === 0)
    val contaminated = emb.filter(col("vec_id") % 13 =!= 0).unionByName(
      evalSet.limit(5).select((col("vec_id") + 1000000L).as("vec_id"),
        col("embedding"), col("label")))
    val cleanTrain = pipeline.SemDedup.removeContaminatedSemantic(
      contaminated.select(col("vec_id"), col("embedding")),
      evalSet.select(col("vec_id"), col("embedding")),
      "vec_id", "embedding", ivf, tau = 0.95, nprobe = 2)
    println(s"${contaminated.count()} train vectors -> ${cleanTrain.count()} after " +
      "dropping exact-cosine matches to the eval benchmark (no shared trigram needed)")

    println("== chat SFT tour: turns -> role-tagged render -> masked 16-token windows ==")
    val turns = spark.createDataFrame(Seq(
      (1L, 0L, "system", "be concise"),
      (1L, 1L, "user", "what is a sketch"),
      (1L, 2L, "assistant", "a bounded summary of a stream"),
      (1L, 3L, "user", "name one"),
      (1L, 4L, "assistant", "space saving"),
      (2L, 0L, "user", "hello there"),
      (2L, 1L, "assistant", "hi how can I help")))
      .toDF("conv_id", "turn_idx", "role", "text")
    val rendered = pipeline.Chat.renderConversations(
      turns, "conv_id", "turn_idx", "role", "text")
    rendered.select(col("conv_id"), col("text"), col("loss_ivs")).show(false)
    pipeline.Chat.packMaskedIntervals(rendered, "conv_id", "loss_ivs", "n_tokens", 16L)
      .select(col("conv_id"), col("seq_id"), col("seq_off"), col("loss_ivs"))
      .show(false)

    println("== temporal tour: sessionize an event stream, as-of enrich it ==")
    def demoTs(s: Long) = new java.sql.Timestamp(s * 1000L)
    val demoEv = spark.createDataFrame(Seq(
      (1L, 10L, demoTs(0), "view"), (2L, 10L, demoTs(30), "click"),
      (3L, 10L, demoTs(5000), "view"), (4L, 10L, demoTs(5100), "click"),
      (5L, 20L, demoTs(100), "click")))
      .toDF("event_id", "user_id", "ts", "event_type")
    operators.Sessions.stats(demoEv, Seq("user_id"), "ts",
        gapSeconds = 3600L, orderCols = Seq("event_id"))
      .orderBy(col("user_id"), col("session_seq")).show(false)
    val demoViews = demoEv.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_event_id"))
    operators.AsofJoin.latestPreceding(
        demoEv.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts")),
        demoViews, Seq("user_id"), "ts", "view_ts",
        payloadCols = Seq("view_event_id", "view_ts"))
      .orderBy(col("event_id")).show(false)

    println("== event analytics tour: funnel -> latency -> retention -> bursts ==")
    // user 10 converts view->click twice over, user 20 clicks with no view
    operators.Sessions.funnelCounts(demoEv, Seq("user_id"), "ts",
        "event_type", Seq("view", "click"))
      .orderBy(col("step_idx")).show(false)
    operators.Sessions.funnelTransitions(demoEv, Seq("user_id"), "ts",
        "event_type", Seq("view", "click"))
      .orderBy(col("step_idx")).show(false)
    operators.Sessions.retentionCohorts(demoEv, Seq("user_id"), "ts",
        periodSeconds = 3600L)
      .orderBy(col("cohort_start_us"), col("period_offset")).show(false)
    // attribution window: the t=5100 click credits the t=5000 view (100s
    // old) under a 10-min bound; the t=30 click's view is fresh too, but
    // user 20 never saw a view at all
    operators.AsofJoin.latestPreceding(
        demoEv.filter(col("event_type") === "click")
          .select(col("event_id"), col("user_id"), col("ts")),
        demoViews, Seq("user_id"), "ts", "view_ts",
        payloadCols = Seq("view_event_id"), maxGapSeconds = Some(600L))
      .orderBy(col("event_id")).show(false)
    // burst detection: host 77 ticks once an hour, then 10x in hour 4
    val burstDf = spark.createDataFrame(
      (0 to 5).flatMap(p =>
        Seq.fill(if (p == 4) 10 else 1)((77L, demoTs(p * 3600L)))))
      .toDF("host_id", "ts")
    operators.Diagnostics.rateAnomalies(burstDf, Seq("host_id"), "ts",
      periodSeconds = 3600L, k = 2).show(false)

    println("== crawl front door: html_to_text -> normalize -> token count, from SQL ==")
    spark.sql(
      """SELECT html_to_text('<html><body><h1>Title</h1><p>Hello &amp; welcome.</p>
        |<script>var hidden = 1;</script><ul><li>one</li><li>two</li></ul>
        |</body></html>') AS extracted""".stripMargin.replace("\n", ""))
      .show(false)
    spark.sql(
      """SELECT token_count(normalize_text(html_to_text(
        |  '<p>A &#72;TML page</p><div>with two blocks</div>'))) AS n_tokens""".stripMargin)
      .show(false)

    println("== exact-substring rewrite: arbitrary-alignment dedup ==")
    val straddle = spark.createDataFrame(Seq(
      (1L, "intro words SHARED RUN OF EIGHT TOKENS EXACTLY HERE YES tail one"),
      (2L, "other opening SHARED RUN OF EIGHT TOKENS EXACTLY HERE YES ending"))).toDF("doc_id", "text")
    pipeline.Spans.dropDuplicatedSubstrings(straddle, "doc_id", "text", n = 8)
      .show(false)

    println("== crawl bytes to clean text: WARC -> html -> links -> domains ==")
    import spark.implicits._
    val warcFiles = Seq(pipeline.Warc.WarcFile(0L, pipeline.Warc.syntheticWarc(Seq(
      "https://News.Example.co.uk:443/a?utm_source=rss" ->
        """<h1>Hi</h1><a href="https://other.net/x">out</a>""",
      "https://other.net/x" -> "<p>plain page</p>"), gzipped = true))).toDS()
    val crawl = pipeline.Warc.warcDocuments(warcFiles)
      .select(col("target_uri"),
        pipeline.TextAnalysis.htmlToText(col("html")).as("text"),
        pipeline.TextAnalysis.htmlLinks(col("html")).as("links"))
    crawl.show(false)
    spark.sql(
      """SELECT url_normalize('https://News.Example.co.uk:443/a?utm_source=rss') AS canonical,
        |       registered_domain(url_host('https://News.Example.co.uk/a')) AS domain""".stripMargin)
      .show(false)

    println("== domain PageRank: exact integer ranks over a toy link graph ==")
    pipeline.Graph.pageRank(Seq(
      ("blog.example.com", "docs.example.org"),
      ("news.example.net", "docs.example.org"),
      ("docs.example.org", "blog.example.com")).toDF("src", "dst"),
      "src", "dst", iterations = 4)
      .orderBy(col("rank_e6").desc).show(false)

    println("== export: token-budgeted shards + manifest ==")
    val weighted = kept.join(docs.select("doc_id", "text"), "doc_id")
      .withColumn("n_tokens",
        pipeline.TextAnalysis.tokenCount(col("text")).cast("long"))
    val outDir = java.nio.file.Files.createTempDirectory("graft_demo_shards")
    val manifest = pipeline.Sampling.exportShards(
      weighted, "doc_id", "n_tokens", s"$outDir/corpus", tokensPerShard = 1024L)
    val m = manifest
      .agg(count(lit(1)), coalesce(sum(col("weight")), lit(0L))).head()
    println(s"wrote ${m.getLong(0)} shards, ${m.getLong(1)} tokens total")

    println("== tokenizer: corpus vocab -> documents as token ids ==")
    val vocab = pipeline.Bpe.buildVocab(docs, "text", pipeline.Bpe.DemoMerges)
    println(s"vocabulary: ${vocab.count()} distinct pieces")
    pipeline.Bpe.tokenIds(docs.limit(3), "doc_id", "text", vocab,
      pipeline.Bpe.DemoMerges)
      .select(col("doc_id"), col("n_tokens"), slice(col("ids"), 1, 12).as("ids_head"))
      .orderBy("doc_id").show(false)

    println("== tokenizer TRAINING: learn the merge table from the corpus ==")
    val learned = pipeline.Bpe.trainMerges(docs, "text", iters = 6)
    learned.foreach { case (i, a, b, c) => println(s"  rule $i: '$a' + '$b' ($c occurrences)") }
    val rules = learned.map(r => (r._2, r._3))
    println(s"token count under the learned rules (3 docs): " +
      docs.limit(3).select(pipeline.Bpe.tokenCountVocab(col("text"), rules))
        .collect().map(_.get(0)).mkString(", "))

    println("== sketch with guaranteed error bounds (exact here: max_error 0) ==")
    spark.sql(
      """SELECT r.item, r.frequency, r.max_error FROM (
        |  SELECT explode(topn_with_bounds(topn_add_agg_bounds(language_id(text)), 5)) AS r
        |  FROM documents)""".stripMargin).show(false)

    println("== trained language-ID: one-vs-rest heads over hashed features ==")
    val lidW = pipeline.Classifier.trainMulti(docs, "doc_id", "text", "lang",
      numBuckets = 4096, iters = 3)
    val lid = pipeline.Classifier.MultiModel(lidW, 4096)
    docs.select(col("lang").as("labeled"),
        pipeline.Classifier.predictColumn(col("text"), lid).as("predicted"))
      .groupBy("labeled", "predicted").count()
      .orderBy(col("labeled"), col("predicted")).show(false)

    println("== LID confidence gate: median-margin floor -> explicit 'und' bucket ==")
    val lidCal = pipeline.Classifier.calibratedFrom(
      lid, docs, "doc_id", "text", "lang")
    pipeline.Classifier.gateAtMedianMargin(lidCal)
      .groupBy(col("cls_gated")).count()
      .orderBy(col("cls_gated")).show(false)

    println("== out-of-sample serve: even-half model scores the odd half ==")
    val halfW = pipeline.Classifier.trainMulti(
      docs.filter(col("doc_id") % 2 === 0), "doc_id", "text", "lang",
      numBuckets = 4096, iters = 3)
    pipeline.Classifier.predictionsFrom(
        pipeline.Classifier.MultiModel(halfW, 4096),
        docs.filter(col("doc_id") % 2 =!= 0), "doc_id", "text", "lang")
      .groupBy(col("cls_pred")).count()
      .orderBy(col("cls_pred")).show(false)

    println("== streaming serve store: frozen model, manifest commits, gated read ==")
    // the production inference shape on the batch protocol kernel: two
    // micro-batches append calibrated predictions under the model's
    // fingerprint pin (a different model refuses to resume or read;
    // migrateStore is the verified v1->v2 upgrade path), and the gated
    // report over the store equals the batch gate over the same corpus
    val serveModel = pipeline.Classifier.MultiModel(halfW, 4096)
    val scoreStore = java.nio.file.Files
      .createTempDirectory("graft_demo_score").toString + "/s"
    val serveFp = streaming.ScoreStreaming.modelFingerprint(serveModel)
    Seq(0, 1).foreach { i =>
      streaming.ScoreStreaming.scoreBatch(
        docs.filter(col("doc_id") % 2 === i), i.toLong, serveModel,
        serveFp, scoreStore, "doc_id", "text", "demo")
    }
    streaming.ScoreStreaming.committedGatedReport(spark, scoreStore, serveModel)
      .orderBy(col("lang_gated")).show(false)

    println("== corpus report card ==")
    pipeline.TextAnalysis.corpusReport(docs, "text").orderBy("metric").show(14, false)

    println("== mixing: temperature weights -> deterministic training order ==")
    pipeline.Mixture.temperatureWeights(docs, "source", 1, 2)
      .orderBy(col("grp")).show(false)
    pipeline.Sampling.shuffleOrder(docs.select("doc_id"), "doc_id",
      numShards = 4, salt = 1L)
      .orderBy(col("shard"), col("pos")).show(8, truncate = false)

    println("== sketch analytics: what moved between two halves of the corpus ==")
    spark.sql(
      """WITH a AS (SELECT topn_add_agg(language_id(text)) AS s
        |           FROM documents WHERE doc_id % 2 = 0),
        |     b AS (SELECT topn_add_agg(language_id(text)) AS s
        |           FROM documents WHERE doc_id % 2 = 1)
        |SELECT d.item, d.freq_a, d.freq_b, d.delta
        |FROM (SELECT explode(topn_delta(a.s, b.s, 5)) AS d
        |      FROM a CROSS JOIN b)""".stripMargin).show(false)

    spark.stop()
  }

  private def rootCause(e: Throwable): Throwable =
    if (e.getCause == null || e.getCause == e) e else rootCause(e.getCause)
}
