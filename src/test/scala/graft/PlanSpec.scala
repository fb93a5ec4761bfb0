package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Physical-plan regression guards: these assert the *shape* that makes the
 * operators scale — column pruning at the parquet scan, predicate pushdown,
 * two-phase (partial/final) aggregation, broadcast of small sides. A change
 * that silently turns one of these into a full-scan / full-shuffle plan
 * fails here long before it shows up as a 100 TB incident.
 */
class PlanSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, dir).queryExecution.explainString(FormattedMode)

  test("sketch group-by runs as partial/final ObjectHashAggregate over a pruned scan") {
    val p = plan("topn_add_agg_groupby")
    assert(p.contains("partial_topn_add_agg"),
      "map-side partial aggregation must run before the shuffle")
    assert(p.linesIterator.count(_.contains("ObjectHashAggregate")) >= 2)
    assert(p.contains("ReadSchema: struct<o_custkey:bigint,o_orderpriority:string>"),
      "scan must read only the two referenced columns")
  }

  test("bounded-sketch report: two-phase ObjectHashAggregate over a one-column scan") {
    // the bounds rider must not change the aggregation shape: map-side
    // partials for both the per-group build and the bounded union, and the
    // scan pruned to the grouped + counted columns only
    val p = plan("topn_bounds_report")
    assert(p.contains("partial_topn_add_agg_bounds"),
      "bounded build must pre-aggregate map-side")
    assert(p.contains("partial_topn_union_agg_bounds"),
      "bounded union must pre-merge map-side")
    assert(p.contains("ReadSchema: struct<o_custkey:bigint,o_orderpriority:string>"),
      "scan must read only the item + group columns")
  }

  test("bpe_train iteration: one pruned corpus scan into a partial/final pair count") {
    // one training iteration's plan (the K-loop re-runs this shape with a
    // longer literal replace chain): explode + hash count with map-side
    // partials, no window, no join — the pair table is subword-bounded
    val it = graft.pipeline.Bpe.trainMerges(
      spark.read.parquet(s"$dir/documents.parquet"), "text", iters = 1)
    assert(it.nonEmpty, "sf0.001 corpus must yield a first merge")
    val df = spark.read.parquet(s"$dir/documents.parquet")
    val p = {
      import org.apache.spark.sql.functions._
      // the exact pair-count subplan trainMerges builds per iteration
      val toks = split(trim(regexp_replace(trim(col("text")), "\\s+", "\u001f")), " ")
      df.select(explode(transform(
          slice(toks, lit(1), greatest(lit(0), size(toks) - 1)),
          (t, i) => struct(t.as("a"), element_at(toks, i + 2).as("b")))).as("pr"))
        .groupBy(col("pr.a"), col("pr.b")).agg(count(lit(1)).as("cnt"))
        .queryExecution.explainString(FormattedMode)
    }
    assert(p.contains("partial_count") || p.contains("partial count"),
      "pair counting must pre-aggregate map-side")
    assert(!p.contains("Window") && !p.contains("Join"),
      "an iteration is scan + agg only — no window, no join")
    assert(p.contains("ReadSchema: struct<text:string>"),
      "scan must read only the text column")
  }

  test("scalar pipeline pushes the price filter into the parquet scan") {
    val p = plan("topn_scalar_pipeline")
    assert(p.contains("PushedFilters:") && p.contains("LessThan(o_totalprice"),
      s"expected o_totalprice predicate pushed to scan")
  }

  test("brute-force ANN broadcasts the query side and pre-aggregates top-k map-side") {
    val p = plan("ann_bruteforce_top10")
    assert(p.contains("BroadcastExchange"), "query set must broadcast")
    assert(p.contains("partial_topk_by_score"),
      "bounded-heap partial aggregation must run before the shuffle " +
        "(only ~k rows per partition per query may cross the wire)")
  }

  test("ivf-pq: broadcast queries, codes-only index, map-side top-k partials") {
    val p = SparkEntry.benchOnly("ann_ivfpq_top10_op")(spark, dir)
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastExchange"),
      "the probe set (query LUTs) must broadcast into the index scan")
    assert(p.contains("partial_topk_by_score"),
      "bounded-heap partial aggregation must run before any shuffle")
    // the ADC scan must score codes, never raw floats: after pq_encode the
    // embedding column may appear only on the bounded rerank join's sides
    assert(p.contains("pq_adc") && p.contains("pq_encode") && p.contains("pq_lut"),
      "ADC path must run on PQ codes via the native kernels")
  }

  test("term_blocklist: corpus scanned once per gram width, list side broadcast, no cartesian") {
    val p = plan("term_blocklist")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "the blocklist match must stay a keyed hash join")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "the documents scan must prune to (doc_id, text)")
  }

  test("dedup scans read only (doc_id, text)") {
    val p = plan("dedup_jaccard_pairs")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("jaccard dedup reads the documents table exactly once") {
    // sizes ride along through the shingle explode — a second scan of the
    // subtree for the denominators would show up as a second FileScan
    val p = plan("dedup_jaccard_pairs")
    // count detail-section node headers "(N) Scan parquet" — one per scan node
    val scans = p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans === 1, s"expected a single documents scan, got $scans")
  }

  test("allPairs is single-consumption: one scan, even in the adaptive final plan") {
    // allPairs must NOT branch over its bucket aggregation: a small/hot
    // branch reads the expensive map side twice under AQE (runtime stage
    // creation does not dedupe the exchanges the way static ReuseExchange
    // would — measured). Execute and inspect the FINAL adaptive plan.
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val df = graft.pipeline.PairGen.allPairs(
      docs.select(col("doc_id"), substring(col("text"), 0, 8).as("k")),
      Seq(col("k")), col("doc_id"), 100, "a", "b")
    df.count()
    val p = df.queryExecution.explainString(FormattedMode)
    assert(p.contains("AdaptiveSparkPlan"), "expected AQE plan")
    val scans = p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans === 1,
      s"expected the map side to run once (one documents scan), got $scans")
    assert(!p.contains("Union"), "allPairs must be one uniform pipeline, not a branch")
  }

  test("lshNearDupPairs: no quadratic join; pairs stream through chained generators") {
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val p = graft.pipeline.Similarity
      .lshNearDupPairs(emb, "vec_id", "embedding", 50, dim = 64)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "candidate generation must not be an all-pairs join")
    // bucket explode + anchor posexplode + suffix explode: >= 3 Generate
    // nodes, so no row ever materializes a bucket's O(b^2) pair array
    val gens = p.linesIterator.count(_.matches("""\(\d+\) Generate\s*"""))
    assert(gens >= 3, s"expected chained generators, got $gens")
  }

  test("text analysis is a pure pruned-scan projection (no shuffle before sort)") {
    val p = plan("text_stats")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
    // the only exchange allowed is the final ORDER BY range partitioning
    val exchanges = p.linesIterator.filter(_.matches(".*\\(\\d+\\) Exchange.*")).size
    assert(exchanges <= 1, s"expected at most the ORDER BY exchange, got $exchanges")
  }

  test("pii_redact and split_assign are shuffle-free projections") {
    for (q <- Seq("pii_redact", "split_assign")) {
      val p = plan(q)
      val exchanges = p.linesIterator.count(_.matches(".*\\(\\d+\\) Exchange.*"))
      assert(exchanges <= 1, s"$q: expected only the ORDER BY exchange, got $exchanges")
      assert(!p.contains("Generate") && !p.contains("Join"),
        s"$q must be a flat scan->project plan")
    }
  }

  test("decontaminate meets on an equi-join, never an all-pairs join") {
    val p = plan("decontaminate")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "shingle collision must be an equi-join keyed by the shingle")
  }

  test("pack_bins: no single-partition funnel anywhere") {
    // the two-pass prefix sum never routes DATA through one partition;
    // the per-partition totals are collected as P driver-side longs, so
    // not even an O(P) SinglePartition exchange remains in the plan
    val p = plan("pack_bins")
    assert(!p.contains("SinglePartition"),
      "global running sum must not use a single-partition window/exchange")
  }

  test("repetition_stats: one scan, two-phase aggregates, no join") {
    val p = plan("repetition_stats")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"))
    // (doc, bigram) count then per-doc max: both are partial/final
    // HashAggregates keyed by doc — the partial side halves the shuffle
    assert(p.linesIterator.count(_.matches("""\(\d+\) HashAggregate\s*""")) >= 4,
      "expected partial+final aggregates for bigram count and per-doc max")
    // the local fractions ride along through the explode as grouping keys
    val scans = p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans === 1, s"expected a single documents scan, got $scans")
    assert(!p.contains("Join"), "fractions must ride along, not join back")
  }

  test("lm scoring: equi-joins on bigram/context keys, no data-sized cartesian") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val model = graft.pipeline.LanguageModel.trainBigrams(docs, "text")
    val p = graft.pipeline.LanguageModel.scoreDocs(docs, "doc_id", "text", model)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct"),
      "only the 1-row vocab may join without keys (as a broadcast loop)")
    // the 1-row vocab join is a broadcast nested loop — bounded, expected;
    // bigram and context joins must be keyed (hash or sort-merge). Count
    // detail-section node headers (the tree summary repeats the name)
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin\s*""")) <= 1,
      "exactly the vocab join may be a nested loop")
    // per-doc reduction aggregates partially before the shuffle
    assert(p.contains("partial_count") || p.contains("HashAggregate"))
  }

  test("semantic dedup: pair space is id-only; vectors join back by key") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val model = graft.pipeline.IVF.train(emb, "vec_id", "embedding", k = 4)
    // assert on the edges subgraph: labels() runs CC eagerly (its rounds
    // are actions), so its explained plan only shows the final label join
    val p = graft.pipeline.SemDedup.edges(emb, "vec_id", "embedding", model, 0.4)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "no all-pairs join anywhere — candidates come from the cell-keyed scan")
    // PairGen's chained generators, not a materialized pair array
    assert(p.linesIterator.count(_.matches("""\(\d+\) Generate\s*""")) >= 2)
  }

  test("scoreMulti serve path: weights broadcast, corpus side never sort-merges") {
    import spark.implicits._
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val w = graft.pipeline.Classifier.trainMulti(
      docs.limit(50), "doc_id", "text", "lang", numBuckets = 256, iters = 1)
    val p = graft.pipeline.Classifier.scoreMulti(
      graft.pipeline.Classifier.MultiModel(w, 256),
      docs, "doc_id", "text")
      .queryExecution.explainString(FormattedMode)
    assert(p.contains("BroadcastHashJoin"),
      "the bounded (nClasses x buckets) weight table must broadcast")
    assert(!p.contains("SortMergeJoin"),
      "the corpus-sized feature side must never sort-merge against weights")
    assert(!p.contains("CartesianProduct"),
      "serving is an equi-join on the feature id")
  }

  test("crossContamination: eval side broadcasts, train side never shuffles") {
    import spark.implicits._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val evalSet = emb.filter($"vec_id" % 13 === 0)
    val train = emb.filter($"vec_id" % 13 =!= 0)
    val model = graft.pipeline.IVF.train(emb, "vec_id", "embedding", k = 4)
    val p = graft.pipeline.SemDedup.crossContamination(
      train, evalSet, "vec_id", "embedding", model, tau = 0.9, nprobe = 2)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "candidates come from the cell equi-join, never an all-pairs scan")
    assert(p.contains("BroadcastHashJoin"),
      "the exploded eval (benchmark) side must broadcast")
    assert(!p.contains("ShuffleExchange") && !p.contains("Exchange hashpartitioning"),
      "the 100 TB train side streams through the broadcast join un-shuffled")
  }

  test("span stats: one scan, hash-partitioned window, no self-join") {
    val p = plan("span_dedup_stats")
    val scans = p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans === 1,
      s"window aggregates must replace the stats self-join (one scan), got $scans")
    assert(!p.contains("Join"), "no join anywhere in the span plan")
    assert(p.contains("Window"), "occurrence counts come from a window over h")
    assert(!p.contains("SinglePartition"),
      "the span window must partition by hash, not funnel to one task")
  }

  test("bm25: map-side scoring over a broadcast one-row stats aggregate") {
    val p = plan("bm25_search")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastNestedLoopJoin"),
      "the one-row corpus stats must broadcast, never shuffle the docs side")
    assert(!p.contains("Generate"), "tf comes from array expressions, no explode")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must be per-partition heaps, not a global sort")
  }

  test("quality_filter is a shuffle-free per-row projection") {
    val p = plan("quality_filter")
    val exchanges = p.linesIterator.count(_.matches(".*\\(\\d+\\) Exchange.*"))
    assert(exchanges <= 1, s"expected only the ORDER BY exchange, got $exchanges")
    assert(!p.contains("Generate") && !p.contains("Join"),
      "every rule must be a per-row array/string expression — no explode, no join")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"))
  }

  test("line_dedup: hash-keyed df join, no cartesian, two-phase aggregates") {
    val p = plan("line_dedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "the doc-frequency meet must be an equi-join keyed by the line hash")
    // df aggregation and the per-doc rollup both aggregate partially
    assert(p.linesIterator.count(_.matches("""\(\d+\) HashAggregate\s*""")) +
      p.linesIterator.count(_.matches("""\(\d+\) ObjectHashAggregate\s*""")) >= 4,
      "expected partial+final aggregates for line df and per-doc stats")
  }

  test("domain_cap: hash-partitioned window, pruned scan, no global sort before the rank") {
    val p = plan("domain_cap")
    assert(p.contains("Window"), "the cap rank is a window function")
    assert(!p.contains("SinglePartition"),
      "the window must partition by source, never funnel to one task")
    assert(p.contains("ReadSchema: struct<doc_id:bigint,n_chars:bigint,source:string>")
      || p.contains("ReadSchema: struct<doc_id:bigint,source:string,n_chars:bigint>"),
      "scan must read only the three referenced columns")
  }

  test("select_top_pct: threshold selection never windows or sorts the corpus") {
    // the operator exists to avoid ORDER BY score DESC LIMIT k at corpus
    // scale: no rank window anywhere; the histogram runs as a partial/
    // final aggregate; corpus rows are only ever filter-scanned. The
    // SinglePartition exchanges that DO appear carry O(#partitions)
    // aggregate partials (the one-row totals) or the 1-row threshold —
    // never corpus rows — so the only full Sort is the final ORDER BY.
    val df = SparkEntry.queries("select_top_pct")(spark, dir)
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("Window"), "no rank window over the corpus")
    val sorts = p.linesIterator.count(_.matches("""\(\d+\) Sort\s*"""))
    assert(sorts <= 1, s"only the final ORDER BY may sort, got $sorts")
    assert(p.contains("TakeOrderedAndProject"),
      "the threshold row comes from a bounded limit over the histogram")
  }

  test("boilerplate_prune: sketch aggregate + broadcast heavy set, equi-join strip") {
    val p = plan("boilerplate_prune")
    assert(p.contains("partial_topn_add_agg"),
      "the heavy-hitter scan must pre-aggregate map-side (bounded sketch state)")
    assert(p.contains("BroadcastExchange"),
      "the k-row heavy set must broadcast into the strip join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "the strip must be an equi-join keyed by the line hash")
  }

  test("span_drop_rewrite: one scan, hash-partitioned window, no self-join") {
    val p = plan("span_drop_rewrite")
    val scans = p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans === 1, s"rewrite must reuse the spanStats one-scan shape, got $scans")
    assert(!p.contains("Join"), "no join anywhere in the rewrite plan")
    assert(p.contains("Window") && !p.contains("SinglePartition"))
  }

  test("html_extract is a shuffle-free codegen'd projection") {
    val p = plan("html_extract")
    val exchanges = p.linesIterator.count(_.matches(".*\\(\\d+\\) Exchange.*"))
    assert(exchanges <= 1, s"expected only the ORDER BY exchange, got $exchanges")
    assert(!p.contains("Join") && !p.contains("Generate"),
      "extraction must be a flat scan->project plan")
    assert(p.contains("html_to_text"), "the codegen'd expression must appear")
  }

  test("url_filter: map-side URL projection, one keyed anti join on the domain") {
    val p = plan("url_filter")
    assert(p.contains("LeftAnti"), "blocklist must be an anti join")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "the bounded blocklist side should broadcast (AQE), never shuffle the corpus")
    assert(!p.contains("SortMergeJoin"),
      "the corpus must not sort-merge against a blocklist-sized side")
    assert(!p.contains("Generate"),
      "host/domain/normalize are flat projections, no explode")
  }

  test("html_links: one generate over a flat projection, no join") {
    val p = plan("html_links")
    assert(p.contains("html_links"), "the codegen'd expression must appear")
    assert(p.linesIterator.count(_.matches(".*\\(\\d+\\) Generate.*")) === 1,
      "exactly the link explode, nothing else generates")
    assert(!p.contains("Join"), "per-link url columns are projections, not joins")
  }

  test("domain_pagerank: keyed equi joins only, node-sized rank table") {
    val p = plan("domain_pagerank")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "every iteration must join on keys — no all-pairs fallback")
    assert(p.contains("LocalTableScan") || p.contains("Scan ExistingRDD"),
      "iterations must start from the checkpointed rank table, not replay lineage")
  }

  test("exact_substr_rewrite: hash-partitioned window, doc-keyed rebuild join only") {
    val p = plan("exact_substr_rewrite")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      "window occurrences meet through the hash window, never an all-pairs join")
    assert(p.contains("Window") && !p.contains("SinglePartition"),
      "keeper selection must be the hash-partitioned window, no global funnel")
    // the only join is the drop-list rebuild join, keyed by doc_id
    val joins = p.linesIterator.count(_.matches(""".*\(\d+\) \w*HashJoin.*"""))
    assert(joins <= 2,
      s"expected only the doc-keyed rebuild join (per union branch), got $joins")
  }

  test("decontaminate_scrub: no self-join, test side reduces before the semi join") {
    val p = plan("decontaminate_scrub")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      "train windows must meet the test hash SET through a keyed semi join")
    assert(p.contains("LeftSemi"),
      "the test-window match must be a semi join (set membership, no fanout)")
  }

  test("dedup_best_keeper: keeper selection is a cluster-keyed window, no global sort") {
    val p = plan("dedup_best_keeper")
    assert(!p.contains("CartesianProduct"),
      "labels join docs by id; nothing may go all-pairs")
    // the keeper row_number partitions by cluster_id; the only
    // SinglePartition window would be a global-sort funnel
    assert(p.contains("Window"),
      "keeper selection must run as a window over cluster_id")
  }

  test("incremental near-dup: candidate step is an equi-join, never all-pairs") {
    import graft.pipeline.Dedup
    val fps = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        Dedup.simhash64(graft.pipeline.TextAnalysis.tokens(col("text"))).as("fp"))
    val p = Dedup.incrementalFingerprintPairs(
        fps.filter(col("doc_id") % 5 === 0), fps.filter(col("doc_id") % 5 =!= 0),
        "doc_id", "fp", 3)
      .queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "new-vs-store candidates must meet on the (chunk, value) equi-join")
  }

  test("dsir: no forced broadcast of the feature-stats table; scoring join is keyed") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val df = SparkEntry.queries("dsir_weights")(spark, dir)
    // the ONLY broadcast hint allowed is the one-row totals aggregate; a
    // hint on the per-feature lr table would pin a vocab-sized broadcast
    // in the raw-unigram tier (the round-7 scale-killer) — AQE must pick
    // the scoring-join strategy from the table's runtime size instead
    val hinted = df.queryExecution.analyzed.collect {
      case h: ResolvedHint => h.child.schema.fieldNames.toSeq
    }
    assert(hinted.forall(_.contains("n_raw")),
      s"only the one-row totals may carry a broadcast hint; hinted: $hinted")
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct"),
      "only the 1-row totals may join without keys (broadcast loop)")
    assert(p.linesIterator.count(
      _.matches("""\(\d+\) BroadcastNestedLoopJoin\s*""")) <= 1,
      "exactly the totals join may be a nested loop")
  }

  test("cross-corpus dedup: map-side bloom prune, keyed anti join only") {
    val df = SparkEntry.queries("cross_corpus_dedup")(spark, dir)
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      "the verify step must be a fingerprint equi-join")
    assert(p.contains("LeftSemi"),
      "flagged keys must be verified against the reference (exact present set)")
    assert(p.contains("LeftAnti"), "exact semantics comes from the anti join")
    // the bloom probe is a codegen'd expression inside the probe scan's
    // filter — not a boxed Scala UDF, and not a two-branch union plan
    assert(p.contains("bloom_might_contain"),
      "bloom probe should appear as a codegen'd pre-join filter")
    assert(!p.contains("UDF"), "the probe must not be a boxed Scala UDF")
    // (the plan's one Union is the QUERY's organic-plus-planted input
    // construction; the operator itself is branch-free — asserted on a
    // union-free input in the bloomAntiJoin plan test below)
  }

  test("bloomAntiJoin: full-width batch scanned once, probe scan key-pruned") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val ref = docs.filter(col("doc_id") % 3 === 0).select(col("lang"))
    val df = graft.pipeline.Dedup.bloomAntiJoin(docs, ref, "lang", 100L)
    val p = df.queryExecution.explainString(FormattedMode)
    // the probe pass reads ONLY the key column; the payload columns are
    // read by exactly one scan — the batch's bytes are read once
    val fullScans = p.linesIterator.count(_.contains("ReadSchema: struct<doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint>"))
    assert(fullScans === 1, s"expected one full-width batch scan, got $fullScans:\n$p")
    assert(p.contains("ReadSchema: struct<lang:string>"),
      "probe/verify passes must be pruned to the key column")
    assert(p.contains("bloom_might_contain") && !p.contains("UDF"))
    assert(!p.contains("Union"),
      "one full-width pass: no ruled-out/verified branch union")
  }

  test("ccnet_buckets: no rank window, corpus joined by id against its keep sets") {
    val df = SparkEntry.queries("ccnet_buckets")(spark, dir)
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("Window"),
      "bucketing must reuse the threshold machinery, not a global rank window")
    assert(!p.contains("CartesianProduct"),
      "keep sets join back by id; the only keyless joins are 1-row broadcasts")
    // partition-LOCAL sorts are fine (sort-merge-join mechanics on the id
    // key; AQE turns these joins broadcast at runtime when a side is
    // small) — what must never appear is a global sort by SCORE feeding a
    // rank, which is the plan this operator exists to avoid
    val globalScoreSorts = p.linesIterator.count(l =>
      l.contains("Sort [n_chars") || l.contains("Sort [s#"))
    assert(globalScoreSorts === 0,
      "bucketing must never sort the corpus by score")
  }

  // (No chain-level plan guard for pipeline_full_curation: the final
  // packing stage's prefix sum materializes its input, so the returned
  // df's physical plan is a projection over an RDD — the interesting
  // plans belong to the stages, each of which has its own guard above.)

  test("temperature weights: one corpus scan, one G-row window stage, no join") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val mix = graft.pipeline.Mixture.temperatureWeights(
      docs, "source", 7, 10, Some("n_chars"))
    val p = mix.queryExecution.explainString(FormattedMode)
    // count node DETAIL headers ("(3) Scan parquet") — the formatted dump
    // also repeats each node in the tree drawing
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length === 1,
      "the corpus must be scanned exactly once — totals come from a window " +
        "over the G-row aggregate, never an agg-and-rejoin that replicates " +
        "the scan")
    assert(!p.contains("Join"), "no join anywhere in the mixture plan")
    assert(p.contains("HashAggregate"),
      "group weighing must be a two-phase hash aggregation")
    assert("""\(\d+\) Window""".r.findAllIn(p).length >= 1 &&
      """\(\d+\) Exchange""".r.findAllIn(p).length === 2,
      "exactly two exchanges: the group aggregation and the G-row " +
        "single-partition window stage")
  }

  test("corpus report: one scan, aggregates only, no join") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val card = graft.pipeline.TextAnalysis.corpusReport(docs, "text")
    val p = card.queryExecution.explainString(FormattedMode)
    assert("""\(\d+\) Scan parquet""".r.findAllIn(p).length === 1,
      "the card must be computed in exactly one corpus scan")
    assert(!p.contains("Join"), "no join anywhere in the report plan")
    assert(p.contains("HashAggregate"),
      "metrics must aggregate with map-side partials")
  }

  test("training-order shuffle: one hash exchange on shard, never a global sort") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
    val sh = graft.pipeline.Sampling.shuffleOrder(docs, "doc_id", 16, salt = 2L)
    val p = sh.queryExecution.explainString(FormattedMode)
    assert("""\(\d+\) Exchange""".r.findAllIn(p).length === 1,
      "exactly one shuffle: the hash partition on shard")
    assert(p.contains("hashpartitioning"),
      "the shard exchange must be a hash partition")
    assert(!p.contains("rangepartitioning"),
      "a training-order shuffle must never globally sort the corpus")
    assert(p.contains("Window"), "positions come from the per-shard window")
  }

  test("classifier feature table: ONE shuffle serves dedup, weight join, and per-doc sum") {
    // docFeatures hash-partitions by doc_id up front; the (doc_id, f)
    // distinct rides that exchange (partition-local dedup), the weight
    // join broadcasts, and the per-doc score aggregation reuses the
    // partitioning — so a full scoring pass is exactly one corpus-sized
    // shuffle. Before r20 each of the distinct and the per-doc sum paid
    // its own exchange; the trainers' per-iteration forward/gradient
    // passes lean on the same contract via the persisted feature table.
    import graft.pipeline.Classifier
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val w = Classifier.train(docs, "doc_id", "text",
      col("lang") === "en", numBuckets = 64, iters = 1)
    val p = Classifier.score(docs, "doc_id", "text",
      Classifier.Model(w, 64)).queryExecution.explainString(FormattedMode)
    assert("""\(\d+\) Exchange""".r.findAllIn(p).length === 1,
      s"scoring must carry exactly ONE shuffle (the doc_id repartition):\n$p")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "the bounded weight table must broadcast")
    assert(p.contains("hashpartitioning(doc_id"),
      "the one exchange must be the doc_id hash partition")
  }

  test("corpus upsampling is a shuffle-free generate + filter") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("source"))
    val up = graft.pipeline.Sampling.upsampleCorpus(
      docs, "doc_id", "source", Map("src0" -> 250), defaultPct = 100)
    val p = up.queryExecution.explainString(FormattedMode)
    assert(!p.contains("Exchange"),
      "replication + fractional selection must stay map-side")
    assert(p.contains("Generate"), "replicas come from an exploded sequence")
  }

  test("hashed embedding: keyed aggregations only, nothing vocabulary-sized") {
    val df = SparkEntry.queries("hashed_embedding")(spark, dir)
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      "the histogram is built by keyed hash aggregations, never a pair join")
    assert(p.contains("HashAggregate"),
      "bucket counting must be a hash aggregation (map-side partials)")
  }

  test("classifier: bounded-table broadcasts only, keyed joins, no cartesian") {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    val df = SparkEntry.queries("quality_classifier")(spark, dir)
    // every broadcast hint must be the weight table — bounded at
    // numBuckets+1 rows by construction (f, w_e6); nothing corpus-sized
    // may ever be pinned to a broadcast
    val hinted = df.queryExecution.analyzed.collect {
      case h: ResolvedHint => h.child.schema.fieldNames.toSeq
    }
    assert(hinted.nonEmpty && hinted.forall(_ === Seq("f", "w_e6")),
      s"only the bounded weight table may carry a broadcast hint; hinted: $hinted")
    val p = df.queryExecution.explainString(FormattedMode)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      "classifier joins are keyed equi-joins (doc_id / f) — no pair blowup")
  }

  test("masked token packing: one seq_id hash agg, no corpus window, no join") {
    val p = plan("pack_masked_token_ids")
    // the layout is a prefix sum (two passes over one scan) + bounded
    // fragment explode + ONE hash aggregation by seq_id — a window over
    // the corpus or a self-join here would be the 100 TB regression
    assert(!p.contains("WindowExec") && !p.contains("Window ("),
      "no corpus-wide window in the packed layout")
    assert(!p.contains("SortMergeJoin") && !p.contains("NestedLoopJoin") &&
      !p.contains("CartesianProduct") && !p.contains("HashJoin"),
      "packing must not join the corpus against anything")
    assert(p.contains("Generate") && p.contains("explode"),
      "fragments come from a bounded per-row explode")
  }

  test("chat sft: conversation rebuild is one keyed hash agg, tiling joins nothing") {
    import spark.implicits._
    // stage pin on renderConversations (the packing stage's prefix sum
    // materializes its input, so the chain's returned plan is a
    // projection over an RDD — the rebuild plan must be read pre-sum)
    val turns = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id" % 101 as "conv_id", $"doc_id" as "turn_idx",
        lit("user").as("role"), $"text")
    val r = graft.pipeline.Chat.renderConversations(
      turns, "conv_id", "turn_idx", "role", "text")
    val rp = r.queryExecution.explainString(FormattedMode)
    assert(!rp.contains("Window"), "no window — offsets fold inside the group")
    assert(!rp.contains("Join"), "the rebuild joins nothing")
    assert(!rp.contains("SinglePartition"),
      "the conversation rebuild partitions by conv_id, never one task")
    assert(rp.contains("ObjectHashAggregate") || rp.contains("SortAggregate"),
      "ordered turn rebuild is a collect_list agg keyed by conv_id")
    // chain pin: interval clipping is pure projection over the bounded
    // fragment explode — a join or window here is the 100 TB regression
    val p = plan("chat_sft_pack")
    assert(!p.contains("Window ("), "no corpus-wide window in the chat path")
    assert(!p.contains("Join"), "tiling + clipping must not join anything")
    assert(p.contains("Generate"), "fragments come from a bounded per-row explode")
  }

  test("skew report: partial/final sketch agg over a single pruned scan") {
    val p = plan("skew_report")
    assert(p.contains("partial_topn_add_agg"),
      "the sketch must pre-aggregate map-side — the whole point vs groupBy.count")
    // FormattedMode prints each node twice (tree line + detail header),
    // so one physical scan is exactly two matching lines
    assert(p.linesIterator.count(_.contains("Scan parquet")) <= 2,
      "one corpus scan feeds both the sketch and the row count")
    assert(p.contains("ReadSchema: struct<o_custkey:bigint>"),
      "scan must read only the profiled key column")
  }

  test("sliding rank-frame: equi hash join on rank, no nested-loop range join") {
    // the frame pair table is explode(member ranks) + equi join — the rank
    // BETWEEN spelling planned as a BroadcastNestedLoopJoin and paid
    // O(#periods^2) pair evaluations regardless of frame width
    val p = plan("topn_window_7day_scalable")
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      "the frame join must be an equi join on the exploded member rank")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "member periods should hash-join the rank dimension")
  }

  test("wide-frame window: block-partitioned running merges, no range-join replication") {
    val p = plan("topn_window_30day_scalable")
    // the running prefix/suffix merges must partition by the frame block —
    // parallel across blocks, never a data-sized single-partition window
    assert(p.contains("windowspecdefinition(__blk"),
      "prefix/suffix merges must be block-partitioned windows")
    // the point of the decomposition: NO rank-range join, so no
    // frameRows-fold replication of the rollup and no nested-loop join
    // (slidingUnion's rk BETWEEN join is a BroadcastNestedLoopJoin)
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoopJoin"),
      "the stitch must be a 1:1 equi-join on rank, not a range join")
    // only the referenced columns reach the scan
    assert(p.contains("ReadSchema: struct<o_custkey:bigint,o_orderdate:timestamp_ntz>"),
      "scan must read only custkey + orderdate")
  }

  test("robots_gate: rules side broadcasts, no cartesian, verdict is a keyed agg") {
    val p = plan("robots_gate")
    assert(p.contains("BroadcastExchange") || p.contains("BroadcastHashJoin"),
      "the bounded rules table should broadcast against the URL corpus")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "rule matching must join on the host key, never all-pairs")
  }

  test("packed robots gate: one join, pure-projection verdict, no re-aggregation") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rules = graft.pipeline.Robots.parseRules(
      Seq(("h.com", "User-agent: *\nDisallow: /x")).toDF("host", "robots_txt"),
      "graftbot")
    val urls = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), concat(lit("https://h.com/p/"), col("doc_id")).as("url"))
    val gated = graft.pipeline.Robots.filterDisallowedPacked(
      urls, "url", graft.pipeline.Robots.packRules(rules))
    val p = gated.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    // 3 joins total: TWO inside the bounded rules-side build (uaLevels,
    // hostLvl — robots-corpus-sized) and ONE host join against the URL
    // corpus; all broadcast-hash, none corpus×corpus
    val joins = p.linesIterator.count(_.matches(""".*\(\d+\) BroadcastHashJoin.*"""))
    assert(joins === 3, s"host join + two rules-side joins, got $joins")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"))
    val scans = p.linesIterator.count(_.matches("""\(\d+\) Scan parquet\s*"""))
    assert(scans === 1, s"the URL corpus must be scanned exactly once, got $scans")
    // the verdict is the array fold in a projection/filter — the corpus
    // is never re-grouped after the join (no aggregate touches url rows)
    assert(p.contains("array_max"),
      "packed verdict must fold matched rules with array_max in-plan")
  }

  test("topn_anchor_terms: one anchor generate, no join before the sketch agg") {
    val p = plan("topn_anchor_terms")
    assert(p.contains("html_anchors"), "the codegen'd expression must appear")
    assert(!p.contains("Join"),
      "domain/term columns are projections over the generate, not joins")
    assert(p.contains("partial_topn_add_agg"),
      "sketch build must pre-aggregate map-side before the domain shuffle")
  }

  test("recrawl_latest: hash-partitioned windows only, no global sort, no self-join") {
    val p = plan("recrawl_latest")
    // windows partition by the canonical URL — never a data-wide empty
    // partition spec (the single-partition cliff)
    assert(p.contains("windowspecdefinition(url_norm"),
      "version windows must partition by url_norm")
    assert(!p.contains("windowspecdefinition()"),
      "no unpartitioned window may appear")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "latest-pick and change-count must stay keyed")
  }

  test("lshNearDupPairs verify joins: broadcast under the threshold, shuffled-hash past it") {
    // the candidate table's stats are generator-underestimated, so join
    // strategy is decided from the corpus count the operator already
    // holds: small vectors broadcast (strictly best), a side provably
    // past the broadcast threshold is hinted shuffle_hash — NEVER a
    // sort-merge that sorts the ~1000x-larger candidate stream (the
    // g_lsh_neardup x32 finding: 109 s with the sorts, 55 s without)
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    def joins(knownCount: Long): String =
      graft.pipeline.Similarity.lshNearDupPairs(
        emb, "vec_id", "embedding", topPairs = 10, dim = 64,
        knownCount = knownCount)
        .queryExecution.executedPlan.toString
    val small = joins(knownCount = 1000) // 264 KB of vectors: broadcasts
    assert(small.contains("BroadcastHashJoin") &&
      !small.contains("SortMergeJoin"), small.take(400))
    // r21 broadcast tier: past the session threshold but under the verify
    // cap (64k x 264 B ~= 17 MB — the x32 growth shape) the vector side is
    // broadcast-hinted and the candidate stream never shuffles
    val mid = joins(knownCount = 64000)
    assert(mid.contains("BroadcastHashJoin") &&
      !mid.contains("ShuffledHashJoin") && !mid.contains("SortMergeJoin"),
      mid.take(400))
    val big = joins(knownCount = 10000000) // 2.6 GB of vectors: hash-builds
    assert(big.contains("ShuffledHashJoin") &&
      !big.contains("SortMergeJoin"), big.take(400))
  }

  test("minhashLshPairs verify joins: broadcast under the threshold, shuffled-hash past it") {
    // the same ladder, extended from Similarity to the Dedup verify
    // joins (r17 verdict task 1): the shingle-set fetch joins' build
    // side is decided from the corpus count — the candidate table's
    // generator-underestimated stats never get to pick a sort-merge
    // that sorts the candidate stream
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    def joins(knownCount: Long): String =
      graft.pipeline.Dedup.minhashLshPairs(
        docs, "doc_id", "text", threshold = 0.5, knownCount = knownCount)
        .queryExecution.executedPlan.toString
    val small = joins(knownCount = 1000) // ~1 MB of shingle sets: broadcasts
    assert(small.contains("BroadcastHashJoin") &&
      !small.contains("SortMergeJoin"), small.take(400))
    val big = joins(knownCount = 10000000) // ~10 GB of sets: hash-builds
    assert(big.contains("ShuffledHashJoin") &&
      !big.contains("SortMergeJoin"), big.take(400))
    // a long-document corpus corrects the regime via setRowBytes: a count
    // whose 20 KB/doc width lands provably past the verify broadcast cap
    // (100k x 20 KB ~= 2 GB) must hash-build
    val longDocs = graft.pipeline.Dedup.minhashLshPairs(
      docs, "doc_id", "text", threshold = 0.5, knownCount = 100000,
      setRowBytes = 20480L)
      .queryExecution.executedPlan.toString
    assert(longDocs.contains("ShuffledHashJoin") &&
      !longDocs.contains("SortMergeJoin"), longDocs.take(400))
    // ... while the same width at a mid count (1000 x 20 KB = 20 MB —
    // over the session threshold, under the cap) rides the r21
    // broadcast tier: the candidate stream never shuffles
    val midDocs = graft.pipeline.Dedup.minhashLshPairs(
      docs, "doc_id", "text", threshold = 0.5, knownCount = 1000,
      setRowBytes = 20480L)
      .queryExecution.executedPlan.toString
    assert(midDocs.contains("BroadcastHashJoin") &&
      !midDocs.contains("ShuffledHashJoin") &&
      !midDocs.contains("SortMergeJoin"), midDocs.take(400))
  }

  test("minhashLshPairs with NO caller hints: the measured width flips a long-doc corpus") {
    // the r18 nit closed (r18 verdict task 5): when the caller supplies
    // neither knownCount nor setRowBytes, the per-document shingle-set
    // width is SAMPLED from the corpus itself — a long-document corpus
    // (~600 tokens -> ~25 KB of shingles per doc) lands provably past
    // the broadcast threshold at a count where the old 1 KB constant
    // said broadcast, and must hash-build with no hint from the caller
    import org.apache.spark.sql.functions._
    val longDocs = spark.range(2000).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), lit(600)),
        i => concat(lit("tok"), pmod(xxhash64(col("id"), i), lit(50000)))))
        .as("text"))
    val widthLong = graft.pipeline.VerifyJoin.sampledShingleRowBytes(
      longDocs, "text", 3)
    val shortDocs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val widthShort = graft.pipeline.VerifyJoin.sampledShingleRowBytes(
      shortDocs, "text", 3)
    assert(widthLong > 10L * widthShort && widthLong > 20000L,
      s"long docs must sample an order wider: $widthLong vs $widthShort")
    // 2000 long docs x ~25 KB = ~50 MB of build rows: past the session
    // threshold. Pin the width-driven regime flip against a 20 MB verify
    // cap so the estimate must route to shuffled-hash (at the 256 MiB
    // default cap the same estimate rides the broadcast tier — also a
    // width-driven decision, but indistinguishable in the plan string
    // from the sub-threshold control)
    val savedCap = spark.conf.getOption(
      graft.pipeline.VerifyJoin.BroadcastMaxBytesKey)
    val flipped = try {
      spark.conf.set(graft.pipeline.VerifyJoin.BroadcastMaxBytesKey, "20m")
      graft.pipeline.Dedup.minhashLshPairs(
        longDocs, "doc_id", "text", threshold = 0.5)
        .queryExecution.executedPlan.toString
    } finally savedCap match {
      case Some(v) => spark.conf.set(
        graft.pipeline.VerifyJoin.BroadcastMaxBytesKey, v)
      case None => spark.conf.unset(
        graft.pipeline.VerifyJoin.BroadcastMaxBytesKey)
    }
    assert(flipped.contains("ShuffledHashJoin") &&
      !flipped.contains("SortMergeJoin"), flipped.take(400))
    // the short-doc control at the same hint-lessness stays broadcast
    // (600 docs x ~1.9 KB sampled = ~1 MB)
    val control = graft.pipeline.Dedup.minhashLshPairs(
      shortDocs, "doc_id", "text", threshold = 0.5)
      .queryExecution.executedPlan.toString
    assert(control.contains("BroadcastHashJoin") &&
      !control.contains("SortMergeJoin"), control.take(400))
  }

  /** Collect every WARN-or-above log message emitted while `body` runs
    * (a capture appender on the log4j2 root logger — the
    * EventStreamingSpec pattern). */
  private def capturedWarns(body: => Unit): Seq[String] = {
    import org.apache.logging.log4j.LogManager
    val ctx = LogManager.getContext(false)
      .asInstanceOf[org.apache.logging.log4j.core.LoggerContext]
    val msgs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val app = new org.apache.logging.log4j.core.appender.AbstractAppender(
        "graft-plan-warn-capture", null, null, true,
        org.apache.logging.log4j.core.config.Property.EMPTY_ARRAY) {
      override def append(e: org.apache.logging.log4j.core.LogEvent): Unit =
        msgs.add(e.getMessage.getFormattedMessage)
    }
    app.start()
    val root = ctx.getConfiguration.getRootLogger
    root.addAppender(app, org.apache.logging.log4j.Level.WARN, null)
    ctx.updateLoggers()
    try body finally {
      root.removeAppender("graft-plan-warn-capture")
      ctx.updateLoggers()
      app.stop()
    }
    scala.jdk.CollectionConverters.IteratorHasAsScala(msgs.iterator())
      .asScala.toSeq
  }

  test("candidate-volume advisory: WARN at x100-shaped inputs, silence at sf0.1 shape") {
    // r18 verdict task 6: the documented single-JVM spill boundary
    // (exact verify at x100 needed SPARK_DRIVER_MEM=24g) becomes
    // observable AT THE OPERATOR — one plan-build WARN naming the
    // shortlist knob — instead of only in docs. The estimator itself:
    // x100 shape (200k vectors, 11 auto bits) sits past the bar, the
    // x32 shape (64k, 9 bits — ran clean on the 8g default) under it.
    val bar = graft.pipeline.Similarity.SingleJvmSpillAdvisoryBytes.toDouble
    assert(graft.pipeline.Similarity.expectedVerifyBytes(
      200000L, 11, 16, 4L, 64) > bar)
    assert(graft.pipeline.Similarity.expectedVerifyBytes(
      64000L, 9, 16, 4L, 64) < bar)
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    def planWarns(knownCount: Long, shortlist: Int): Seq[String] =
      capturedWarns {
        graft.pipeline.Similarity.lshNearDupPairs(
          emb, "vec_id", "embedding", topPairs = 50, dim = 64,
          knownCount = knownCount, shortlist = shortlist)
          .queryExecution.executedPlan
      }.filter(_.contains("single-JVM spill regime"))
    assert(planWarns(200000L, graft.pipeline.Similarity.NoShortlist).nonEmpty,
      "the x100 shape must advise at plan-build")
    assert(planWarns(2000L, graft.pipeline.Similarity.NoShortlist).isEmpty,
      "the sf0.1 shape must stay silent")
    assert(planWarns(200000L, graft.pipeline.Similarity.AutoShortlist).isEmpty,
      "taking the advised escape hatch silences the advisory")
  }

  test("SemDedup.edges verify joins: broadcast under the threshold, shuffled-hash past it") {
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val model = graft.pipeline.IVF.train(emb, "vec_id", "embedding", k = 4)
    def joins(knownCount: Long): String =
      graft.pipeline.SemDedup.edges(
        emb, "vec_id", "embedding", model, tau = 0.9,
        knownCount = knownCount)
        .queryExecution.executedPlan.toString
    val small = joins(knownCount = 1000) // 264 KB of vectors: broadcasts
    assert(small.contains("BroadcastHashJoin") &&
      !small.contains("SortMergeJoin"), small.take(400))
    // r21 broadcast tier: the x100-shaped vector table (200k x 264 B
    // ~= 53 MB) broadcasts; the candidate stream never shuffles
    val mid = joins(knownCount = 200000)
    assert(mid.contains("BroadcastHashJoin") &&
      !mid.contains("ShuffledHashJoin") && !mid.contains("SortMergeJoin"),
      mid.take(400))
    val big = joins(knownCount = 10000000) // 2.6 GB of vectors: hash-builds
    assert(big.contains("ShuffledHashJoin") &&
      !big.contains("SortMergeJoin"), big.take(400))
  }

  test("sampled shingle width is memoized per corpus: one sample job across operator calls") {
    // r19 verdict task 2: the default (no-hint) path paid the width
    // sample once per OPERATOR CALL — the round's one measured
    // regression (the dedup bench family 1.4-1.7x). The width is a
    // property of the corpus: two calls over the same corpus — even
    // through two SEPARATELY built reads of the same path — must run
    // exactly one sample job; a different corpus runs its own.
    import org.apache.spark.sql.functions._
    def freshRead() = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val before = graft.pipeline.VerifyJoin.widthSampleJobs.get()
    val w1 = graft.pipeline.VerifyJoin.sampledShingleRowBytes(freshRead(), "text", 3)
    graft.pipeline.Dedup.minhashLshPairs(
      freshRead(), "doc_id", "text", threshold = 0.5)
      .queryExecution.executedPlan
    graft.pipeline.Dedup.minhashLshPairs(
      freshRead(), "doc_id", "text", threshold = 0.5)
      .queryExecution.executedPlan
    val w2 = graft.pipeline.VerifyJoin.sampledShingleRowBytes(freshRead(), "text", 3)
    assert(graft.pipeline.VerifyJoin.widthSampleJobs.get() - before <= 1,
      "same corpus, four width resolutions -> at most one sample job")
    assert(w1 === w2, "memoized width must be the measured one")
    // a DIFFERENT corpus (different plan) runs its own sample
    val other = spark.range(50).select(
      col("id").as("doc_id"),
      concat_ws(" ", lit("a"), lit("b"), lit("c"), col("id").cast("string"))
        .as("text"))
    val b2 = graft.pipeline.VerifyJoin.widthSampleJobs.get()
    graft.pipeline.VerifyJoin.sampledShingleRowBytes(other, "text", 3)
    assert(graft.pipeline.VerifyJoin.widthSampleJobs.get() - b2 === 1)
    // ... and a different n over the SAME corpus is a different key
    // (the width genuinely differs with the shingle order)
    val b3 = graft.pipeline.VerifyJoin.widthSampleJobs.get()
    graft.pipeline.VerifyJoin.sampledShingleRowBytes(freshRead(), "text", 5)
    assert(graft.pipeline.VerifyJoin.widthSampleJobs.get() - b3 === 1)
  }

  test("sizeAwareBuild broadcast tier: threshold < estimate <= cap hints broadcast") {
    import org.apache.spark.sql.catalyst.plans.logical.UnresolvedHint
    val payload = spark.range(10).toDF("id")
    def hintOf(est: Option[Long]): Option[String] =
      graft.pipeline.VerifyJoin.sizeAwareBuild(payload, est)
        .queryExecution.logical.collectFirst {
          case h: UnresolvedHint => h.name
        }
    val savedT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (10L << 20).toString)
      assert(hintOf(Some(5L << 20)).isEmpty, "under threshold: Spark decides")
      assert(hintOf(Some(53L << 20)).contains("broadcast"),
        "threshold < est <= 256 MiB default cap: broadcast tier")
      assert(hintOf(Some(300L << 20)).contains("shuffle_hash"),
        "past the default cap: shuffled hash")
      // the cap is a session conf (deployments size it to their executors)
      spark.conf.set(graft.pipeline.VerifyJoin.BroadcastMaxBytesKey, "512m")
      assert(hintOf(Some(300L << 20)).contains("broadcast"))
      spark.conf.set(graft.pipeline.VerifyJoin.BroadcastMaxBytesKey, "0")
      assert(hintOf(Some(53L << 20)).contains("shuffle_hash"),
        "cap 0 disables the tier: the pre-r21 two-tier ladder")
      spark.conf.unset(graft.pipeline.VerifyJoin.BroadcastMaxBytesKey)
      // broadcast disabled by the session: never broadcast-hint
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(hintOf(Some(53L << 20)).contains("shuffle_hash"),
        "a disabled broadcast threshold must keep the tier off")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedT)
      spark.conf.unset(graft.pipeline.VerifyJoin.BroadcastMaxBytesKey)
    }
  }

  test("sizeAwareBuild: a non-positive estimate never hints, even with broadcast disabled") {
    // r19 ADVICE: with autoBroadcastJoinThreshold < 0 (broadcast
    // disabled) the old predicate hinted shuffle_hash for ANY
    // Some(estimate) — including Some(0), which streaming callers used
    // as "never hint". sizeAwareBuild returns the payload UNCHANGED
    // (reference-equal) when it does not hint, so the contract is
    // directly observable.
    val payload = spark.range(10).toDF("id")
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      assert(graft.pipeline.VerifyJoin.sizeAwareBuild(payload, Some(0L)) eq payload,
        "zero estimate must not hint under a disabled threshold")
      assert(graft.pipeline.VerifyJoin.sizeAwareBuild(payload, None) eq payload,
        "no estimate must never hint")
      assert(!(graft.pipeline.VerifyJoin.sizeAwareBuild(payload, Some(1000L)) eq payload),
        "a real estimate under a disabled threshold hints (broadcast is off)")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (10L << 20).toString)
      assert(graft.pipeline.VerifyJoin.sizeAwareBuild(payload, Some(1000L)) eq payload,
        "an estimate under a positive threshold leaves Spark's broadcast choice alone")
      assert(!(graft.pipeline.VerifyJoin.sizeAwareBuild(payload, Some(100L << 20)) eq payload),
        "an estimate provably over the threshold hints")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("SemDedup LadderOptOut: no plan-build count job, no hint — the streaming exemption") {
    // r19 ADVICE: the streaming maintainers' knownCount = 0 spelling
    // relied on zero-estimate behavior that inverted under a disabled
    // broadcast threshold; the opt-out is now EXPLICIT (no estimate
    // reaches the ladder at all) and threshold-independent
    import org.apache.spark.sql.functions._
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val model = graft.pipeline.IVF.train(emb, "vec_id", "embedding", k = 4)
    // a poisoned lineage: any plan-build count() would throw loudly
    val poisoned = emb.filter(
      when(col("vec_id") >= 0, true).otherwise(
        raise_error(lit("plan-build job executed")).cast("boolean")))
    val saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // reaching the optimized plan at all IS the no-count-job pin (the
      // poisoned filter throws on any execution); no shuffle_hash hint
      // may appear in it — the r19 inversion hinted here
      val plan = graft.pipeline.SemDedup.edges(
        poisoned, "vec_id", "embedding", model, tau = 0.9,
        knownCount = graft.pipeline.SemDedup.LadderOptOut)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("shuffle_hash"), plan.take(400))
      // control: the old knownCount = 0 spelling routed Some(0) into the
      // ladder — the b > 0 guard now keeps even that from hinting
      val zero = graft.pipeline.SemDedup.edges(
        emb, "vec_id", "embedding", model, tau = 0.9, knownCount = 0L)
        .queryExecution.optimizedPlan.toString
      assert(!zero.contains("shuffle_hash"), zero.take(400))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)
  }

  test("SemDedup candidate-volume advisory: WARN past the spill bar, naming the k knob") {
    // r19 verdict task 5: the AuditedShortlist question answered at the
    // SemDedup ladder caller — the two-pass shortlist is a TOP-K device
    // and cannot apply to a threshold-gated edge set (the operator's
    // scaladoc carries the exemption), so the operator gets the
    // Similarity-style advisory instead, naming ITS escape hatch (k).
    // Estimator shape: n^2/(2k) candidates x the verify row width.
    val bar = graft.pipeline.Similarity.SingleJvmSpillAdvisoryBytes.toDouble
    assert(graft.pipeline.SemDedup.expectedVerifyBytes(
      1000000L, 16, 4L, 64) > bar, "1M vectors over 16 cells: past the bar")
    assert(graft.pipeline.SemDedup.expectedVerifyBytes(
      1000000L, 65536, 4L, 64) < bar,
      "the same corpus over 64k cells: the k knob divides the stream under it")
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val model = graft.pipeline.IVF.train(emb, "vec_id", "embedding", k = 4)
    def warns(knownCount: Long): Seq[String] = capturedWarns {
      graft.pipeline.SemDedup.edges(
        emb, "vec_id", "embedding", model, tau = 0.9,
        knownCount = knownCount).queryExecution.executedPlan
    }.filter(_.contains("single-JVM spill regime"))
    assert(warns(1000000L).nonEmpty, "x100-shaped corpus over 4 cells must advise")
    assert(warns(1000L).isEmpty, "the test-SF shape must stay silent")
    assert(warns(graft.pipeline.SemDedup.LadderOptOut).isEmpty,
      "the streaming opt-out is exempt: its candidate volume is bounded " +
        "by construction (batch x touched-cell residents)")
  }

  test("cosineNearDupPairs self-routes past the exact-tier bar (the slidingMerge dispatch)") {
    // r19 verdict task 7: the one remaining exact-tier scale hazard —
    // the O(n^2) self-join — dispatches to lshNearDupPairs above a
    // measured corpus size, with a WARN naming the switch; small
    // corpora (every test SF) keep the oracle-certified exact plan,
    // and maxExactRows = Long.MaxValue pins it at any size.
    import org.apache.spark.sql.functions._
    val emb = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    def planOf(knownCount: Long, maxExact: Long = graft.pipeline.Similarity.ExactTierMaxRows) =
      graft.pipeline.Similarity.cosineNearDupPairs(
        emb, "vec_id", "embedding", topPairs = 10,
        maxExactRows = maxExact, knownCount = knownCount)
        .queryExecution.optimizedPlan.toString
    // under the bar: the exact tier's n^2 range-condition join
    val exact = planOf(knownCount = 100)
    assert(exact.contains("id_a") && exact.contains("id_b"), exact.take(300))
    // past the bar: the LSH tier's bucket explode (no O(n^2) join), and
    // the WARN names the dispatch
    val ws = capturedWarns {
      val dispatched = planOf(knownCount = 100000)
      assert(dispatched.contains("hyperplanebuckets") ||
        dispatched.contains("HyperplaneBuckets") ||
        dispatched.contains("vid_a"), dispatched.take(400))
    }
    assert(ws.exists(_.contains("dispatching to lshNearDupPairs")))
    // the escape hatch pins exact at any claimed size, with no n job
    val pinned = planOf(knownCount = 100000, maxExact = Long.MaxValue)
    assert(pinned.contains("id_a") && pinned.contains("id_b"))
    // both tiers agree on a planted high-margin corpus through the
    // dispatch seam: same top pair either way
    val planted = spark.range(200).select(
      col("id").as("vec_id"),
      transform(sequence(lit(1), lit(16)), i =>
        when(col("id") === 7 || col("id") === 123,
          sin(i.cast("double")))
          .otherwise(sin(xxhash64(col("id"), i).cast("double")))
          .cast("float")).as("embedding"))
    val exactTop = graft.pipeline.Similarity.cosineNearDupPairs(
      planted, "vec_id", "embedding", topPairs = 1,
      maxExactRows = Long.MaxValue).collect().head
    val lshTop = graft.pipeline.Similarity.cosineNearDupPairs(
      planted, "vec_id", "embedding", topPairs = 1,
      maxExactRows = 10, knownCount = 200).collect().head
    assert((exactTop.getLong(1), exactTop.getLong(2)) === (7L, 123L))
    assert((lshTop.getLong(1), lshTop.getLong(2)) === (7L, 123L),
      "the dispatched tier must find the planted pair")
  }
}
