package graft.pipeline

import graft.expressions.SimHash64
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.GraftShim

/**
 * Deduplication operators for training-data pipelines, at four fidelity
 * levels: exact (hash), n-gram Jaccard (exact set similarity), MinHash+LSH
 * (approximate, sub-quadratic), SimHash (bit-fingerprint, sub-quadratic).
 *
 * Scale design notes (100 TB):
 *  - Nothing here ever materializes the O(n^2) pair space. Candidates come
 *    from equi-joins on shared shingles / LSH band buckets / SimHash chunks,
 *    which Spark executes as shuffled hash joins partitioned by the bucket
 *    key — each bucket's pairs are generated locally on one executor.
 *  - Hot buckets (a duplication flood landing in one band/chunk bucket) are
 *    the skew risk. The LSH tiers tile oversize buckets across tasks with
 *    exact recall ([[PairGen.allPairs]]) — a near-dup flood is precisely
 *    the input dedup exists for, so it is never silently dropped.
 *    `jaccardPairs` is the exception: its cap is a *semantic*
 *    document-frequency guard (stop-shingles carry almost no similarity
 *    signal but quadratic pair cost), documented in its contract.
 *  - All outputs are deterministic: pair ids ordered (a < b), ratios of
 *    exact integer counts.
 */
object Dedup {

  /** simhash64 as a Column (custom Catalyst expression). */
  def simhash64(tokens: Column): Column =
    GraftShim.column(SimHash64(GraftShim.expression(tokens)))

  /**
   * Exact duplicate groups by canonical fingerprint
   * (whitespace/case-normalized md5): one row per distinct fingerprint with
   * the kept doc id (min) and the duplicate count. Plain hash aggregation —
   * one shuffle on the 32-byte hash, map-side partial agg.
   */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    docs.select(
      TextAnalysis.fingerprint(col(textCol)).as("fingerprint"),
      col(idCol).as("doc_id"))
      .groupBy("fingerprint")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_docs"))
  }

  /**
   * Word-n-gram Jaccard near-duplicate pairs (a < b, jaccard >= threshold).
   * Candidate generation: docs sharing at least one *sub-cap* shingle.
   * Shingles with document frequency > `maxShingleDf` are excluded from BOTH
   * candidate generation and the shared-shingle count (the skew guard drops
   * their buckets whole), while pair-size denominators count all shingles —
   * so under heavy duplication the reported jaccard is an underestimate, and
   * a pair whose shared shingles are ALL above the cap is missed entirely.
   * With `maxShingleDf` >= the corpus's max shingle DF the result is exact;
   * for exact verification of candidates regardless of the cap, rerank with
   * `array_intersect` on full shingle sets as [[minhashLshPairs]] does.
   *
   * Plan shape: ONE scan (shingle counts ride along through the explode) ->
   * one shuffle by shingle with bucket-local pair generation ([[PairGen]])
   * -> one shuffle by (a, b, sizes) counting shared shingles -> ratio
   * filter. Both shuffle keys grow with data; no driver-side work.
   */
  def jaccardPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      n: Int = 3,
      maxShingleDf: Int = 1000): DataFrame = {
    // ONE scan of the docs table serves the whole plan: each doc's shingle
    // count rides along through the explode and the bucket-local pair
    // generation, so the Jaccard denominator needs no second scan / join of
    // the shingle subtree. One shuffle by shingle, one by (pair, sizes) —
    // sizes are functionally dependent on the ids, so widening the group-by
    // key changes nothing semantically.
    val exploded = docs.select(
      col(idCol).as("doc_id"),
      TextAnalysis.wordShingles(col(textCol), n).as("shingles"))
      .select($"doc_id", size($"shingles").as("nsh"), explode($"shingles").as("shingle"))

    // Buckets over `maxShingleDf` docs are dropped whole (skew guard: they
    // contribute quadratic pair cost and near-zero similarity signal).
    val buckets = PairGen.buckets(
      exploded, Seq($"shingle"), struct($"doc_id", $"nsh"), maxShingleDf)

    val pairs = PairGen.explodePairs(buckets, "xs", "pa", "pb")
      .select($"pa.doc_id".as("doc_a"), $"pb.doc_id".as("doc_b"),
        $"pa.nsh".as("size_a"), $"pb.nsh".as("size_b"))

    pairs
      .groupBy($"doc_a", $"doc_b", $"size_a", $"size_b")
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("jaccard",
        $"n_shared".cast("double") /
          ($"size_a" + $"size_b" - $"n_shared").cast("double"))
      .filter($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", $"jaccard")
  }

  /**
   * Word-n-gram CONTAINMENT pairs: directed near-inclusion,
   * |A ∩ B| / |A| >= threshold with A the SMALLER shingle set — catches a
   * document embedded inside a larger one (quoted articles, page wrappers
   * around syndicated text, prompt templates around payloads), which
   * symmetric Jaccard structurally misses: a doc fully contained in one
   * 10x its size has containment 1.0 but Jaccard <= 0.1 and never crosses
   * a Jaccard dedup bar. Output: (doc_small, doc_big, containment) where
   * doc_small's shingles are >= threshold covered by doc_big's (ties in
   * size keep id order). Same skew-guard fine print as [[jaccardPairs]]:
   * shingles with document frequency > `maxShingleDf` are dropped whole
   * from candidate generation and the shared count, so reported
   * containment is an underestimate under heavy duplication.
   *
   * Plan shape: IDENTICAL to [[jaccardPairs]] — one scan, one shuffle by
   * shingle with bucket-local pair generation, one shuffle by (pair,
   * sizes) — only the final ratio differs (min size instead of union).
   */
  def containmentPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      n: Int = 3,
      maxShingleDf: Int = 1000): DataFrame = {
    val exploded = docs.select(
      col(idCol).as("doc_id"),
      TextAnalysis.wordShingles(col(textCol), n).as("shingles"))
      .select($"doc_id", size($"shingles").as("nsh"), explode($"shingles").as("shingle"))

    val buckets = PairGen.buckets(
      exploded, Seq($"shingle"), struct($"doc_id", $"nsh"), maxShingleDf)

    val pairs = PairGen.explodePairs(buckets, "xs", "pa", "pb")
      .select($"pa.doc_id".as("doc_a"), $"pb.doc_id".as("doc_b"),
        $"pa.nsh".as("size_a"), $"pb.nsh".as("size_b"))

    pairs
      .groupBy($"doc_a", $"doc_b", $"size_a", $"size_b")
      .agg(count(lit(1)).as("n_shared"))
      .withColumn("containment",
        $"n_shared".cast("double") / least($"size_a", $"size_b").cast("double"))
      .filter($"containment" >= threshold)
      .select(
        when($"size_a" < $"size_b", $"doc_a")
          .when($"size_b" < $"size_a", $"doc_b")
          .otherwise(least($"doc_a", $"doc_b")).as("doc_small"),
        when($"size_a" < $"size_b", $"doc_b")
          .when($"size_b" < $"size_a", $"doc_a")
          .otherwise(greatest($"doc_a", $"doc_b")).as("doc_big"),
        $"containment")
  }

  /**
   * MinHash signature: `numHashes` permutation-min values over the doc's
   * shingle set, as a single-pass native expression
   * ([[graft.expressions.MinHashSignature]]) that is bit-identical to the
   * composed built-in spelling
   * `array_min(transform(sh, s => xxhash64(s, seed, i)))` per element i —
   * same hash family, ~numHashes× less per-shingle work.
   */
  def minhashSignature(shingles: Column, numHashes: Int, seed: Long = 42L): Column =
    GraftShim.column(graft.expressions.MinHashSignature(
      GraftShim.expression(shingles), numHashes, seed))

  /** Stages 1-2 of [[minhashLshPairs]] from a prepared (doc_id, shingles)
    * frame: band the MinHash signature, shuffle once by (band, bandHash),
    * stream candidate ID pairs out of each bucket, dedupe multi-band
    * collisions. Shared with [[minhashLshCandidates]] so the diagnostic
    * cannot drift from the operator. */
  private def lshCandidatesFrom(
      withShingles: DataFrame,
      numHashes: Int,
      bands: Int,
      seed: Long,
      maxBucket: Int,
      hardMaxBucket: Int): DataFrame = {
    val rowsPerBand = numHashes / bands
    val sig = withShingles.select(
      $"doc_id", $"shingles",
      minhashSignature($"shingles", numHashes, seed).as("sig"))

    // one scan -> one shuffle by (band, bandHash); pairs generated inside
    // each bucket from the collected sorted id list (no self-join). The
    // signature is bound once per row before the 8-way band fan-out.
    val banded = sig.select(
      $"doc_id",
      explode(TextAnalysis.bindOnce($"sig") { s =>
        array((0 until bands).map { b =>
          struct(lit(b).as("band"),
            xxhash64(slice(s, b * rowsPerBand + 1, rowsPerBand)).as("bh"))
        }: _*)
      }).as("bk"))
      .select($"doc_id", $"bk.band", $"bk.bh")

    // Hot-bucket handling: a band bucket of b docs carries b^2/2 candidate
    // pairs — a duplication flood, the case dedup exists for. Buckets past
    // `maxBucket` are TILED (recall-preserving, work spread across tasks;
    // see [[PairGen.allPairs]]), never dropped; `hardMaxBucket` is the
    // explicit opt-in bound for callers that prefer bounded work.
    PairGen.allPairs(
      banded, Seq($"band", $"bh"), $"doc_id", maxBucket,
      "doc_a", "doc_b", hardMaxBucket)
      .distinct()
  }

  /** The DISTINCT candidate-pair table of [[minhashLshPairs]] before any
    * shingle set is joined back — [[Similarity.lshCandidatePairs]]'s
    * sibling, exposed so the bench's x100 tier can record candidate
    * volume for the dedup family directly (candidates/input staying
    * ~flat across corpus growth means the band scheme is holding, and
    * the timed slope is verify-side work). */
  private[graft] def minhashLshCandidates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      n: Int = 3,
      seed: Long = 42L,
      maxBucket: Int = 10000,
      hardMaxBucket: Int = Int.MaxValue): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val withShingles = docs.select(
      col(idCol).as("doc_id"),
      TextAnalysis.wordShingles(col(textCol), n).as("shingles"))
      .filter(size($"shingles") > 0)
    lshCandidatesFrom(withShingles, numHashes, bands, seed, maxBucket,
      hardMaxBucket)
  }

  /**
   * MinHash + LSH near-duplicate pairs: signatures banded into
   * `bands` groups of `rowsPerBand`; docs colliding in any band become
   * candidates; candidates are verified with *exact* n-gram Jaccard and
   * filtered at `threshold`.
   *
   * Sub-quadratic: candidate generation is an equi-join on (band index,
   * band hash). Probability a pair at jaccard j collides somewhere:
   * 1-(1-j^rows)^bands — with 8 bands x 4 rows, j=0.7 is caught w.p. ~0.97,
   * j=0.3 w.p. ~0.06.
   *
   * Verify-join strategy (the [[Similarity.lshNearDupPairs]] ladder,
   * shared via [[VerifyJoin]]): the candidate table's stats are
   * generator-underestimated, so the shingle-set fetch joins decide
   * their build side from the CORPUS COUNT — under the broadcast
   * threshold the sets side broadcasts (Spark's own choice, unhinted);
   * provably over it the sets side is hinted `shuffle_hash` so the
   * candidate stream is never sorted.
   *
   * Cost note (plan-build jobs): a caller that passes NEITHER
   * `knownCount` nor `setRowBytes` pays two bounded jobs at plan-build —
   * a count() over `docs` (a cheap metadata count for a raw parquet
   * scan, but a FULL re-execution of the upstream for a derived plan;
   * such callers should persist first or pass `knownCount` — when the
   * optimizer already carries a row-count statistic it is used and the
   * count job is skipped, an estimate being exactly enough for a join
   * regime) and a [[VerifyJoin.sampledShingleRowBytes]] sample
   * (LocalLimit over 256 docs) that MEASURES the per-document
   * shingle-set build-row width, so a long-document corpus (1k+ tokens,
   * ~20 KB of shingles per doc) flips its verify-join regime with no
   * caller hint. Passing `knownCount` is a promise of ZERO plan-build
   * jobs: the width sample is skipped too and
   * [[VerifyJoin.ShingleSetRowBytes]] stands in — long-document corpora
   * on that path should pass their own `setRowBytes`. A wrong width
   * only ever trades broadcast vs shuffled-hash near the boundary
   * (both measured within ~25%), never a candidate-stream sort.
   */
  def minhashLshPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      threshold: Double,
      numHashes: Int = 32,
      bands: Int = 8,
      n: Int = 3,
      seed: Long = 42L,
      maxBucket: Int = 10000,
      hardMaxBucket: Int = Int.MaxValue,
      knownCount: Long = -1L,
      setRowBytes: Long = VerifyJoin.AutoRowBytes): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    require(setRowBytes == VerifyJoin.AutoRowBytes || setRowBytes >= 1L,
      s"setRowBytes must be AutoRowBytes (-1) or >= 1, got $setRowBytes")
    val nDocs =
      if (knownCount >= 0) knownCount
      else docs.queryExecution.optimizedPlan.stats.rowCount
        .map(_.toLong)
        .getOrElse(docs.count())
    val rowBytes =
      if (setRowBytes != VerifyJoin.AutoRowBytes) setRowBytes
      else if (knownCount >= 0) VerifyJoin.ShingleSetRowBytes
      else VerifyJoin.sampledShingleRowBytes(docs, textCol, n)

    val withShingles = docs.select(
      col(idCol).as("doc_id"),
      TextAnalysis.wordShingles(col(textCol), n).as("shingles"))
      .filter(size($"shingles") > 0)

    val candidates = lshCandidatesFrom(withShingles, numHashes, bands,
      seed, maxBucket, hardMaxBucket)

    // exact-Jaccard verification of candidates only; build side decided
    // from the corpus count (see the contract above)
    val sets = withShingles.select($"doc_id", $"shingles")
    val setBytes = Some(nDocs * rowBytes)
    def side(named: DataFrame): DataFrame =
      VerifyJoin.sizeAwareBuild(named, setBytes)
    candidates
      .join(side(sets.select($"doc_id".as("doc_a"), $"shingles".as("sh_a"))), "doc_a")
      .join(side(sets.select($"doc_id".as("doc_b"), $"shingles".as("sh_b"))), "doc_b")
      .withColumn("n_shared", size(array_intersect($"sh_a", $"sh_b")))
      .withColumn("jaccard",
        $"n_shared".cast("double") /
          (size($"sh_a") + size($"sh_b") - $"n_shared").cast("double"))
      .filter($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", $"jaccard")
  }

  /**
   * SimHash near-duplicate pairs at Hamming distance <= maxDist (default 3).
   * Blocking: the 64-bit fingerprint is cut into `maxDist + 1` chunks — any
   * pair within maxDist agrees exactly on at least one chunk (pigeonhole),
   * so recall is exact; candidates are equi-joined per (chunk index, chunk
   * value) and verified with `bit_count(a ^ b)` (built-in, codegen'd).
   */
  /**
   * The pigeonhole chunk array for a SimHash fingerprint: `maxDist + 1`
   * (chunk index, chunk value) structs. Any pair within `maxDist` Hamming
   * distance agrees exactly on at least one chunk. Shared by the batch
   * ([[simhashPairs]]) and streaming
   * ([[graft.streaming.TopnStreaming.streamingNearDupPairs]]) tiers so the
   * blocking scheme cannot drift between them.
   */
  def simhashChunks(sh: Column, maxDist: Int): Column = {
    require(maxDist >= 1 && maxDist <= 7, s"maxDist must be in [1, 7], got $maxDist")
    val chunks = maxDist + 1
    val bits = 64 / chunks
    array((0 until chunks).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(sh, c * bits).bitwiseAND(lit((1L << bits) - 1)).as("cv"))
    }: _*)
  }

  def simhashPairs(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3,
      maxBucket: Int = 10000,
      hardMaxBucket: Int = Int.MaxValue): DataFrame =
    fingerprintPairs(
      docs.select(
        col(idCol).as("doc_id"),
        simhash64(TextAnalysis.tokens(col(textCol))).as("sh")),
      "doc_id", "sh", maxDist, maxBucket, hardMaxBucket)

  /**
   * Near-duplicate pairs over PRECOMPUTED 64-bit fingerprints — the engine
   * behind [[simhashPairs]], exposed so any 64-bit locality-sensitive hash
   * plugs into the same exact-recall pigeonhole blocking: text SimHash,
   * image dHash ([[Multimodal.imageDHash]]), audio chromaprints, ...
   * Output: (doc_a, doc_b, hamming) with doc_a < doc_b by the id column's
   * ordering, hamming <= maxDist.
   */
  def fingerprintPairs(
      hashed: DataFrame,
      idCol: String,
      hashCol: String,
      maxDist: Int = 3,
      maxBucket: Int = 10000,
      hardMaxBucket: Int = Int.MaxValue): DataFrame = {
    val src = hashed.select(col(idCol).as("doc_id"), col(hashCol).as("sh"))
    val blocked = src.select(
      $"doc_id", $"sh", explode(simhashChunks($"sh", maxDist)).as("bk"))
      .select($"doc_id", $"sh", $"bk.chunk", $"bk.cv")

    // one shuffle by (chunk, chunkValue); pairs generated inside buckets.
    // Hot chunk buckets are tiled, not dropped (see [[PairGen.allPairs]]).
    PairGen.allPairs(
      blocked, Seq($"chunk", $"cv"), struct($"doc_id", $"sh"), maxBucket,
      "pa", "pb", hardMaxBucket)
      .select($"pa.doc_id".as("doc_a"), $"pb.doc_id".as("doc_b"),
        bit_count($"pa.sh".bitwiseXOR($"pb.sh")).as("hamming"))
      .filter($"hamming" <= maxDist)
      .distinct()
  }

  /**
   * DAILY-INGEST near-dup candidate generation: pairs between a NEW batch
   * of fingerprints and a persisted fingerprint STORE — plus new-vs-new —
   * with old-vs-old never recomputed. This is the batch-incremental
   * counterpart of [[graft.streaming.TopnStreaming.streamingNearDupPairs]]
   * and the missing front half of the incremental clustering loop: feed
   * the output to [[Clustering.incrementalUpdate]] and append `newFps` to
   * the store, and a daily ingest maintains exact near-dup clusters while
   * touching only new-batch-sized fingerprint work.
   *
   * Same exact-recall pigeonhole scheme as [[fingerprintPairs]] (any pair
   * within `maxDist` agrees on one of the `maxDist + 1` chunks), but the
   * candidate step is an EQUI-JOIN of the new side's chunks against both
   * sides' chunks rather than in-bucket pair generation — work scales
   * with |new| x bucket occupancy, not |store|². The store side is
   * typically orders of magnitude larger; the join shuffles both sides by
   * (chunk, value) once and AQE handles skewed chunk values like any hot
   * join key.
   *
   * `newFps` and `storeFps` are (id, fingerprint) frames; ids must be
   * globally unique across BOTH (a store row reappearing in the new batch
   * would pair with itself at distance 0). Output: (doc_a, doc_b,
   * hamming), doc_a < doc_b, each pair once, containing at least one new
   * id — exactly the pairs `fingerprintPairs(store ∪ new)` would emit
   * beyond those among the store alone (a property the tests pin).
   */
  def incrementalFingerprintPairs(
      newFps: DataFrame,
      storeFps: DataFrame,
      idCol: String,
      hashCol: String,
      maxDist: Int = 3): DataFrame = {
    val newBlk = newFps
      .select(col(idCol).as("doc_id"), col(hashCol).as("sh"),
        lit(true).as("is_new"))
    val oldBlk = storeFps
      .select(col(idCol).as("doc_id"), col(hashCol).as("sh"),
        lit(false).as("is_new"))
    def blocked(df: DataFrame, p: String) = df
      .select(col("doc_id").as(s"${p}_id"), col("sh").as(s"${p}_sh"),
        col("is_new").as(s"${p}_new"),
        explode(simhashChunks(col("sh"), maxDist)).as("bk"))
      .select(col(s"${p}_id"), col(s"${p}_sh"), col(s"${p}_new"),
        col("bk.chunk").as("chunk"), col("bk.cv").as("cv"))

    blocked(newBlk, "a")
      .join(blocked(oldBlk.unionByName(newBlk), "b"), Seq("chunk", "cv"))
      // each unordered pair once: vs the store always (store ids are never
      // on the left), among the new batch only in id order
      .filter((!col("b_new") && col("a_id") =!= col("b_id")) ||
        (col("b_new") && col("a_id") < col("b_id")))
      .select(
        least(col("a_id"), col("b_id")).as("doc_a"),
        greatest(col("a_id"), col("b_id")).as("doc_b"),
        bit_count(col("a_sh").bitwiseXOR(col("b_sh"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }

  /**
   * Prepared MinHash store rows — the persisted form of a document for
   * the banded-MinHash ingest loop: one row per doc carrying its LSH
   * band keys (the blocking state) AND its distinct shingle set (the
   * exact-verification state), computed ONCE when the doc first arrives.
   * This is the [[incrementalFingerprintPairs]] fingerprint-store
   * pattern with band keys in place of pigeonhole chunks: the streaming
   * path appends each deduplicated batch's rows to the store and never
   * re-tokenizes old documents. Output: (doc_id, shingles, bands) with
   * `bands` an array of (band, bh) structs; docs with no shingles
   * (< n tokens) are absent, mirroring [[minhashLshPairs]].
   */
  def minhashStoreRows(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 32,
      bands: Int = 8,
      n: Int = 3,
      seed: Long = 42L): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rowsPerBand = numHashes / bands
    docs
      .select(col(idCol).as("doc_id"),
        TextAnalysis.wordShingles(col(textCol), n).as("shingles"))
      .filter(size($"shingles") > 0)
      .select($"doc_id", $"shingles",
        TextAnalysis.bindOnce(minhashSignature($"shingles", numHashes, seed)) { s =>
          array((0 until bands).map { b =>
            struct(lit(b).as("band"),
              xxhash64(slice(s, b * rowsPerBand + 1, rowsPerBand)).as("bh"))
          }: _*)
        }.as("bands"))
  }

  /**
   * DAILY-INGEST banded-MinHash near-dup pairs: exact-Jaccard pairs at
   * `>= threshold` between a NEW batch of [[minhashStoreRows]] and the
   * persisted store — plus new-vs-new — with old-vs-old never
   * recomputed. The streaming counterpart of [[minhashLshPairs]] the way
   * [[incrementalFingerprintPairs]] is of [[fingerprintPairs]]: run it
   * per micro-batch (foreachBatch), feed the pairs to
   * [[graft.streaming.TopnStreaming.clusterBatch]], append the batch's
   * rows to the store, and the stream maintains exactly the clusters the
   * batch operator would compute over everything seen — StreamingSpec
   * pins emitted pairs == `minhashLshPairs(store ∪ new)` restricted to
   * pairs touching a new id, each pair exactly once across the stream's
   * lifetime.
   *
   * Scale shape: the candidate step is an EQUI-JOIN of the new side's
   * band keys against both sides' keys — work scales with |new| × band
   * bucket occupancy, not |store|²; the store is never re-tokenized or
   * re-hashed (its rows carry bands + shingles from ingest time). The
   * verify join fetches only candidate docs' shingle sets by id. Ids
   * must be globally unique across both frames.
   *
   * (No [[VerifyJoin]] ladder here, deliberately: the pathology that
   * ladder prevents — a corpus-scale candidate stream sorted by a
   * sort-merge fallback — cannot arise in the incremental shape, where
   * candidates are NEW-BATCH-sized by construction. The stats ladder
   * under `preferSortMergeJoin=false` broadcasts the small candidate
   * side on its own, and a per-micro-batch count() of the store to feed
   * the ladder would be pure overhead on the hot path.)
   */
  def incrementalMinhashPairs(
      newRows: DataFrame,
      storeRows: DataFrame,
      threshold: Double): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0, 1], got $threshold")
    Seq("new" -> newRows, "store" -> storeRows).foreach { case (side, df) =>
      require(Seq("doc_id", "shingles", "bands").forall(df.columns.contains),
        s"$side side is not a minhashStoreRows frame (need doc_id, " +
          s"shingles, bands; got ${df.columns.mkString(", ")})")
    }
    val newTagged = newRows
      .select($"doc_id", $"shingles", $"bands", lit(true).as("is_new"))
    val allTagged = storeRows
      .select($"doc_id", $"shingles", $"bands", lit(false).as("is_new"))
      .unionByName(newTagged)
    def blocked(df: DataFrame, p: String) = df
      .select(col("doc_id").as(s"${p}_id"), col("is_new").as(s"${p}_new"),
        explode(col("bands")).as("bk"))
      .select(col(s"${p}_id"), col(s"${p}_new"),
        $"bk.band".as("band"), $"bk.bh".as("bh"))
    // each unordered pair once: vs the store always (store ids are never
    // on the left), among the new batch only in id order
    val candidates = blocked(newTagged, "a")
      .join(blocked(allTagged, "b"), Seq("band", "bh"))
      .filter((!col("b_new") && col("a_id") =!= col("b_id")) ||
        (col("b_new") && col("a_id") < col("b_id")))
      .select(least($"a_id", $"b_id").as("doc_a"),
        greatest($"a_id", $"b_id").as("doc_b"))
      .distinct()
    // exact-Jaccard verification of candidates only, sets fetched by id
    val sets = allTagged.select($"doc_id", $"shingles")
    candidates
      .join(sets.select($"doc_id".as("doc_a"), $"shingles".as("sh_a")), "doc_a")
      .join(sets.select($"doc_id".as("doc_b"), $"shingles".as("sh_b")), "doc_b")
      .withColumn("n_shared", size(array_intersect($"sh_a", $"sh_b")))
      .withColumn("jaccard",
        $"n_shared".cast("double") /
          (size($"sh_a") + size($"sh_b") - $"n_shared").cast("double"))
      .filter($"jaccard" >= threshold)
      .select($"doc_a", $"doc_b", $"jaccard")
  }

  /**
   * Test-set decontamination check: for every training document, count the
   * distinct word-n-gram shingles it shares with ANY held-out/test document
   * (and how many distinct test docs it collides with). Standard LLM
   * hygiene — a training doc sharing long n-grams with the eval set leaks
   * the benchmark into the model.
   *
   * Returns (doc_id, n_shared_shingles, n_test_docs) for training docs with
   * at least one collision.
   *
   * Scale shape: both sides explode to (doc, shingle) and meet in an
   * equi-join ON the shingle — shuffled hash join partitioned by shingle,
   * then one aggregation by training doc. The test side is typically tiny
   * (an eval benchmark), so AQE broadcasts it and the whole check is
   * map-side. `maxShingleDf` guards the join against stop-shingles shared
   * by everything: shingles appearing in more than that many TEST docs are
   * dropped (they carry no contamination signal but quadratic join cost).
   * The guard re-reads the test side to compute shingle DFs (two scans of
   * the SMALL side — deliberate; the training side is scanned once).
   */
  def contamination(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      maxShingleDf: Int = Int.MaxValue): DataFrame = {
    def shingled(df: DataFrame, idAs: String) = df.select(
      col(idCol).as(idAs),
      explode(TextAnalysis.wordShingles(col(textCol), n)).as("shingle"))

    val testSh = shingled(test, "test_id")
    val guarded =
      if (maxShingleDf == Int.MaxValue) testSh
      else {
        val keep = testSh.groupBy($"shingle")
          .agg(count(lit(1)).as("df"))
          .filter($"df" <= maxShingleDf)
          .select($"shingle")
        testSh.join(keep, "shingle")
      }

    shingled(train, "doc_id")
      .join(guarded, "shingle")
      .groupBy($"doc_id")
      .agg(countDistinct($"shingle").as("n_shared_shingles"),
        countDistinct($"test_id").as("n_test_docs"))
  }

  /**
   * The REMOVAL composition on top of [[contamination]]: drop every
   * training document sharing more than `maxSharedShingles` distinct
   * n-gram shingles with the test/held-out set, pass everything else
   * through unchanged. This is the step pipelines actually run —
   * [[contamination]] reports, this enforces.
   *
   * Scale shape: the contamination stats (one shingle equi-join + one
   * aggregation; flagged-docs-sized output) feed a LEFT ANTI join back
   * on the id — AQE broadcasts the flag list when small, which it almost
   * always is (contaminated docs are the exception, not the corpus).
   */
  def removeContaminated(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      maxSharedShingles: Long = 0L,
      maxShingleDf: Int = Int.MaxValue): DataFrame = {
    require(maxSharedShingles >= 0L,
      s"maxSharedShingles must be >= 0, got $maxSharedShingles")
    require(!train.columns.contains("__graft_contam_id"),
      "input already has a '__graft_contam_id' column; rename it — " +
        "removeContaminated uses it internally")
    val flagged = contamination(train, test, idCol, textCol, n, maxShingleDf)
      .filter($"n_shared_shingles" > maxSharedShingles)
      .select($"doc_id".as("__graft_contam_id"))
    train.join(flagged, train(idCol) === col("__graft_contam_id"), "left_anti")
  }

  /**
   * Bloom-pruned anti join: the rows of `left` whose `keyCol` does NOT
   * appear in `right` — the exact anti-join answer, computed without
   * shuffling the unmatched bulk of `left`.
   *
   * The standard device for deduplicating a new ingest batch against an
   * EXISTING corpus: a plain `left_anti` join shuffles both sides in
   * full, but almost all of a typical batch matches nothing, so that
   * shuffle is waste. Here a Bloom filter built over `right`'s keys (one
   * scan, merged on the driver) is broadcast and applied as a map-side
   * filter; only the rows it cannot rule out — true matches plus an
   * `fpp` fraction of false positives — enter the verifying anti join.
   * Rows the filter rules out are appended back untouched (a Bloom
   * filter has NO false negatives), so the result is EXACT at any `fpp`:
   * the parameter trades verify-join volume against filter size, never
   * correctness.
   *
   * Scale shape (100 TB): one scan of `right` to build the filter, then
   *
   *  1. a KEY-PRUNED scan of `left` (just the probe's input columns)
   *     whose codegen'd in-scan filter ([[graft.expressions
   *     .BloomMightContain]] — a bit-array probe no built-in expresses,
   *     generated into the scan's whole-stage filter, no boxed UDF) lets
   *     only the `matches + fpp * |left|` flagged KEYS through to the
   *     verifying semi join against `right` — the confirmed-present key
   *     set, exact and matches-sized;
   *  2. ONE full-width scan of `left`, anti-joined against that bounded
   *     confirmed set — AQE broadcasts it in the common case (dups are
   *     the exception, not the batch), so the batch's payload bytes are
   *     read once and NEVER shuffled.
   *
   * (The tempting one-pass spelling — probe as a column, one anti join —
   * would shuffle every batch row to meet the reference keys, which is
   * the full anti-join shuffle the filter exists to prevent; paying a
   * second column-pruned scan of the probe inputs instead is the whole
   * trade. The verify semi join's RIGHT side is the reference key
   * column: the filter cannot prune it — every reference key is in the
   * filter by construction — so it is scanned once per batch and
   * shuffled, unless the reference fingerprints are maintained as a
   * table bucketed by key (the [[graft.sources.Tables]] rollup device),
   * which makes the ref side shuffle-free and leaves only the
   * flagged-keys shuffle. The filter itself is the bounded
   * driver/broadcast object: 1.44 · n · log2(1/fpp) bits — ~1.2 GB for
   * 10^9 keys at 1% — so for a 10^10-key reference raise `fpp` (the
   * verify join absorbs the extra false positives) or pre-partition
   * both sides and build per-partition filters. Size it with
   * `expectedRightItems`: an underestimate only degrades the filter
   * toward "might contain everything", which again costs shuffle, not
   * correctness.)
   */
  def bloomAntiJoin(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      expectedRightItems: Long,
      fpp: Double = 0.03): DataFrame = {
    require(expectedRightItems >= 1L,
      s"expectedRightItems must be >= 1, got $expectedRightItems")
    require(fpp > 0.0 && fpp < 1.0, s"fpp must be in (0, 1), got $fpp")
    require(left.schema(keyCol).dataType.typeName == "string" &&
      right.schema(keyCol).dataType.typeName == "string",
      s"bloomAntiJoin keys must be strings; cast or fingerprint first " +
        s"(got ${left.schema(keyCol).dataType.simpleString})")
    val spark = left.sparkSession
    val rightKeys = right.select(col(keyCol))
    // one scan of `right`: per-partition filters, tree-merged OR on the
    // way to the driver. (This is the shape stat.bloomFilter runs, spelled
    // directly so a zero-row reference yields an empty filter instead of
    // its NPE; the RDD hop is the imperative bit-array accumulation, not
    // row-wise logic.)
    val filter = rightKeys.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string"))
      .map(_.getString(0))(org.apache.spark.sql.Encoders.STRING)
      .rdd
      .treeAggregate(
        org.apache.spark.util.sketch.BloomFilter.create(expectedRightItems, fpp))(
        (bf, k) => { bf.putString(k); bf },
        (a, b) => { a.mergeInPlace(b); a })
    val bc = spark.sparkContext.broadcast(filter)
    val might = GraftShim.column(graft.expressions.BloomMightContain(
      GraftShim.expression(col(keyCol)), bc))
    // key-pruned probe scan -> flagged keys -> exact confirmed-present set
    val present = left.select(col(keyCol)).filter(might)
      .join(rightKeys, Seq(keyCol), "left_semi")
      .distinct()
    // the one full-width pass: anti join against the bounded confirmed set
    left.join(present, Seq(keyCol), "left_anti")
  }

  /**
   * Cross-corpus exact dedup: the `incoming` documents whose canonical
   * fingerprint ([[TextAnalysis.fingerprint]]) does not already occur in
   * `reference`, via [[bloomAntiJoin]]. Output: the incoming rows plus
   * their `fingerprint` column. This is [[exactGroups]]'s semantics
   * stretched across two corpora of very different sizes — the daily
   * front door of an ingest pipeline, where `reference` is the
   * accumulated corpus and `incoming` is today's crawl.
   */
  def crossCorpusDedup(
      incoming: DataFrame,
      reference: DataFrame,
      idCol: String,
      textCol: String,
      expectedRefItems: Long,
      fpp: Double = 0.03): DataFrame = {
    val fp = (d: DataFrame) => d.withColumn(
      "fingerprint", TextAnalysis.fingerprint(col(textCol)))
    bloomAntiJoin(fp(incoming), fp(reference).select(col("fingerprint")),
      "fingerprint", expectedRefItems, fpp)
  }

  private implicit class ColName(val sc: StringContext) {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
