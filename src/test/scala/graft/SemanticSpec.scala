package graft

import graft.pipeline.{IVF, LanguageModel, SemDedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Specs for the round-7 semantic operators: the bigram-LM quality signal
  * ([[LanguageModel]]) and SemDeDup-style semantic deduplication
  * ([[SemDedup]]). Both are cross-checked against independent Scala
  * reference implementations. */
class SemanticSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // --- LanguageModel ------------------------------------------------------

  private def toks(t: String): Seq[String] = t.trim.split("\\s+").toSeq

  /** Reference scorer: same fixed-point math, plain Scala collections.
    * Train counts come from `corpus`, scored docs are `docs` (may differ —
    * the foreign-doc path). */
  private def refScores(
      corpus: Seq[(Long, String)],
      docs: Seq[(Long, String)],
      alpha: Double = 1.0): Map[Long, (Long, Long, Long)] = {
    def bgs(t: String): Seq[(String, String)] = {
      val w = toks(t)
      if (w.length >= 2) w.zip(w.tail) else Nil
    }
    val all = corpus.flatMap { case (_, t) => bgs(t) }
    val c2 = all.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val c1 = all.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val v = corpus.flatMap { case (_, t) => toks(t) }.distinct.size
    docs.flatMap { case (id, t) =>
      val ps = bgs(t).map { bg =>
        val p = (c2.getOrElse(bg, 0L).toDouble + alpha) /
          (c1.getOrElse(bg._1, 0L).toDouble + alpha * v.toDouble) * 1.0e9
        math.floor(p).toLong
      }
      if (ps.isEmpty) None
      else Some(id -> (ps.size.toLong, ps.sum, ps.sum / ps.size))
    }.toMap
  }

  private val rng = new Random(7)
  private val phrases = Seq("the cat sat", "on the mat", "dogs bark loudly",
    "rain falls softly", "the end")
  private val corpus: Seq[(Long, String)] = (0L until 40L).map { i =>
    val n = 2 + rng.nextInt(4)
    (i, Seq.fill(n)(phrases(rng.nextInt(phrases.length))).mkString(" "))
  }

  test("scoreDocs matches the reference fixed-point scorer exactly (self-trained)") {
    val df = corpus.toDF("doc_id", "text")
    val model = LanguageModel.trainBigrams(df, "text")
    val got = LanguageModel.scoreDocs(df, "doc_id", "text", model)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, n, s, m) => id -> (n, s, m) }.toMap
    assert(got == refScores(corpus, corpus))
  }

  test("foreign docs degrade to the smoothing floor, never error") {
    val df = corpus.toDF("doc_id", "text")
    val model = LanguageModel.trainBigrams(df, "text")
    val foreign = Seq((100L, "completely novel wording here"),
      (101L, "the cat sat on the mat")) // mixed: seen + unseen bigrams
    val got = LanguageModel.scoreDocs(
      foreign.toDF("doc_id", "text"), "doc_id", "text", model)
      .as[(Long, Long, Long, Long)].collect()
      .map { case (id, n, s, m) => id -> (n, s, m) }.toMap
    assert(got == refScores(corpus, foreign))
    // all-unseen doc: every bigram sits at the alpha/(alpha*V) floor
    val v = corpus.flatMap { case (_, t) => toks(t) }.distinct.size
    val floorP = math.floor(1.0 / (0.0 + 1.0 * v) * 1.0e9).toLong
    assert(got(100L)._2 == 3 * floorP)
  }

  test("docs under 2 tokens have no bigrams and are absent from the output") {
    val df = (corpus :+ (200L, "single") :+ (201L, "")).toDF("doc_id", "text")
    val model = LanguageModel.trainBigrams(df, "text")
    val ids = LanguageModel.scoreDocs(df, "doc_id", "text", model)
      .select("doc_id").as[Long].collect().toSet
    assert(!ids.contains(200L) && !ids.contains(201L))
    assert(ids == corpus.map(_._1).toSet)
  }

  test("surpriseBits is -log2 of the mean probability and anti-monotone in it") {
    val df = corpus.toDF("doc_id", "text")
    val model = LanguageModel.trainBigrams(df, "text")
    val rows = LanguageModel.surpriseBits(
      LanguageModel.scoreDocs(df, "doc_id", "text", model))
      .select($"mean_p_e9", $"surprise_bits").as[(Long, Double)].collect()
    rows.foreach { case (m, bits) =>
      assert(math.abs(bits - (-math.log(m.max(1L).toDouble / 1.0e9) / math.log(2.0))) < 1e-9)
    }
    val sorted = rows.sortBy(_._1)
    sorted.zip(sorted.tail).foreach { case ((_, b1), (_, b2)) => assert(b1 >= b2) }
  }

  test("save/load round-trips the model and scores identically") {
    val df = corpus.toDF("doc_id", "text")
    val model = LanguageModel.trainBigrams(df, "text")
    val tmp = java.nio.file.Files.createTempDirectory("lm_model").toString
    LanguageModel.save(model, tmp)
    val loaded = LanguageModel.load(tmp, spark)
    val a = LanguageModel.scoreDocs(df, "doc_id", "text", model)
      .orderBy("doc_id").collect()
    val b = LanguageModel.scoreDocs(df, "doc_id", "text", loaded)
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
    // foreign layout fails fast instead of silently mis-scoring
    val bad = java.nio.file.Files.createTempDirectory("lm_bad").toString
    Seq("bigrams", "contexts", "vocab").foreach(d =>
      model.vocab.write.parquet(s"$bad/$d"))
    intercept[IllegalArgumentException](LanguageModel.load(bad, spark))
    // matching NAMES with drifted TYPES fails fast too (int-narrowed
    // counts would otherwise load silently and mis-score downstream)
    val drifted = java.nio.file.Files.createTempDirectory("lm_drift").toString
    model.bigrams.select($"bigram", $"c_bigram".cast("int").as("c_bigram"))
      .write.parquet(s"$drifted/bigrams")
    model.contexts.write.parquet(s"$drifted/contexts")
    model.vocab.write.parquet(s"$drifted/vocab")
    val e = intercept[IllegalArgumentException](LanguageModel.load(drifted, spark))
    assert(e.getMessage.contains("long counts"))
  }

  test("alpha must be positive") {
    val df = corpus.toDF("doc_id", "text")
    val model = LanguageModel.trainBigrams(df, "text")
    intercept[IllegalArgumentException](
      LanguageModel.scoreDocs(df, "doc_id", "text", model, alpha = 0.0))
  }

  // --- SemDedup -----------------------------------------------------------

  /** Planted corpus: 60 random unit-ish vectors plus noisy copies of the
    * first 10 (cosine > 0.999 within a copy group, far from tau=0.9). */
  private def plantedVectors(): Seq[(Long, Array[Float])] = {
    val r = new Random(11)
    def rand(): Array[Float] = Array.fill(16)(r.nextGaussian().toFloat)
    val base = (0L until 60L).map(i => (i, rand()))
    val copies = (0 until 10).flatMap { g =>
      val (gid, v) = base(g)
      (0 until 1 + g % 3).map { c =>
        (100L + g * 10 + c,
          v.map(x => x + (r.nextGaussian() * 1e-3).toFloat))
      }
    }
    base ++ copies
  }

  /** Reference: exact within-cell pairwise cosine + union-find, min label. */
  private def refLabels(
      rows: Seq[(Long, Array[Float], Int)], tau: Double): Map[Long, Long] = {
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val root = find(p); parent(x) = root; root }
    }
    for {
      Seq((ia, va, ca), (ib, vb, cb)) <- rows.combinations(2).map(_.sortBy(_._1))
      if ca == cb && cos(va, vb) >= tau
    } {
      val (ra, rb) = (find(ia), find(ib))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    rows.map { case (id, _, _) => id -> find(id) }.toMap
  }

  test("labels match within-cell union-find on a planted near-dup corpus") {
    val vecs = plantedVectors()
    val df = vecs.toDF("vec_id", "embedding")
    val model = IVF.train(df, "vec_id", "embedding", k = 4, sampleSize = 100)
    val got = SemDedup.labels(df, "vec_id", "embedding", model, tau = 0.9)
      .select($"doc_id", $"cluster_id", $"keep")
      .as[(Long, Long, Boolean)].collect()

    // reference uses the operator's own cell assignment (IVF is covered by
    // its own specs) but an independent pairing + clustering path
    val cells = df.select($"vec_id",
      element_at(IVF.cells($"embedding", model, 1), 1).as("cell"))
      .as[(Long, Int)].collect().toMap
    val expected = refLabels(
      vecs.map { case (id, v) => (id, v, cells(id)) }, tau = 0.9)

    assert(got.map { case (id, c, _) => id -> c }.toMap == expected)
    got.foreach { case (id, c, keep) => assert(keep == (id == c)) }
    // non-vacuous: the planted copies actually clustered
    assert(got.count(!_._3) >= 10)
  }

  test("tiny tileSize (tiled pair path) produces identical labels") {
    val vecs = plantedVectors()
    val df = vecs.toDF("vec_id", "embedding")
    val model = IVF.train(df, "vec_id", "embedding", k = 4, sampleSize = 100)
    val a = SemDedup.labels(df, "vec_id", "embedding", model, tau = 0.9)
      .orderBy("doc_id").collect()
    val b = SemDedup.labels(df, "vec_id", "embedding", model, tau = 0.9, tileSize = 2)
      .orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("deduplicate keeps exactly the representatives") {
    val vecs = plantedVectors()
    val df = vecs.toDF("vec_id", "embedding")
    val model = IVF.train(df, "vec_id", "embedding", k = 4, sampleSize = 100)
    val keepIds = SemDedup.labels(df, "vec_id", "embedding", model, tau = 0.9)
      .filter($"keep").select("doc_id").as[Long].collect().toSet
    val kept = SemDedup.deduplicate(df, "vec_id", "embedding", model, tau = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == keepIds)
    assert(kept.size < vecs.size) // something was actually dropped
  }

  test("tau outside (0, 1] is rejected") {
    val df = plantedVectors().toDF("vec_id", "embedding")
    val model = IVF.train(df, "vec_id", "embedding", k = 2, sampleSize = 100)
    intercept[IllegalArgumentException](
      SemDedup.labels(df, "vec_id", "embedding", model, tau = 0.0))
    intercept[IllegalArgumentException](
      SemDedup.labels(df, "vec_id", "embedding", model, tau = 1.5))
  }

  // --- crossContamination -------------------------------------------------

  /** Train/eval fixture: 50 random train vectors, 12 eval vectors, plus
    * noisy eval copies planted INTO the train side (ids 1000+). */
  private def contaminationFixture()
      : (Seq[(Long, Array[Float])], Seq[(Long, Array[Float])]) = {
    val r = new Random(23)
    def rand(): Array[Float] = Array.fill(16)(r.nextGaussian().toFloat)
    val train = (0L until 50L).map(i => (i, rand()))
    val evalSet = (500L until 512L).map(i => (i, rand()))
    val planted = evalSet.take(6).map { case (id, v) =>
      (1000L + id, v.map(x => x + (r.nextGaussian() * 1e-3).toFloat))
    }
    (train ++ planted, evalSet)
  }

  private def cosRef(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("crossContamination matches the celled brute-force reference exactly") {
    val (train, evalSet) = contaminationFixture()
    val trainDf = train.toDF("vec_id", "embedding")
    val evalDf = evalSet.toDF("vec_id", "embedding")
    val all = trainDf.unionByName(evalDf)
    val model = IVF.train(all, "vec_id", "embedding", k = 4, sampleSize = 200)
    val nprobe = 2
    val tau = 0.9

    val got = SemDedup.crossContamination(
      trainDf, evalDf, "vec_id", "embedding", model, tau, nprobe)
      .as[(Long, Long)].collect().toSet

    // reference: operator's own cell assignment (IVF covered by its own
    // specs), independent pairing — pair found iff train's home cell is
    // among eval's nprobe probed cells AND exact cosine >= tau
    val homeCell = trainDf.select($"vec_id",
      element_at(IVF.cells($"embedding", model, 1), 1).as("cell"))
      .as[(Long, Int)].collect().toMap
    val probed = evalDf.select($"vec_id",
      IVF.cells($"embedding", model, nprobe).as("cells"))
      .as[(Long, Seq[Int])].collect().toMap
    val want = (for {
      (tid, tv) <- train
      (eid, ev) <- evalSet
      if probed(eid).contains(homeCell(tid)) && cosRef(tv, ev) >= tau
    } yield (tid, eid)).toSet

    assert(got == want)
    // non-vacuous and complete on the planted copies: a near-identical
    // copy lands in its source's home cell, so all 6 planted pairs found
    assert(got == evalSet.take(6).map { case (id, _) => (1000L + id, id) }.toSet)
  }

  test("removeContaminatedSemantic drops exactly the flagged train rows") {
    val (train, evalSet) = contaminationFixture()
    val trainDf = train.toDF("vec_id", "embedding")
    val evalDf = evalSet.toDF("vec_id", "embedding")
    val model = IVF.train(
      trainDf.unionByName(evalDf), "vec_id", "embedding", k = 4, sampleSize = 200)

    val flagged = SemDedup.crossContamination(
      trainDf, evalDf, "vec_id", "embedding", model, tau = 0.9)
      .select("train_id").as[Long].collect().toSet
    val kept = SemDedup.removeContaminatedSemantic(
      trainDf, evalDf, "vec_id", "embedding", model, tau = 0.9)
      .select("vec_id").as[Long].collect().toSet

    assert(kept == train.map(_._1).toSet -- flagged)
    assert(flagged.nonEmpty && kept.nonEmpty)
  }

  test("crossContamination rejects bad tau and nprobe") {
    val (train, evalSet) = contaminationFixture()
    val trainDf = train.toDF("vec_id", "embedding")
    val evalDf = evalSet.toDF("vec_id", "embedding")
    val model = IVF.train(trainDf, "vec_id", "embedding", k = 2, sampleSize = 100)
    intercept[IllegalArgumentException](SemDedup.crossContamination(
      trainDf, evalDf, "vec_id", "embedding", model, tau = 0.0))
    intercept[IllegalArgumentException](SemDedup.crossContamination(
      trainDf, evalDf, "vec_id", "embedding", model, tau = 0.9, nprobe = 0))
  }
}
