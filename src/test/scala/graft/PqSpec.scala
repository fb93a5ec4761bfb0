package graft

import graft.pipeline.{IVF, Pq, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Product-quantization (IVF-PQ) tier: kernel parity against a plain-Scala
  * reference, planted-cluster recall, rerank exactness, model persistence,
  * and the fail-fast paths. */
class PqSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0.0) v else v.map(_ / n)
  }

  /** Plain-Scala reference encoder: normalize, split, L2 argmin with
    * lowest-index tie-break — independent of the Catalyst kernel. */
  private def refEncode(v: Array[Double], model: Pq.Model): Seq[Int] = {
    val u = unit(v)
    val dsub = model.dsub
    (0 until model.m).map { s =>
      val sub = u.slice(s * dsub, (s + 1) * dsub)
      model.codebooks(s).zipWithIndex.map { case (c, i) =>
        (sub.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum, i)
      }.minBy(identity)._2
    }
  }

  /** Plain-Scala reference ADC: dot of the unit query's subvectors against
    * the candidate's ASSIGNED sub-centroids. */
  private def refAdc(q: Array[Double], codes: Seq[Int], model: Pq.Model): Double = {
    val u = unit(q)
    val dsub = model.dsub
    codes.zipWithIndex.map { case (c, s) =>
      u.slice(s * dsub, (s + 1) * dsub).zip(model.codebooks(s)(c))
        .map { case (a, b) => a * b }.sum
    }.sum
  }

  private def randVecs(n: Int, dim: Int, seed: Long): Seq[(Long, Seq[Float])] = {
    val rnd = new Random(seed)
    (0 until n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextGaussian().toFloat)))
  }

  test("encode matches the plain-Scala reference on random vectors") {
    val data = randVecs(300, 16, seed = 7)
    val df = data.toDF("vec_id", "embedding")
    val model = Pq.train(df, "vec_id", "embedding", m = 4, ks = 8, sampleSize = 300)
    val got = df.select($"vec_id", Pq.encode($"embedding", model).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    data.foreach { case (id, v) =>
      assert(got(id) == refEncode(v.map(_.toDouble).toArray, model),
        s"codes diverge for vec $id")
    }
  }

  test("adc(encode(c), lut(q)) matches the plain-Scala ADC reference") {
    val data = randVecs(50, 16, seed = 11)
    val df = data.toDF("vec_id", "embedding")
    val model = Pq.train(df, "vec_id", "embedding", m = 4, ks = 8, sampleSize = 50)
    val q = data.head._2.map(_.toDouble).toArray
    val got = df.select($"vec_id",
        Pq.adc(Pq.encode($"embedding", model),
          Pq.lut(typedLit(q.toSeq), model)).as("sim"))
      .as[(Long, Double)].collect().toMap
    data.foreach { case (id, v) =>
      val want = refAdc(q, refEncode(v.map(_.toDouble).toArray, model), model)
      assert(math.abs(got(id) - want) < 1e-9, s"ADC diverges for vec $id")
    }
  }

  test("training is deterministic and sub-centroids have the declared shape") {
    val df = randVecs(200, 24, seed = 3).toDF("vec_id", "embedding")
    val a = Pq.train(df, "vec_id", "embedding", m = 6, ks = 4, sampleSize = 200)
    val b = Pq.train(df, "vec_id", "embedding", m = 6, ks = 4, sampleSize = 200)
    assert(a.m == 6 && a.ks == 4 && a.dsub == 4)
    assert(a.codebooks.flatten.flatten.toSeq == b.codebooks.flatten.flatten.toSeq,
      "two trainings over the same input must be bit-identical")
  }

  /** Four well-separated orthogonal-ish clusters: with a rerank shortlist
    * at least as large as the probed-cell population, the exact rerank
    * covers every probed candidate, and because cross-cluster cosine is
    * ~0 the true top-k all live in the query's own cell — so IVF-PQ must
    * return EXACTLY the brute-force top-k regardless of ADC distortion. */
  test("planted clusters: reranked IVF-PQ equals brute force exactly") {
    val rnd = new Random(42)
    val dim = 32
    val centers = Array.tabulate(4) { c =>
      Array.tabulate(dim)(j => if (j / 8 == c) 1.0 else 0.0)
    }
    val data = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => (x + rnd.nextGaussian() * 0.05).toFloat).toSeq)
    }
    val df = data.toDF("vec_id", "embedding")
    val qs = df.filter($"vec_id" < 8)
    val ivf = IVF.train(df, "vec_id", "embedding", k = 4, sampleSize = 200)
    val pq = Pq.train(df, "vec_id", "embedding", m = 8, ks = 8, sampleSize = 200)
    val brute = Similarity.bruteForceTopK(df, qs, "vec_id", "embedding", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Pq.topK(df, qs, "vec_id", "embedding", k = 5, pq, ivf,
        nprobe = 2, rerank = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute,
      "reranked IVF-PQ must reproduce exact top-k on separated clusters")
  }

  test("topK is invariant under candidate repartitioning") {
    val data = randVecs(200, 16, seed = 19)
    val df = data.toDF("vec_id", "embedding")
    val qs = df.filter($"vec_id" < 5)
    val ivf = IVF.train(df, "vec_id", "embedding", k = 4, sampleSize = 200)
    val pq = Pq.train(df, "vec_id", "embedding", m = 4, ks = 8, sampleSize = 200)
    def run(c: org.apache.spark.sql.DataFrame) =
      Pq.topK(c, qs, "vec_id", "embedding", k = 5, pq, ivf, nprobe = 2, rerank = 10)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(df) == run(df.repartition(7)),
      "result must not depend on physical partitioning")
  }

  /** The drift audit: models FROZEN on a stationary gaussian corpus keep
    * ADC-vs-exact rank agreement high; the same stale models applied to a
    * shifted distribution (constant offset — after unit-norm the corpus
    * collapses toward one direction, so quantization error dominates the
    * true distance spread) must drop it. Seeded end to end, so the planted
    * gap is a stable fixture, not a flaky margin. */
  test("driftScore: a planted distribution shift trips the score, the stationary corpus does not") {
    val data = randVecs(400, 16, seed = 31)
    val df = data.toDF("vec_id", "embedding")
    val ivf = IVF.train(df, "vec_id", "embedding", k = 4, sampleSize = 400)
    // fine quantization (dsub=2, ks=32): in-distribution ADC error is small
    // relative to the corpus' distance spread, so stationary agreement is
    // high and the drop under drift is attributable to the shift alone
    val pq = Pq.train(df, "vec_id", "embedding", m = 8, ks = 32, sampleSize = 400)

    def meanAgree(corpus: org.apache.spark.sql.DataFrame): Double =
      Pq.driftScore(Pq.index(corpus, "vec_id", "embedding", pq, ivf), corpus,
          corpus.filter($"vec_id" < 30), "vec_id", "embedding",
          k = 5, pq, ivf, nprobe = 2, rerank = 50)
        .agg(org.apache.spark.sql.functions.avg($"agree_e6"))
        .head.getDouble(0)

    val stat = meanAgree(df)
    val shifted = data.map { case (id, v) => (id, v.map(x => x * 0.05f + 2.0f)) }
      .toDF("vec_id", "embedding")
    val drift = meanAgree(shifted)

    assert(stat >= 600000.0,
      s"stationary agreement must stay high, got $stat")
    assert(drift <= stat - 200000.0,
      s"planted shift must trip the score: stationary=$stat drifted=$drift")
  }

  test("driftScore per-query arithmetic is exact fixed-point (k=5 grid)") {
    // agreement values can only be multiples of 1e6/k — the integer
    // arithmetic contract that makes the score hash-stable
    val data = randVecs(400, 16, seed = 31)
    val df = data.toDF("vec_id", "embedding")
    val ivf = IVF.train(df, "vec_id", "embedding", k = 4, sampleSize = 400)
    val pq = Pq.train(df, "vec_id", "embedding", m = 8, ks = 32, sampleSize = 400)
    val rows = Pq.driftScore(Pq.index(df, "vec_id", "embedding", pq, ivf), df,
        df.filter($"vec_id" < 30), "vec_id", "embedding",
        k = 5, pq, ivf, nprobe = 2, rerank = 50)
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (q, a) =>
      assert(a % 200000L == 0L && a >= 0L && a <= 1000000L,
        s"query $q: agree_e6=$a is off the 1e6/k grid")
    }
  }

  test("model save/load round-trips bit-identically") {
    val df = randVecs(100, 16, seed = 23).toDF("vec_id", "embedding")
    val model = Pq.train(df, "vec_id", "embedding", m = 4, ks = 4, sampleSize = 100)
    val path = java.nio.file.Files.createTempDirectory("pq-model").toString + "/m"
    Pq.save(model, path, spark)
    val back = Pq.load(path, spark)
    assert(back.m == model.m && back.ks == model.ks)
    assert(back.codebooks.flatten.flatten.toSeq ==
      model.codebooks.flatten.flatten.toSeq)
  }

  test("index is a pure projection carrying no raw vectors") {
    val df = randVecs(100, 16, seed = 29).toDF("vec_id", "embedding")
    val ivf = IVF.train(df, "vec_id", "embedding", k = 4, sampleSize = 100)
    val pq = Pq.train(df, "vec_id", "embedding", m = 4, ks = 4, sampleSize = 100)
    val idx = Pq.index(df, "vec_id", "embedding", pq, ivf)
    assert(idx.columns.toSeq == Seq("cand_id", "cell", "codes"),
      "the compressed index must drop the raw vector column")
    val p = idx.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Exchange"), "indexing must not shuffle")
    idx.as[(Long, Int, Seq[Int])].collect().foreach { case (_, cell, codes) =>
      assert(cell >= 0 && cell < 4 && codes.length == 4 &&
        codes.forall(c => c >= 0 && c < 4))
    }
  }

  test("mismatched model shapes fail fast at scoring time") {
    val df = randVecs(100, 16, seed = 31).toDF("vec_id", "embedding")
    val big = Pq.train(df, "vec_id", "embedding", m = 4, ks = 8, sampleSize = 100)
    val small = Pq.train(df, "vec_id", "embedding", m = 4, ks = 3, sampleSize = 100)
    // codes from the ks=8 model against a ks=3 LUT: 12 / 4 = 3 divides, so
    // the shape gate passes but any code >= 3 must hit the range check
    val ex = intercept[Exception] {
      df.select(Pq.adc(Pq.encode($"embedding", big),
        Pq.lut($"embedding", small))).collect()
    }
    assert(ex.getMessage != null)
    // non-divisible shapes: m=4 codes against an m=3 LUT
    val odd = Pq.Model(small.codebooks.take(3))
    val ex2 = intercept[Exception] {
      df.select(Pq.adc(Pq.encode($"embedding", big),
        Pq.lut($"embedding", odd))).collect()
    }
    assert(ex2.getMessage != null)
  }

  test("vector/model dimension mismatch fails fast, never clamps") {
    val df = randVecs(60, 16, seed = 43).toDF("vec_id", "embedding")
    val model = Pq.train(df, "vec_id", "embedding", m = 4, ks = 4, sampleSize = 60)
    val shorter = randVecs(5, 8, seed = 47).toDF("vec_id", "embedding")
    val exEnc = intercept[Exception] {
      shorter.select(Pq.encode($"embedding", model)).collect()
    }
    assert(exEnc.getMessage.contains("model dim") ||
      exEnc.getCause != null && exEnc.getCause.getMessage.contains("model dim"),
      s"encode must name the dim mismatch, got: ${exEnc.getMessage}")
    val exLut = intercept[Exception] {
      shorter.select(Pq.lut($"embedding", model)).collect()
    }
    assert(exLut.getMessage != null)
  }

  test("train validates m / ks / divisibility") {
    val df = randVecs(50, 16, seed = 37).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Pq.train(df, "vec_id", "embedding", m = 5, ks = 4, sampleSize = 50)
    }
    intercept[IllegalArgumentException] {
      Pq.train(df, "vec_id", "embedding", m = 4, ks = 300, sampleSize = 50)
    }
    intercept[IllegalArgumentException] {
      Pq.topK(df, df, "vec_id", "embedding", k = 10,
        Pq.train(df, "vec_id", "embedding", m = 4, ks = 4, sampleSize = 50),
        IVF.train(df, "vec_id", "embedding", k = 2, sampleSize = 50),
        nprobe = 1, rerank = 5)
    }
  }
}
