package graft

import graft.pipeline.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE merge TRAINING: the distributed most-frequent-pair loop must match
  * a transparent sequential reference implementation rule for rule —
  * counts, tie-breaks, early stop — and its learned table must feed the
  * inference walks unchanged. */
class BpeTrainSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Sequential reference trainer with the ENGINE's documented semantics:
    * single-pass non-overlapping literal replacement per learned rule
    * (java.lang.String.replace == both engines' replace()), marker-guarded
    * word boundaries, (count desc, a asc, b asc) argmax, stop below
    * minCount. Deliberately naive — a dozen lines whose correctness is
    * inspectable — so the distributed loop has an independent oracle. */
  private def seqTrain(
      docs: Seq[String], iters: Int, minCount: Long): Seq[(Int, String, String, Long)] = {
    val M = "\u001f"
    var corpus = docs.map { t =>
      val marked = t.trim.replaceAll("\\s+", M)
      if (marked.isEmpty) "  "
      else " " + marked.map(_.toString).mkString(" ") + " "
    }
    val learned = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var k = 1
    var done = false
    while (k <= iters && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for (d <- corpus) {
        val toks = d.trim.split(" ", -1)
        for (i <- 0 until toks.length - 1) {
          val (a, b) = (toks(i), toks(i + 1))
          if (a != M && b != M && a.nonEmpty && b.nonEmpty)
            counts((a, b)) = counts.getOrElse((a, b), 0L) + 1L
        }
      }
      val eligible = counts.filter(_._2 >= minCount)
      if (eligible.isEmpty) done = true
      else {
        val ((a, b), c) = eligible.minBy { case ((a, b), c) => (-c, a, b) }
        learned += ((k, a, b, c))
        corpus = corpus.map(_.replace(s" $a $b ", s" $a$b "))
        k += 1
      }
    }
    learned.toSeq
  }

  private val corpus = Seq(
    "the theme there is the thing",
    "in the thin theatre the thing sings",
    "a ringing thing brings the ring",
    "the rather thin theme lingers in the ring",
    "she sings the theme in the theatre",
    "")

  test("distributed training matches the sequential reference rule for rule") {
    val expected = seqTrain(corpus, iters = 10, minCount = 2L)
    val got = Bpe.trainMerges(corpus.toDF("text"), "text", iters = 10)
    assert(got === expected)
    assert(got.nonEmpty && got.map(_._1) === (1 to got.length),
      "iterations must be dense and 1-based")
    // spot-pin the first rule so a double-bug in both trainers can't hide:
    // 'th' dominates this corpus ('the'/'theme'/'thin'/'theatre'/'thing')
    assert(got.head._2 === "t" && got.head._3 === "h")
  }

  test("tie-breaks are pinned (count desc, then a asc, b asc)") {
    // 'ab' and 'ba' pairs both occur exactly twice and nothing else repeats:
    // the argmax must take ('a','b') by the ascending pair order
    val docs = Seq("ab xy ab", "ba qr ba")
    val got = Bpe.trainMerges(docs.toDF("text"), "text", iters = 1)
    assert(got === seqTrain(docs, 1, 2L))
    assert(got.head._2 === "a" && got.head._3 === "b" && got.head._4 === 2L)
  }

  test("training stops early when no pair reaches minCount") {
    // every adjacent pair is unique -> nothing reaches the default minCount
    val got = Bpe.trainMerges(Seq("abcdefg").toDF("text"), "text", iters = 5)
    assert(got.isEmpty)
    // ...and a corpus that dries up mid-run stops mid-run on both sides
    val partial = Seq("aa aa bcd", "aa efg")
    assert(Bpe.trainMerges(partial.toDF("text"), "text", iters = 5)
      === seqTrain(partial, 5, 2L))
  }

  test("the trained table feeds the inference walks unchanged") {
    val rules = Bpe.trainMerges(corpus.toDF("text"), "text", iters = 8)
      .map(r => (r._2, r._3))
    assert(rules.nonEmpty)
    val df = corpus.toDF("text").select(
      Bpe.tokenCount(col("text"), rules).as("n_lit"),
      Bpe.tokenCountVocab(col("text"), rules).as("n_vocab"),
      size(Bpe.encode(col("text"), rules)).as("n_enc"))
    val rows = df.as[(Int, Int, Int)].collect()
    assert(rows.forall { case (a, b, c) => a == b && b == c },
      s"literal walk, vocab expression, and encode must agree: ${rows.toSeq}")
    // the merges genuinely compress: fewer tokens than characters
    val chars = corpus.map(_.replaceAll("\\s+", "").length).sum
    assert(rows.map(_._1).sum < chars)
  }

  test("trainMergesDF exposes the run as (iter, a, b, cnt) rows") {
    val df = Bpe.trainMergesDF(corpus.toDF("text"), "text", iters = 3)
    assert(df.columns.toSeq === Seq("iter", "a", "b", "cnt"))
    assert(df.as[(Long, String, String, Long)].collect().toSeq ===
      seqTrain(corpus, 3, 2L).map { case (i, a, b, c) => (i.toLong, a, b, c) })
  }

  test("fertilityReport refuses a group column that collides with its outputs") {
    val docs = Seq(("en", "a b")).toDF("n_words", "text")
    val e = intercept[IllegalArgumentException](
      Bpe.fertilityReport(docs, "n_words", "text"))
    assert(e.getMessage.contains("collides"))
    intercept[IllegalArgumentException](
      Bpe.fertilityReport(
        Seq(("en", "a b")).toDF("__graft_w", "text"), "__graft_w", "text"))
  }

  test("fertilityReport matches a plain-Scala aggregate on trained merges") {
    val rules = Bpe.trainMerges(corpus.toDF("text"), "text", iters = 6)
      .map { case (_, a, b, _) => (a, b) }
    val langs = Seq("en", "de", "en", "de", "en", "en") // parallel to corpus
    val docs = langs.zip(corpus).toDF("lang", "text")
    val got = Bpe.fertilityReport(docs, "lang", "text", rules)
      .orderBy("grp")
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq

    // reference: per-group integer sums + one ppm floor on the sums,
    // piece counts from the ENGINE's own encode (its parity with the
    // sequential walk is pinned by the tests above)
    val enc = docs.select(col("lang"),
        when(length(trim(col("text"))) === 0, 0)
          .otherwise(size(split(trim(col("text")), "\\s+"))).as("w"),
        size(Bpe.encode(col("text"), rules)).as("p"),
        octet_length(col("text")).as("b"))
      .as[(String, Int, Int, Int)].collect()
    val want = enc.groupBy(_._1).toSeq.sortBy(_._1).map { case (g, rs) =>
      val (w, p, b) =
        (rs.map(_._2.toLong).sum, rs.map(_._3.toLong).sum, rs.map(_._4.toLong).sum)
      (g, rs.length.toLong, w, p, b,
        if (w == 0) 0L else p * 1000000L / w,
        if (p == 0) 0L else b * 1000000L / p)
    }
    assert(got == want)
    // non-vacuous: fertility is a real ratio, not 1
    assert(got.exists(_._6 > 1000000L))
  }
}
