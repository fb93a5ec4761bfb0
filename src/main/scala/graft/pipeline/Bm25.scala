package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * BM25 ranked retrieval over a document corpus (Robertson & Zaragoza 2009,
 * "The Probabilistic Relevance Framework: BM25 and Beyond"), with the
 * non-negative idf variant Lucene uses, in BASE-2 units:
 * idf(t) = log2(1 + (N - df + 0.5) / (df + 0.5)) — a uniform 1/ln2
 * rescale of the ln spelling, so rankings are identical. The workhorse
 * relevance score for corpus exploration and retrieval-style curation
 * ("find the documents most about X").
 *
 * Scale shape (100 TB): the query term list is a small literal, so term
 * frequencies are per-row array expressions — no explode, no inverted
 * index, no shuffle on the scoring path. One scan computes the corpus
 * stats (N, total length, per-term document frequencies) as a SINGLE-ROW
 * aggregate that broadcasts into the scoring scan's cross join; scoring
 * itself is a pure map-side projection, and top-k is Spark's
 * TakeOrderedAndProject (per-partition heaps, no global sort). Two scans
 * total — the stats pass is the price of exact global idf; cache the
 * input or persist the one-row stats table to amortize across queries.
 *
 * Determinism: tf/df/N are exact integers; the score is fixed IEEE
 * arithmetic over them with a fixed left-to-right term order, floored to
 * 1e-6 fixed point; the idf log2 is [[graft.expressions.FixedLog2]] —
 * the IEEE-only recurrence, bit-identical on every platform and replayed
 * op-for-op by the oracle — so NO transcendental appears anywhere in the
 * floored score (the [[LanguageModel]] doctrine; no libm, no
 * cross-platform caveat). Ties break by doc_id.
 */
object Bm25 {

  /** Per-document scores: (doc_id, n_tokens, score_e6) for every document
    * with score_e6 > 0 (contains a query term and scores above the 1e-6
    * fixed-point floor). */
  def scores(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "BM25 needs at least one query term")
    require(terms.distinct == terms, s"duplicate query terms: $terms")
    require(k1 > 0.0 && b >= 0.0 && b <= 1.0,
      s"need k1 > 0 and b in [0,1], got k1=$k1 b=$b")
    val spark = docs.sparkSession
    import spark.implicits._

    def tf(term: String): Column =
      size(filter($"toks", w => w === lit(term)))

    val base = docs.select(col(idCol).as("doc_id"),
      TextAnalysis.tokens(col(textCol)).as("toks"))
      .select($"doc_id", size($"toks").cast("long").as("n_tokens"), $"toks")

    val aggCols = count(lit(1)).as("n_docs") +:
      sum($"n_tokens").as("sum_len") +:
      terms.zipWithIndex.map { case (t, i) =>
        sum(when(tf(t) > 0, 1L).otherwise(0L)).as(s"df_$i")
      }
    val stats = base.agg(aggCols.head, aggCols.tail: _*)

    val scored = base.crossJoin(broadcast(stats))
    val avgLen = scored("sum_len").cast("double") / scored("n_docs").cast("double")
    val lenNorm = lit(k1) * (lit(1.0 - b) + lit(b) * ($"n_tokens".cast("double") / avgLen))
    val score = terms.zipWithIndex.map { case (t, i) =>
      val idf = Dsir.fixedLog2(lit(1.0) +
        (scored("n_docs").cast("double") - scored(s"df_$i").cast("double") + lit(0.5)) /
          (scored(s"df_$i").cast("double") + lit(0.5)))
      val tfD = tf(t).cast("double")
      idf * ((tfD * lit(k1 + 1.0)) / (tfD + lenNorm))
    }.reduceLeft(_ + _)

    scored
      .select($"doc_id", $"n_tokens",
        floor(lit(1e6) * score).cast("long").as("score_e6"))
      .filter($"score_e6" > 0)
  }

  /** Top-k by (score desc, doc_id) — deterministic, per-partition heaps. */
  def topK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      terms: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    scores(docs, idCol, textCol, terms, k1, b)
      .orderBy(col("score_e6").desc, col("doc_id"))
      .limit(k)
  }
}
