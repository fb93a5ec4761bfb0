package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * In-engine document embeddings by feature hashing (Weinberger et al.
 * 2009, "Feature Hashing for Large Scale Multitask Learning"): each
 * token hashes to one of `dim` buckets ([[Dsir.featureBucket]] — the
 * same portable md5 spelling every hashed operator here shares), a
 * document's vector is its bucket-count histogram, optionally
 * L2-normalized. No external model, no training pass — which is exactly
 * why pipelines use it: a deterministic, vocabulary-unbounded text →
 * vector bridge that feeds the vector operators ([[Similarity]],
 * [[SemDedup]], [[IVF]]) before a learned embedding model exists, and a
 * cheap fallback tier at 100 TB where running a neural encoder over
 * every document is the dominant cost.
 *
 * Two tiers, split by arithmetic:
 *
 *  - [[hashedCounts]] — the EXACT integer histogram (doc_id,
 *    counts: array<long> of length `dim`). Pure integer arithmetic,
 *    bit-identical across engines: the oracle tier.
 *  - [[hashedEmbedding]] — counts L2-normalized to array<float>, the
 *    drop-in for an `embedding` column. Normalization divides by an
 *    irrational sqrt, so this tier is float-deterministic WITHIN the
 *    engine (fixed left-to-right array fold) but not a cross-engine
 *    hash target; driver queries audit it in-plan (norm ≈ 1) and pin
 *    the integer tier by hash instead.
 *
 * Scale shape (100 TB): one tokenize+hash scan, a hash aggregation
 * keyed by (doc_id, bucket) with map-side partials, then a per-doc
 * aggregation assembling at most `dim` (bucket, count) entries into the
 * fixed-length vector — both shuffles carry integers only, bounded by
 * dim entries per document. No driver-side data, nothing vocabulary-
 * sized anywhere (that is the point of hashing the features).
 */
object Embedding {

  private def requireDim(dim: Int): Unit =
    require(dim >= 2 && dim <= (1 << 16),
      s"dim must be in [2, 65536], got $dim")

  /** Exact hashed term-frequency vectors: (doc_id, counts) with
    * `counts(j)` = number of tokens hashing to bucket j. */
  def hashedCounts(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 256): DataFrame = {
    requireDim(dim)
    val ex = docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .select(col("doc_id"), Dsir.featureBucket(col("w"), dim).as("f"))
    ex.groupBy(col("doc_id"), col("f"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(collect_list(struct(col("f"), col("c")))).as("m"))
      .select(col("doc_id"),
        transform(sequence(lit(0), lit(dim - 1)),
          j => coalesce(element_at(col("m"), j.cast("long")), lit(0L)))
          .as("counts"))
  }

  /** L2-normalized float embeddings: (doc_id, embedding) — the
    * [[hashedCounts]] histogram scaled to unit norm (all-zero vectors
    * cannot occur: every document tokenizes to at least one token). */
  def hashedEmbedding(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      dim: Int = 256): DataFrame = {
    requireDim(dim)
    val norm: Column = sqrt(aggregate(col("counts"), lit(0.0d),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    hashedCounts(docs, idCol, textCol, dim)
      .select(col("doc_id"),
        transform(col("counts"), x => (x.cast("double") / norm).cast("float"))
          .as("embedding"))
  }

  /** The [[hashedCounts]] vector as engine-neutral SQL over a
    * `documents` table: one row per doc with the counts space-joined in
    * bucket order — exact integers, generated from the same constants
    * as the Spark plan so the spellings cannot drift. */
  def hashedCountsSql(dim: Int = 256): String = {
    requireDim(dim)
    val bucket = Dsir.featureBucketSql("w", dim)
    s"""WITH t AS (
       |  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents),
       |ex AS (SELECT doc_id, $bucket AS f
       |       FROM (SELECT doc_id, unnest(toks) AS w FROM t)),
       |cnt AS (SELECT doc_id, f, CAST(COUNT(*) AS BIGINT) AS c
       |        FROM ex GROUP BY 1, 2),
       |grid AS (SELECT doc_id, j FROM (SELECT DISTINCT doc_id FROM t)
       |         CROSS JOIN (SELECT UNNEST(range(0, $dim)) AS j))
       |SELECT g.doc_id,
       |       string_agg(CAST(COALESCE(c.c, 0) AS VARCHAR), ' ' ORDER BY g.j)
       |         AS counts_str
       |FROM grid g LEFT JOIN cnt c ON g.doc_id = c.doc_id AND g.j = c.f
       |GROUP BY 1 ORDER BY g.doc_id""".stripMargin
  }
}
