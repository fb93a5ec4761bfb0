package graft

import org.apache.spark.SparkThrowable

/**
 * A validation failure carrying a stable GRAFT_* error class and a
 * SQLSTATE — the same structured contract Spark's own exceptions give
 * tooling ([[org.apache.spark.SparkThrowable]]: error catalogs, alert
 * routing, retry rules keyed on `getCondition`/`getSqlState` instead of
 * message text). Extends IllegalArgumentException so every existing
 * catch/intercept site keeps working; the human-readable message keeps
 * the reference's wording where the reference specifies it (e.g.
 * [[GraftErrors.kExceedsCounters]] mirrors topn.c:231-232, and the GUC
 * range error mirrors the contract exercised by expected/add_agg.out:
 * 50-55) with the `[CLASS]` prefix Spark itself uses.
 */
class GraftException(
    condition: String,
    sqlState: String,
    message: String,
    parameters: Map[String, String] = Map.empty)
  extends IllegalArgumentException(s"[$condition] $message")
  with SparkThrowable {

  override def getCondition: String = condition
  override def getSqlState: String = sqlState
  override def getMessageParameters: java.util.Map[String, String] = {
    val m = new java.util.HashMap[String, String](parameters.size * 2)
    parameters.foreach { case (k, v) => m.put(k, v) }
    m
  }
}

/**
 * The GRAFT_* error-class family for the library's validation surface.
 * SQLSTATE assignment follows the standard classes the reference's host
 * engine and Spark both use: `22023` invalid_parameter_value for
 * parameter/shape validation, `54000` program_limit_exceeded for the
 * sketch key-size limit.
 */
object GraftErrors {

  /** `spark.topn.numberOfCounters` set to a non-integer. */
  def confNotInteger(key: String, raw: String): GraftException =
    new GraftException("GRAFT_CONF_NOT_INTEGER", "22023",
      s"$key must be an integer, got '$raw'",
      Map("key" -> key, "value" -> raw))

  /** `spark.topn.numberOfCounters` outside 1..max — wording mirrors the
    * reference's GUC range error (expected/add_agg.out:50-52). */
  def countersOutOfRange(key: String, n: Int, max: Int): GraftException =
    new GraftException("GRAFT_COUNTERS_OUT_OF_RANGE", "22023",
      s"$n is outside the valid range for parameter \"$key\" (1 .. $max)",
      Map("key" -> key, "value" -> n.toString, "max" -> max.toString))

  /** `topn(sketch, k)` with k above the live counter budget — wording
    * mirrors the reference, topn.c:231-232. */
  def kExceedsCounters(k: Int, numCounters: Int): GraftException =
    new GraftException("GRAFT_K_EXCEEDS_COUNTERS", "22023",
      s"desired number of counters ($k) is higher than the " +
        s"topn.number_of_counters variable ($numCounters)",
      Map("k" -> k.toString, "numCounters" -> numCounters.toString))

  /** A sketch being merged carries a key over the wire-format limit —
    * wording mirrors the reference's load-side error (topn.c:700-706). */
  def sketchKeyTooLong(maxBytes: Int): GraftException =
    new GraftException("GRAFT_SKETCH_KEY_TOO_LONG", "54000",
      s"this sketch includes a key which is longer than allowed topn key " +
        s"size ($maxBytes bytes)",
      Map("maxBytes" -> maxBytes.toString))

  /** Split weights that do not form a positive 100-percent partition. */
  def invalidSplitWeights(weights: Seq[(String, Int)], why: String): GraftException =
    new GraftException("GRAFT_INVALID_SPLIT_WEIGHTS", "22023",
      s"$why, got $weights",
      Map("weights" -> weights.toString))

  /** A vector whose dimensionality disagrees with the PQ model's. */
  def dimMismatch(op: String, side: String, dim: Int, m: Int, dsub: Int): GraftException =
    new GraftException("GRAFT_DIM_MISMATCH", "22023",
      s"$op: $side dim $dim != model dim ${m * dsub} (m=$m x dsub=$dsub) " +
        s"— $side and PQ model disagree",
      Map("op" -> op, "dim" -> dim.toString,
        "modelDim" -> (m * dsub).toString))

  /** Codes and LUT built from different PQ models (shape disagreement at
    * scoring time). */
  def pqModelMismatch(detail: String): GraftException =
    new GraftException("GRAFT_PQ_MODEL_MISMATCH", "22023",
      s"pq_adc: $detail", Map("detail" -> detail))
}
