package graft

import org.apache.spark.SparkThrowable
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The GRAFT_* error-class contract: every validation failure carries a
  * stable condition + SQLSTATE (the SparkThrowable surface tooling keys
  * on) through the engine's exception wrapping — not just message text.
  * Reference analog: the GUC error contract of expected/add_agg.out:50-55;
  * wording asserted alongside the class where the reference pins it. */
class GraftErrorsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  /** First GRAFT_* SparkThrowable in the cause chain (execution errors
    * arrive wrapped in SparkException layers). */
  private def graftCause(t: Throwable): SparkThrowable =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .collectFirst {
        case s: SparkThrowable
            if Option(s.getCondition).exists(_.startsWith("GRAFT_")) => s
      }
      .getOrElse(fail(s"no GRAFT_* SparkThrowable in cause chain of: $t"))

  test("topn k > counters: GRAFT_K_EXCEEDS_COUNTERS / 22023, reference wording") {
    spark.conf.set(GraftConf.NumberOfCountersKey, "4")
    try {
      Seq("a", "b", "c").toDF("x").createOrReplaceTempView("graft_err_items")
      val ex = intercept[Exception] {
        spark.sql("SELECT topn(topn_add_agg(x), 5) FROM graft_err_items").collect()
      }
      val g = graftCause(ex)
      assert(g.getCondition === "GRAFT_K_EXCEEDS_COUNTERS")
      assert(g.getSqlState === "22023")
      val msg = g.asInstanceOf[Throwable].getMessage
      assert(msg.contains("desired number of counters (5) is higher than the " +
        "topn.number_of_counters variable (4)"), s"got: $msg")
      assert(g.getMessageParameters.get("k") === "5")
    } finally spark.conf.set(GraftConf.NumberOfCountersKey, "1000")
  }

  test("counters conf out of range: GRAFT_COUNTERS_OUT_OF_RANGE / 22023") {
    spark.conf.set(GraftConf.NumberOfCountersKey, "0")
    try {
      val ex = intercept[Exception] { GraftConf.numberOfCounters }
      val g = graftCause(ex)
      assert(g.getCondition === "GRAFT_COUNTERS_OUT_OF_RANGE")
      assert(g.getSqlState === "22023")
      assert(g.asInstanceOf[Throwable].getMessage
        .contains("0 is outside the valid range for parameter"))
    } finally spark.conf.set(GraftConf.NumberOfCountersKey, "1000")
  }

  test("counters conf non-integer: GRAFT_CONF_NOT_INTEGER / 22023") {
    spark.conf.set(GraftConf.NumberOfCountersKey, "many")
    try {
      val g = graftCause(intercept[Exception] { GraftConf.numberOfCounters })
      assert(g.getCondition === "GRAFT_CONF_NOT_INTEGER")
      assert(g.getSqlState === "22023")
    } finally spark.conf.set(GraftConf.NumberOfCountersKey, "1000")
  }

  test("bad split weights: GRAFT_INVALID_SPLIT_WEIGHTS / 22023") {
    val ids = (0L until 10L).toDF("id")
    val over = intercept[GraftException] {
      graft.pipeline.Sampling.assignSplit(ids, Seq("x" -> 60, "y" -> 60),
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.col("id"),
          org.apache.spark.sql.functions.lit(100L)))
    }
    assert(over.getCondition === "GRAFT_INVALID_SPLIT_WEIGHTS")
    assert(over.getSqlState === "22023")
    assert(over.getMessage.contains("must sum to 100"))
    val nonPos = intercept[GraftException] {
      graft.pipeline.Sampling.groupSplit(ids, "id",
        Seq("x" -> 100, "y" -> 0))
    }
    assert(nonPos.getCondition === "GRAFT_INVALID_SPLIT_WEIGHTS")
    assert(nonPos.getMessage.contains("must be positive"))
  }

  test("vector/model dim mismatch: GRAFT_DIM_MISMATCH / 22023 through codegen") {
    val rnd = new scala.util.Random(5)
    val train = (0 until 40)
      .map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val model = graft.pipeline.Pq.train(
      train, "vec_id", "embedding", m = 4, ks = 4, sampleSize = 40)
    val shorter = (0 until 5)
      .map(i => (i.toLong, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val g = graftCause(intercept[Exception] {
      shorter.select(graft.pipeline.Pq.encode($"embedding", model)).collect()
    })
    assert(g.getCondition === "GRAFT_DIM_MISMATCH")
    assert(g.getSqlState === "22023")
    assert(g.asInstanceOf[Throwable].getMessage.contains("pq_encode"))
  }

  test("sketch key over wire limit: GRAFT_SKETCH_KEY_TOO_LONG / 54000") {
    val st = graft.core.TopnState.empty()
    val g = intercept[GraftException] {
      st.mergeEntry("x" * 300, 1L, numCounters = 10)
    }
    assert(g.getCondition === "GRAFT_SKETCH_KEY_TOO_LONG")
    assert(g.getSqlState === "54000")
    // reference wording, topn.c:700-706
    assert(g.getMessage.contains(
      "this sketch includes a key which is longer than allowed topn key size"))
  }

  test("adc model mismatch: GRAFT_PQ_MODEL_MISMATCH / 22023") {
    val rnd = new scala.util.Random(7)
    val df = (0 until 40)
      .map(i => (i.toLong, Seq.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    // codes from a ks=8 model scored against a ks=3 model's LUT: the lut
    // itself is dim-valid (same m, dsub), so the failure surfaces at ADC
    // time as a model mismatch (code >= ks), not a dim mismatch
    val big = graft.pipeline.Pq.train(df, "vec_id", "embedding", m = 4, ks = 8, sampleSize = 40)
    val small = graft.pipeline.Pq.train(df, "vec_id", "embedding", m = 4, ks = 3, sampleSize = 40)
    val g = graftCause(intercept[Exception] {
      df.select(graft.pipeline.Pq.adc(
        graft.pipeline.Pq.encode($"embedding", big),
        graft.pipeline.Pq.lut($"embedding", small))).collect()
    })
    assert(g.getCondition === "GRAFT_PQ_MODEL_MISMATCH")
    assert(g.getSqlState === "22023")
  }
}
