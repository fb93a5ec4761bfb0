package graft.operators

import graft.TopnFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Plan-tuning diagnostics built on the flagship sketch — the
 * measurements an operator consults before choosing the skew knobs this
 * library exposes (`Rollups.saltedTopnAdd`'s salt buckets, AQE skew-join
 * thresholds, `Selection.topKPerGroup` caps).
 */
object Diagnostics {

  /**
   * Key-skew profile of a would-be shuffle key: the top-`k` heaviest key
   * values with exact-below-eviction frequencies and their corpus share
   * in exact ppm — ONE pass, state bounded at `counters` entries no
   * matter the key cardinality (the reference operator doing the
   * diagnostic job it was built for: a `groupBy(key).count().orderBy`
   * profile of a 100 TB table shuffles the corpus to learn what the
   * sketch learns map-side).
   *
   * Output: (key, freq, share_e6, total_rows), pinned (freq desc, key
   * asc) order. `share_e6 = freq * 1e6 DIV total_rows` — exact integer
   * arithmetic, so the row is hash-stable cross-engine. Reading it:
   * share_e6 of the top key ~ 1e6/P (P = shuffle partitions) means one
   * reducer owns that key's whole mass — salt it or raise AQE's
   * skew-join factor; many near-equal small shares mean the key is fine.
   *
   * NULL keys count into `total_rows` but not into the sketch (the
   * reference's NULL-skip contract) — a heavily-NULL key column is its
   * own finding: the shares visibly fail to add up.
   */
  def keySkewReport(
      df: DataFrame,
      keyCol: String,
      k: Int = 20,
      counters: Int = 10000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // fail at build time in THIS operator's vocabulary — otherwise k >
    // counters only surfaces at action time as GRAFT_K_EXCEEDS_COUNTERS,
    // framed in sketch terms the profiler's caller never wrote
    require(k <= counters,
      s"keySkewReport: k ($k) must be <= counters ($counters) — the report " +
        "can only surface keys the sketch retains")
    df.agg(
        TopnFunctions.topn_add_agg(col(keyCol).cast("string"), counters).as("__sk"),
        count(lit(1)).as("__n"))
      .select(explode(TopnFunctions.topn(col("__sk"), lit(k))).as("__r"),
        col("__n"))
      .select(col("__r.item").as("key"),
        col("__r.frequency").as("freq"),
        // DECIMAL(38) intermediate: freq * 1e6 wraps BIGINT once a key
        // holds > ~9.2e12 rows — inside the 100 TB scale this profiles —
        // and a wrapped share on exactly the hot key defeats the tool
        expr("CAST(CAST(__r.frequency AS DECIMAL(38,0)) * 1000000 DIV __n AS BIGINT)")
          .as("share_e6"),
        col("__n").as("total_rows"))
  }
}
