package graft.pipeline

/**
 * Shared post-processing for the engine-neutral oracle-SQL generators
 * (BPE training, PageRank, classifier GD — any unrolled K-iteration CTE
 * chain).
 */
private[graft] object OracleSql {

  /**
   * Pin every CTE in an assembled chain to evaluate ONCE: DuckDB 1.x
   * INLINES a CTE at each reference site by default, so an unrolled
   * K-stage chain where stage k reads stage k-1 more than once (argmax
   * scalar subqueries, L1-delta stages, per-iteration gradient joins)
   * re-executes the whole prefix EXPONENTIALLY — measured: a 7-node
   * PageRank at 565 s, the K=8 BPE replay at 690 s; both millisecond
   * plans under MATERIALIZED. Pure evaluation-order pragma —
   * bit-identical results.
   *
   * Contract: the rewrite targets the ` AS (` of CTE definitions, so a
   * generator calling this must not interpolate caller fragments that
   * contain the substring ` AS (` (none of the generator surfaces do —
   * label/target expressions are scalar booleans/columns and `src` is a
   * relation name). Recursive CTEs cannot be MATERIALIZED; chains built
   * here are all non-recursive.
   */
  def materializeCtes(ctes: String): String =
    ctes.replace(" AS (", " AS MATERIALIZED (")
}
