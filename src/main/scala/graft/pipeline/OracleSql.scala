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
   * contain the substring ` AS (` — ENFORCED at every generator entry
   * point via [[requireNoCteHead]] on each interpolated fragment
   * (label/target expressions, relation names), so a violating caller
   * fails loudly instead of shipping silently corrupted SQL. Recursive
   * CTEs cannot be MATERIALIZED; chains built here are all
   * non-recursive.
   */
  def materializeCtes(ctes: String): String =
    ctes.replace(" AS (", " AS MATERIALIZED (")

  /** Entry-point enforcement of the [[materializeCtes]] contract: a
    * caller-provided fragment (label/target expression, source relation
    * name) interpolated into a CTE chain must not itself contain the
    * ` AS (` substring the rewrite pattern-matches — the blanket replace
    * would silently rewrite it into invalid or wrong SQL. Generators call
    * this on every fragment they interpolate, so the documented contract
    * fails loudly at the boundary instead of corrupting downstream. */
  def requireNoCteHead(fragment: String, what: String): Unit =
    require(!fragment.contains(" AS ("),
      s"$what must not contain the substring ' AS (' — " +
        s"materializeCtes rewrites that pattern as a CTE definition head; got: $fragment")
}
