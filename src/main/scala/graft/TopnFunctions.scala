package graft

import graft.expressions._

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.GraftShim

/**
 * Public surface of the topn sketch family: SQL registration + typed
 * DataFrame API.
 *
 * SQL names and semantics follow the reference extension
 * (citusdata/postgresql-topn, update/topn--2.0.0.sql):
 *   topn_add_agg(text) / topn_union_agg(sketch)  — aggregates
 *   topn_add(sketch, text) / topn_union(a, b)    — scalars
 *   topn(sketch, k)                              — top-k report (explode it)
 *   topn_to_json(sketch)                         — PG-canonical JSON text
 *
 * The sketch type is `map<string,bigint>`; the counter budget is the session
 * conf `spark.topn.numberOfCounters` (default 1000), read when each query is
 * analyzed — `SET spark.topn.numberOfCounters=k` takes effect for subsequent
 * queries exactly like the reference's live GUC read.
 */
object TopnFunctions {

  /** Register all functions in the session's function registry (usable from
    * `spark.sql` and, mixed with Columns, from the DataFrame API). */
  def register(spark: SparkSession): Unit = {
    GraftShim.registerFunction(spark, "topn_add_agg",
      "topn_add_agg(expr) - builds a topn sketch (map<string,bigint>) of the most frequent values of expr",
      exprs => TopnAddAgg(exprs.head, GraftConf.numberOfCounters))
    GraftShim.registerFunction(spark, "topn_union_agg",
      "topn_union_agg(sketch) - merges a column of topn sketches into one sketch",
      exprs => TopnUnionAgg(exprs.head, GraftConf.numberOfCounters))
    GraftShim.registerFunction(spark, "topn",
      "topn(sketch, k) - top k entries of the sketch as array<struct<item,frequency>>",
      exprs => TopnQuery(exprs(0), exprs(1), GraftConf.numberOfCounters))
    GraftShim.registerFunction(spark, "topn_add",
      "topn_add(sketch, item) - adds one occurrence of item to a materialized sketch",
      exprs => TopnAddScalar(exprs(0), exprs(1), GraftConf.numberOfCounters))
    GraftShim.registerFunction(spark, "topn_union",
      "topn_union(a, b) - merges two materialized sketches",
      exprs => TopnUnionScalar(exprs(0), exprs(1), GraftConf.numberOfCounters))
    GraftShim.registerFunction(spark, "topn_to_json",
      "topn_to_json(sketch) - sketch as JSON text with PostgreSQL-canonical key order",
      exprs => TopnToJson(exprs.head))
    GraftShim.registerFunction(spark, "topn_add_weighted_agg",
      "topn_add_weighted_agg(item, weight) - builds a sketch counting each item `weight` times",
      exprs => TopnAddWeightedAgg(exprs(0), exprs(1), GraftConf.numberOfCounters))
    GraftShim.registerFunction(spark, "topn_rows",
      "topn_rows(sketch, k) - set-returning topn for LATERAL VIEW: rows of (item, frequency)",
      exprs => TopnRows(exprs(0), exprs(1), GraftConf.numberOfCounters))
  }

  // ---- DataFrame API ----------------------------------------------------
  // Conf is resolved when the Column is constructed (driver side).

  def topn_add_agg(item: Column): Column =
    topn_add_agg(item, GraftConf.numberOfCounters)

  def topn_add_agg(item: Column, numCounters: Int): Column =
    GraftShim.column(
      TopnAddAgg(GraftShim.expression(item), numCounters).toAggregateExpression())

  def topn_add_weighted_agg(item: Column, weight: Column, numCounters: Int): Column =
    GraftShim.column(TopnAddWeightedAgg(
      GraftShim.expression(item), GraftShim.expression(weight),
      numCounters).toAggregateExpression())

  def topn_add_weighted_agg(item: Column, weight: Column): Column =
    topn_add_weighted_agg(item, weight, GraftConf.numberOfCounters)

  def topn_union_agg(sketch: Column): Column =
    topn_union_agg(sketch, GraftConf.numberOfCounters)

  def topn_union_agg(sketch: Column, numCounters: Int): Column =
    GraftShim.column(
      TopnUnionAgg(GraftShim.expression(sketch), numCounters).toAggregateExpression())

  def topn(sketch: Column, k: Column): Column =
    GraftShim.column(TopnQuery(
      GraftShim.expression(sketch), GraftShim.expression(k),
      GraftConf.numberOfCounters))

  def topn_add(sketch: Column, item: Column): Column =
    GraftShim.column(TopnAddScalar(
      GraftShim.expression(sketch), GraftShim.expression(item),
      GraftConf.numberOfCounters))

  def topn_union(a: Column, b: Column): Column =
    GraftShim.column(TopnUnionScalar(
      GraftShim.expression(a), GraftShim.expression(b),
      GraftConf.numberOfCounters))

  def topn_to_json(sketch: Column): Column =
    GraftShim.column(TopnToJson(GraftShim.expression(sketch)))
}

/**
 * Production registration path:
 * `spark.sql.extensions=graft.GraftExtensions` (or
 * `SparkSession.builder().withExtensions(new GraftExtensions)`), so every
 * session on a cluster gets the functions without explicit register() calls.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def inject(name: String, builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        org.apache.spark.sql.catalyst.FunctionIdentifier(name),
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
        builder))

    inject("topn_add_agg", exprs => TopnAddAgg(exprs.head, GraftConf.numberOfCounters))
    inject("topn_union_agg", exprs => TopnUnionAgg(exprs.head, GraftConf.numberOfCounters))
    inject("topn", exprs => TopnQuery(exprs(0), exprs(1), GraftConf.numberOfCounters))
    inject("topn_add", exprs => TopnAddScalar(exprs(0), exprs(1), GraftConf.numberOfCounters))
    inject("topn_union", exprs => TopnUnionScalar(exprs(0), exprs(1), GraftConf.numberOfCounters))
    inject("topn_to_json", exprs => TopnToJson(exprs.head))
    inject("topn_add_weighted_agg",
      exprs => TopnAddWeightedAgg(exprs(0), exprs(1), GraftConf.numberOfCounters))
    inject("topn_rows", exprs => TopnRows(exprs(0), exprs(1), GraftConf.numberOfCounters))
  }
}
