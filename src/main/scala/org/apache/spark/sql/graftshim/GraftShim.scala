package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.{ClassicConversions, ExpressionUtils}
import org.apache.spark.sql.internal.SQLConf

/**
 * Bridge into Spark's `private[sql]` surface, hosted under
 * `org.apache.spark.sql` the way other Spark-native libraries do it.
 * Everything funneled through here so the rest of the codebase stays in
 * package `graft`.
 */
object GraftShim {

  /** Catalyst expression behind a user-facing Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /**
   * Fully convert a Column's node tree into ordinary Catalyst expressions
   * (builtin UnresolvedFunctions etc., which the analyzer then resolves).
   * [[expression]] wraps composed Columns in an opaque `ColumnNodeExpression`
   * that is fine inside Dataset plans but Unevaluable when returned from a
   * FunctionRegistry builder — use THIS for function builders that compose
   * `org.apache.spark.sql.functions`.
   */
  def analyzableExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)

  /** Wrap a Catalyst expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Active SQL conf for the current (driver-side) session / task. */
  def sqlConf: SQLConf = SQLConf.get

  def getConf(key: String, default: String): String =
    SQLConf.get.getConfString(key, default)

  /**
   * Register an Expression-level function so it is usable from both
   * `spark.sql` and (via [[column]]) the DataFrame API. The builder runs at
   * analysis time for each query, which is what lets functions late-bind
   * session configuration the way the reference's GUC does.
   */
  def registerFunction(
      spark: SparkSession,
      name: String,
      usage: String,
      builder: Seq[Expression] => Expression): Unit = {
    val session = ClassicConversions.castToImpl(spark)
    val info = new ExpressionInfo("graft", null, name, usage, "")
    session.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), info, builder)
  }

  /** Apply an extensions object's injected functions to a registry (used by
    * tests to validate the `spark.sql.extensions` path). */
  def applyInjectedFunctions(ext: SparkSessionExtensions,
      registry: FunctionRegistry): FunctionRegistry =
    ext.registerFunctions(registry)

  def builtinRegistryClone(): FunctionRegistry = FunctionRegistry.builtin.clone()

  /** Drain the async listener bus (QueryExecutionListener events are
    * delivered asynchronously) — lets tests assert on listener side
    * effects deterministically. */
  def waitForListenerBus(spark: SparkSession): Unit =
    ClassicConversions.castToImpl(spark).sparkContext.listenerBus.waitUntilEmpty()

  /**
   * Free the block-manager storage held by a `localCheckpoint`'ed Dataset.
   * `Dataset.unpersist` only covers CacheManager entries; a checkpoint's
   * blocks belong to the RDD inside its `LogicalRDD` plan, reachable only
   * from the private[sql] execution layer. No-op on non-checkpoint plans.
   */
  def unpersistCheckpoint(df: org.apache.spark.sql.DataFrame): Unit =
    ClassicConversions.castToImpl(df).queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
