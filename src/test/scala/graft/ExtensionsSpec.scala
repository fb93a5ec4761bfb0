package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-wide registration path: `spark.sql.extensions=graft.GraftExtensions`. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects the full function surface") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    import org.apache.spark.sql.graftshim.GraftShim
    val injected = GraftShim.applyInjectedFunctions(ext, GraftShim.builtinRegistryClone())
    // both paths read TopnFunctions.catalog — iterate it so a function
    // added to one surface can never silently miss the other
    assert(TopnFunctions.catalog.size >= 21, "catalog unexpectedly shrank")
    for ((name, _, _) <- TopnFunctions.catalog) {
      assert(injected.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)), name)
    }
  }
}
