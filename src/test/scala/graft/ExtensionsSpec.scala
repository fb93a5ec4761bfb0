package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.scalatest.funsuite.AnyFunSuite

/** The cluster-wide registration path: `spark.sql.extensions=graft.GraftExtensions`. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects the full function surface") {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // building the functions through the injected builders proves the
    // seven functions resolve and bind the session conf default
    import org.apache.spark.sql.graftshim.GraftShim
    val injected = GraftShim.applyInjectedFunctions(ext, GraftShim.builtinRegistryClone())
    for (name <- Seq("topn_add_agg", "topn_union_agg", "topn", "topn_add",
        "topn_union", "topn_to_json", "topn_rows")) {
      assert(injected.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)), name)
    }
  }
}
