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
    // both paths read TopnFunctions.catalog, so asserting every catalog
    // name resolves covers the whole surface (topn family + pipeline fns)
    for (name <- Seq("topn_add_agg", "topn_union_agg", "topn", "topn_add",
        "topn_union", "topn_to_json", "topn_add_weighted_agg", "topn_rows",
        "cosine_sim", "simhash64", "token_shingles", "minhash_signature",
        "topk_by_score", "lsh_buckets")) {
      assert(injected.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(name)), name)
    }
  }
}
