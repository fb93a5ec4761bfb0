package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/**
 * Interop surfaces: JSON-string sketches (the reference's at-rest JSONB
 * form) and CSV ingest (reference sql/copy_data.sql).
 */
class InteropSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  import spark.implicits._

  test("JSON-string sketches round-trip through from_json/to_json/topn_to_json") {
    val json = """{"apple": 3, "pear": 1, "fig": 7}"""
    val back = Seq(json).toDF("j")
      .select(from_json($"j", org.apache.spark.sql.types.DataType.fromDDL("map<string,bigint>")).as("sketch"))
      .select(TopnFunctions.topn_to_json($"sketch"))
      .as[String].collect().head
    // PG-canonical order: length then bytewise
    assert(back === """{"fig": 7, "pear": 1, "apple": 3}""")
  }

  test("from_json leniency recipe mirrors the reference's non-numeric skip (topn.c:784)") {
    // The reference tolerates degenerate JSONB: {"a": true} contributes
    // nothing, "1.9" parses via atol -> 1. Spark's typed from_json nulls
    // the WHOLE map on a value-type mismatch, so the lenient recipe is:
    // parse as map<string,string>, try_cast values via double (truncating
    // like atol), and let the aggregate skip the resulting nulls.
    val json = """{"a": true, "b": 2, "c": null, "d": "1.9"}"""
    val merged = Seq(json).toDF("j")
      .select(transform_values(
        from_json($"j", org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")),
        (_, v) => v.try_cast(org.apache.spark.sql.types.DoubleType)
          .try_cast(org.apache.spark.sql.types.LongType)).as("sketch"))
      .agg(TopnFunctions.topn_union_agg($"sketch"))
      .collect().head.getMap[String, Long](0).toMap
    // non-numeric values skipped; "1.9" truncates to 1 like the reference
    assert(merged === Map("b" -> 2L, "d" -> 1L))
  }

  test("CSV ingest with the customer_reviews schema (copy_data.sql:1-16)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv")
    val csv =
      """c1,1998-01-02,5,10,8,P000000001,Some Title,1000,Book,Fiction,Novels,"P2,P3"
        |c2,1998-01-03,4,2,1,P000000001,Some Title,1000,Book,Fiction,Novels,
        |c3,1998-01-04,3,0,0,P000000002,Other,2000,Music,Rock,,""".stripMargin
    java.nio.file.Files.writeString(dir.resolve("reviews.csv"), csv)
    val ddl = """customer_id STRING, review_date DATE, review_rating INT,
      review_votes INT, review_helpful_votes INT, product_id STRING,
      product_title STRING, product_sales_rank BIGINT, product_group STRING,
      product_category STRING, product_subcategory STRING, similar_product_ids STRING"""
    val df = graft.sources.Tables.csv(spark, dir.toString + "/reviews.csv", ddl)
    assert(df.count() === 3)
    // the CHAR(10)[] column arrives as a string; split on demand
    val similar = df.filter($"customer_id" === "c1")
      .select(split($"similar_product_ids", ",")).as[Seq[String]].collect().head
    assert(similar === Seq("P2", "P3"))
    // and straight into the flagship flow
    val top = df.groupBy($"product_category")
      .agg(TopnFunctions.topn_add_agg($"product_id").as("s"))
      .select($"product_category", explode(TopnFunctions.topn($"s", lit(1))).as("r"))
      .select($"product_category", $"r.item").as[(String, String)]
      .collect().toMap
    assert(top("Fiction") === "P000000001")
  }
}
