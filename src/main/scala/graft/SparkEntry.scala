package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every query here returns a DataFrame whose rows/schema are reproduced
  * exactly by the DuckDB SQL in [[oracleSql]] (same column names, same
  * deterministic ORDER BY). Sketch queries run with a counter budget far
  * above the data's distinct counts, so the approximate sketch is exact and
  * oracle-comparable (SURVEY §2.8.3); the approximation path itself is
  * covered by ScalaTest suites instead.
  */
object SparkEntry {

  /** Counter budget that exceeds every distinct count in the testdata, so
    * sketch results are exact (no policy-B eviction fires). */
  private val ExactN = 2000000

  private def tbl(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0.
    * README.md:84-116 flow: per-month rollup sketches -> union -> top-10. */
  def entry(spark: SparkSession): DataFrame = {
    import spark.implicits._
    TopnFunctions.register(spark)
    val orders = tbl(spark, "/root/testdata/sf0.001", "orders")
    val rollup = orders
      .groupBy(date_trunc("month", $"o_orderdate").as("month"))
      .agg(TopnFunctions.topn_add_agg($"o_custkey".cast("string"), ExactN).as("sketch"))
    rollup
      .agg(TopnFunctions.topn_union_agg($"sketch", ExactN).as("merged"))
      .select(explode(TopnFunctions.topn($"merged", lit(10))).as("r"))
      .select($"r.item", $"r.frequency")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference parity: the sketch aggregate family -------------------

    // topn_add_agg + topn() through GROUP BY (SURVEY §2.1 rows 1,4; §2.5)
    "topn_add_agg_groupby" -> ((spark, dir) => {
      import spark.implicits._
      tbl(spark, dir, "orders")
        .groupBy($"o_orderpriority")
        .agg(TopnFunctions.topn_add_agg($"o_custkey".cast("string"), ExactN).as("sketch"))
        .select($"o_orderpriority", explode(TopnFunctions.topn($"sketch", lit(10))).as("r"))
        .select($"o_orderpriority", $"r.item".as("item"), $"r.frequency".as("frequency"))
        .orderBy($"o_orderpriority", $"frequency".desc, $"item")
    }),

    // topn_union_agg re-aggregation of stored rollup sketches (§2.1 row 5;
    // README.md:100-116 incremental-rollup story)
    "topn_union_agg_rollup" -> ((spark, dir) => {
      import spark.implicits._
      val monthly = tbl(spark, dir, "orders")
        .groupBy(date_trunc("month", $"o_orderdate").as("month"))
        .agg(TopnFunctions.topn_add_agg($"o_custkey".cast("string"), ExactN).as("sketch"))
      monthly
        .agg(TopnFunctions.topn_union_agg($"sketch", ExactN).as("merged"))
        .select(explode(TopnFunctions.topn($"merged", lit(25))).as("r"))
        .select($"r.item".as("item"), $"r.frequency".as("frequency"))
        .orderBy($"frequency".desc, $"item")
    }),

    // scalar topn_add + topn_union pipeline (§2.1 rows 2,3)
    "topn_scalar_pipeline" -> ((spark, dir) => {
      import spark.implicits._
      val orders = tbl(spark, dir, "orders")
      val lo = orders.filter($"o_totalprice" < 50000)
        .agg(TopnFunctions.topn_add_agg($"o_orderpriority", ExactN).as("lo"))
      val hi = orders.filter($"o_totalprice" >= 50000)
        .agg(TopnFunctions.topn_add_agg($"o_orderpriority", ExactN).as("hi"))
      lo.crossJoin(hi)
        .select(TopnFunctions.topn_add(
          TopnFunctions.topn_union($"lo", $"hi"), lit("1-URGENT")).as("merged"))
        .select(explode(TopnFunctions.topn($"merged", lit(10))).as("r"))
        .select($"r.item".as("item"), $"r.frequency".as("frequency"))
        .orderBy($"frequency".desc, $"item")
    }),

    // sliding window merge over daily rollups (§2.6; customer_reviews_query
    // .sql:58-70 "seven_days" frame)
    "topn_window_7day" -> ((spark, dir) => {
      import spark.implicits._
      val daily = tbl(spark, dir, "orders")
        .groupBy(date_format($"o_orderdate", "yyyy-MM-dd").as("day"))
        .agg(TopnFunctions.topn_add_agg($"o_custkey".cast("string"), ExactN).as("sketch"))
      val w = Window.orderBy($"day").rowsBetween(-6, Window.currentRow)
      daily
        .withColumn("merged", TopnFunctions.topn_union_agg($"sketch", ExactN).over(w))
        .select($"day", explode(TopnFunctions.topn($"merged", lit(5))).as("r"))
        .select($"day", $"r.item".as("item"), $"r.frequency".as("frequency"))
        .orderBy($"day", $"frequency".desc, $"item")
    })
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "topn_add_agg_groupby" ->
      """SELECT o_orderpriority, item, frequency FROM (
        |  SELECT o_orderpriority, CAST(o_custkey AS VARCHAR) AS item,
        |         COUNT(*) AS frequency,
        |         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY COUNT(*) DESC, CAST(o_custkey AS VARCHAR)) AS rn
        |  FROM orders GROUP BY 1, 2) t
        |WHERE rn <= 10
        |ORDER BY o_orderpriority, frequency DESC, item""".stripMargin,

    "topn_union_agg_rollup" ->
      """SELECT CAST(o_custkey AS VARCHAR) AS item, COUNT(*) AS frequency
        |FROM orders GROUP BY 1
        |ORDER BY frequency DESC, item LIMIT 25""".stripMargin,

    "topn_scalar_pipeline" ->
      """SELECT item, frequency FROM (
        |  SELECT o_orderpriority AS item,
        |         COUNT(*) + CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS frequency
        |  FROM orders GROUP BY 1) t
        |ORDER BY frequency DESC, item""".stripMargin,

    "topn_window_7day" ->
      """WITH daily AS (
        |  SELECT STRFTIME(o_orderdate, '%Y-%m-%d') AS day, CAST(o_custkey AS VARCHAR) AS item,
        |         COUNT(*) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |days AS (
        |  SELECT day, ROW_NUMBER() OVER (ORDER BY day) AS rk
        |  FROM (SELECT DISTINCT day FROM daily) d),
        |merged AS (
        |  SELECT d.day, dl.item, CAST(SUM(dl.cnt) AS BIGINT) AS frequency
        |  FROM days d
        |  JOIN days d2 ON d2.rk BETWEEN d.rk - 6 AND d.rk
        |  JOIN daily dl ON dl.day = d2.day
        |  GROUP BY 1, 2),
        |ranked AS (
        |  SELECT day, item, frequency,
        |         ROW_NUMBER() OVER (PARTITION BY day ORDER BY frequency DESC, item) AS rn
        |  FROM merged)
        |SELECT day, item, frequency FROM ranked WHERE rn <= 5
        |ORDER BY day, frequency DESC, item""".stripMargin
  )
}
