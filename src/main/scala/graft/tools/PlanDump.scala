package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Plan/timing probe for optimization work: for each named query (or op),
 * prints `.explain("formatted")` to a file and optionally times the
 * noop-sink execution (guide §1.4 — every column of every row computed,
 * no sink cost, no column pruning under a bare count).
 *
 *   SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.PlanDump <outDir> <name1> <name2> ..."
 *
 * Env knobs: SPARK_GRAFT_PLAN_TIME=0 skips the timed run (plans only);
 * SPARK_GRAFT_PLAN_REPS (default 2) timed reps, min kept. Same session
 * config as Bench so the plans match what the bench runs.
 */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PlanDump <outDir> <queryName>...")
    val outDir = args.head
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val doTime = sys.env.getOrElse("SPARK_GRAFT_PLAN_TIME", "1") != "0"
    val reps = sys.env.getOrElse("SPARK_GRAFT_PLAN_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.TopnFunctions.register(spark)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val all = graft.SparkEntry.queries ++ graft.SparkEntry.benchOnly
    names.foreach { name =>
      val fn = all.getOrElse(name,
        sys.error(s"unknown query '$name'; known: ${all.keys.toSeq.sorted.take(20).mkString(", ")}..."))
      spark.sparkContext.setJobDescription(s"plandump: $name")
      val df = fn(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"$name.txt"), plan)
      if (doTime) {
        // warm-up on the smallest SF as the bench does
        try fn(spark, "/root/testdata/sf0.001")
          .write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => }
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"""{"plandump":"$name","noop_min_sec":${ts.min}%.3f,"reps":${ts.mkString("[", ",", "]")}}""")
      } else println(s"""{"plandump":"$name","plan_only":true}""")
    }
    spark.stop()
  }
}
