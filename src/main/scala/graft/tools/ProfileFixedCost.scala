package graft.tools

import org.apache.spark.sql.SparkSession

/** Attribution of the per-query FIXED cost (VERDICT r17 #8): at sf0.1
  * the suite's cheapest rows read ~0.3–0.7 s, and with 348 rows that
  * floor dominates the bench total. This probe separates, inside one
  * bench-shaped session:
  *
  *   floor    — one noop write of a pre-built trivial frame (pure
  *              job-scheduling + task-launch cost at 32 threads);
  *   build    — constructing a registered query's DataFrame (catalog/
  *              analysis/planning, plus any eager checkpoint jobs);
  *   action   — the noop write of that DataFrame.
  *
  * Representative rows: a pure scan-projection (b2), an aggregation
  * (d18_histogram), and a scratch-dir index query (c2_incremental_
  * persisted) whose build writes state. Reps with min reported.
  */
object ProfileFixedCost {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = args.lift(0).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def minOf(tag: String)(body: => Unit): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"$tag%-34s min=${ts.min}%6.3f s  " +
        s"all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }

    val trivial = spark.range(1000).toDF("id").localCheckpoint()
    minOf("floor: noop of materialized 1k") {
      trivial.write.mode("overwrite").format("noop").save()
    }
    minOf("floor: 1-shuffle agg + noop") {
      spark.range(100000).groupBy((org.apache.spark.sql.functions
        .col("id") % 100).as("k")).count()
        .write.mode("overwrite").format("noop").save()
    }
    for (q <- Seq("b2_filter_project", "d18_histogram",
        "c5_token_counts", "c2_incremental_persisted")) {
      val fn = graft.SparkEntry.queries(q)
      minOf(s"$q build") { fn(spark, sfDir) }
      val df = fn(spark, sfDir)
      minOf(s"$q action") {
        df.write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
