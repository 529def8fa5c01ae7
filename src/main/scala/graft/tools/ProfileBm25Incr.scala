package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage timing of the c3_bm25_serve_incr chain (write 3/4 corpus,
  * merge 1/4, serve) — which of the three legs carries the ~4.7 s
  * isolated cost, and how many Spark jobs each leg schedules.
  * Usage: runMain graft.tools.ProfileBm25Incr [sfDir] [reps]
  */
object ProfileBm25Incr {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val sc = spark.sparkContext
    def jobsNow(): Int = sc.statusTracker.getJobIdsForGroup(null).length

    (1 to reps).foreach { r =>
      val docs = Tables.documents(spark, sfDir)
      val tmp = java.nio.file.Files
        .createTempDirectory(s"bm25incr$r").toString
      val tbl = s"profile_bm25_incr_$r"
      def leg(tag: String)(body: => Unit): Unit = {
        val j0 = jobsNow(); val t0 = System.nanoTime()
        body
        println(f"[rep $r] $tag%-8s ${(System.nanoTime() - t0) / 1e9}%6.2f s" +
          f"  jobs=${jobsNow() - j0}")
      }
      leg("write") {
        graft.text.LexicalIndex.write(
          docs.filter(col("doc_id") >= 10 && pmod(col("doc_id"), lit(4)) =!= 0),
          "doc_id", "text", table = tbl, path = s"$tmp/p", numBuckets = 8)
      }
      leg("merge") {
        graft.text.LexicalIndex.merge(spark, tbl, s"$tmp/p",
          docs.filter(col("doc_id") >= 10 && pmod(col("doc_id"), lit(4)) === 0),
          "doc_id", "text", numBuckets = 8)
      }
      leg("serve") {
        graft.text.LexicalIndex.topK(spark, tbl, s"$tmp/p",
          docs.filter(col("doc_id") < 10), "doc_id", "text", k = 5)
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
