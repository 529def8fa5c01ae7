package graft.tools

import graft.Tables
import graft.dedup.MinHashDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiling harness for the c2_online_dedup_twin hotspot. */
object ProfileOnlineDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm-up
    spark.range(1000000).selectExpr("sum(id)").collect()

    val docs = Tables.documents(spark, sf)
    println(s"scan partitions: ${docs.rdd.getNumPartitions}")

    // phase 1: banded docs projection alone
    val banded = MinHashDedup.portableBandedDocs(docs, "doc_id", "text")
    time("bandedDocs count")(banded.count())
    time("bandedDocs count (2nd)")(banded.count())

    // phase 2: claims (explode) alone
    val claims = banded.select(col("doc_id").cast("long").as("doc_id"),
      explode(col("buckets")).as("bucket"))
    time("claims count")(claims.count())

    // phase 3: claims + localCheckpoint
    val ck = time("claims localCheckpoint")(claims.localCheckpoint())

    // phase 4: downstream aggregation from checkpoint
    time("downstream from ck") {
      val keepers = ck.groupBy(col("bucket")).agg(min(col("doc_id")).as("keeper"))
      ck.join(keepers, "bucket")
        .groupBy(col("doc_id"))
        .agg(min(col("doc_id") === col("keeper")).as("all_first"))
        .filter(col("all_first")).count()
    }

    // full current implementation for reference
    time("keptBatch full")(
      graft.streaming.StreamingNearDedup.keptBatch(docs, "doc_id", "text").count())

    // the claims plan — look for Horner-hash duplication after collapse
    println(claims.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
