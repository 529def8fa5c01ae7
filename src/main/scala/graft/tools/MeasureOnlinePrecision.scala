package graft.tools

import graft.Tables
import graft.dedup.MinHashDedup
import graft.streaming.StreamingNearDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: measure online-dedup drop precision against exact
  * token-set Jaccard ground truth (is each dropped doc actually a
  * near-dup of some earlier doc?), across band geometries. */
object MeasureOnlinePrecision {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text")).cache()
      val n = docs.count()
      // exact pairwise token-set jaccard (small corpora only)
      val l = docs.select(col("doc_id").as("a"), col("text").as("__ta"))
      val r = docs.select(col("doc_id").as("b"), col("text").as("__tb"))
      val truth = l.join(r, col("a") < col("b"))
        .withColumn("j", MinHashDedup.jaccard(col("__ta"), col("__tb"), 1))
        .filter(col("j") >= 0.5)
        .select(col("a"), col("b")).cache()
      println(s"== $sf: $n docs, ${truth.count()} pairs with jaccard>=0.5")
      for ((nh, bands) <- Seq((16, 4), (16, 2), (16, 8))) {
        val kept = StreamingNearDedup.keptBatch(docs, "doc_id", "text",
          numHashes = nh, bands = bands).select(col("doc_id")).cache()
        val dropped = docs.select(col("doc_id")).exceptAll(kept).cache()
        val nKept = kept.count(); val nDropped = dropped.count()
        // dropped doc justified iff an EARLIER doc has jaccard >= 0.5 with it
        val justified = dropped.join(truth, dropped("doc_id") === truth("b"), "left_semi").count()
        // recall: true-dup later docs (have an earlier >=0.5 partner) that were dropped
        val trueDupLater = docs.select(col("doc_id"))
          .join(truth, col("doc_id") === truth("b"), "left_semi").cache()
        val nTrueDup = trueDupLater.count()
        val caught = trueDupLater.join(dropped.withColumnRenamed("doc_id", "d"),
          col("doc_id") === col("d"), "left_semi").count()
        println(f"  k=$nh bands=$bands rows=${nh / bands}: kept=$nKept dropped=$nDropped " +
          f"precision=${if (nDropped == 0) 1.0 else justified.toDouble / nDropped}%.3f " +
          f"recall=${if (nTrueDup == 0) 1.0 else caught.toDouble / nTrueDup}%.3f (trueDupLater=$nTrueDup)")
      }
    }
    spark.stop()
  }
}
