package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared ground-truth machinery for dedup precision/recall
  * measurements — used by StreamingNearDedupSpec (the CI floor) and
  * tools.MeasureOnlinePrecision (the geometry-sweep tool), so the
  * definition of "true near-dup" cannot silently diverge between the
  * spec and the measurement.
  *
  * All-pairs exact Jaccard: evaluation corpora only (the measured
  * thing at scale is the LSH approximation of exactly this). */
object DedupGroundTruth {

  /** (a, b) pairs with a < b and exact token-set Jaccard ≥ threshold. */
  def jaccardTruthPairs(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double, shingleSize: Int = 1): DataFrame = {
    val l = docs.select(col(idCol).as("a"), col(textCol).as("__ta"))
    val r = docs.select(col(idCol).as("b"), col(textCol).as("__tb"))
    l.join(r, col("a") < col("b"))
      .withColumn("j", MinHashDedup.jaccard(col("__ta"), col("__tb"), shingleSize))
      .filter(col("j") >= threshold)
      .select(col("a"), col("b"))
  }

  /** First-wins quality counts against a truth edge set:
    * (nDropped, justifiedDrops, nTrueDupLater, caughtTrueDups).
    * A drop is justified iff some EARLIER doc is a truth-partner; a
    * later doc with an earlier truth-partner should have been dropped. */
  def firstWinsQuality(docs: DataFrame, idCol: String, kept: DataFrame,
                       truth: DataFrame): (Long, Long, Long, Long) = {
    val dropped = docs.select(col(idCol)).exceptAll(kept.select(col(idCol))).cache()
    val nDropped = dropped.count()
    val justified = dropped
      .join(truth, dropped(idCol) === truth("b"), "left_semi").count()
    val trueDupLater = docs.select(col(idCol))
      .join(truth, col(idCol) === truth("b"), "left_semi").cache()
    val nTrueDup = trueDupLater.count()
    val caught = trueDupLater
      .join(dropped.withColumnRenamed(idCol, "__d"),
        col(idCol) === col("__d"), "left_semi").count()
    (nDropped, justified, nTrueDup, caught)
  }
}
