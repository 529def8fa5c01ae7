package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {

  private def naiveOffsets = {
    // the textbook single-window exclusive cumsum (what the DuckDB
    // oracle runs) — correct but single-partition, the thing
    // Packing.globalOffsets exists to avoid
    val w = Window.orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(spark, sf0001)
      .select(col("doc_id"), TextFunctions.wordCount(col("text")).as("n"))
      .filter(col("n") > 0)
      .withColumn("start_off", coalesce(sum(col("n")).over(w), lit(0L)))
      .select("doc_id", "start_off")
  }

  test("two-level block prefix sum equals the naive single-window cumsum") {
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), TextFunctions.wordCount(col("text")).as("n"))
      .filter(col("n") > 0)
    for (blockSize <- Seq(1L, 7L, 64L, 1L << 20)) {
      val got = Packing.globalOffsets(docs, "doc_id", "n", blockSize)
        .select("doc_id", "start_off")
      assert(got.exceptAll(naiveOffsets).isEmpty &&
        naiveOffsets.exceptAll(got).isEmpty,
        s"offsets diverge at blockSize=$blockSize")
    }
  }

  test("packing lays tokens end-to-end: offsets contiguous, spans disjoint") {
    // NOTE: do not .cache() this frame — its plan is identical to the
    // c5_sequence_packing query's, and a live cache entry would
    // substitute an InMemoryRelation into PlanQualitySpec's
    // window-structure assertion (suites share the session and can run
    // concurrently)
    val packed = Packing.docPacking(Tables.documents(spark, sf0001),
      "doc_id", "text", seqLen = 256, blockSize = 64).localCheckpoint()
    // each doc starts exactly where the previous one ended
    val w = Window.orderBy(col("doc_id"))
    val gaps = packed
      .withColumn("prev_end", lag(col("start_off") + col("n_tokens"), 1, 0L).over(w))
      .filter(col("start_off") =!= col("prev_end"))
    assert(gaps.count() === 0, "token stream has a gap or overlap")
    // total stream length = sum of doc lengths
    val Array(total, maxEnd) = packed
      .agg(sum("n_tokens"), max(col("start_off") + col("n_tokens")))
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).toArray
    assert(total === maxEnd)
    // sequence indices follow from offsets by pure integer division
    val bad = packed.filter(
      col("seq_first") =!= expr("start_off DIV 256") ||
      col("seq_last") =!= expr("(start_off + n_tokens - 1) DIV 256") ||
      col("n_seqs") =!= col("seq_last") - col("seq_first") + 1)
    assert(bad.count() === 0)
  }
}
