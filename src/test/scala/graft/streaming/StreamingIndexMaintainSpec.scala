package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-maintained serving indexes ≡ the batch-merged index ≡ (via
  * each merge's own spec) a one-shot rebuild over everything seen. */
class StreamingIndexMaintainSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("streamed lexical merges serve exactly like a one-shot rebuild") {
    val docs = Tables.documents(spark, sf0001).localCheckpoint()
    val corpus = docs.filter(col("doc_id") >= 10)
    val queries = docs.filter(col("doc_id") < 10)
    val initial = corpus.filter(pmod(col("doc_id"), lit(3)) === 0)
    // two "days" of feed, disjoint from the initial build
    val day1 = corpus.filter(pmod(col("doc_id"), lit(3)) === 1)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val day2 = corpus.filter(pmod(col("doc_id"), lit(3)) === 2)
      .select("doc_id", "text").as[(Long, String)].collect().toSeq
    val idxPath = tmp("lex_stream")
    graft.text.LexicalIndex.write(initial, "doc_id", "text",
      table = "lex_stream_postings", path = idxPath, numBuckets = 4)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = StreamingIndexMaintain.runLexical(
      input.toDF().toDF("doc_id", "text"), "doc_id", "text",
      "lex_stream_postings", idxPath, tmp("lex_ck"), numBuckets = 4)
    Seq(day1, day2).foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    val served = graft.text.LexicalIndex.topK(spark,
      "lex_stream_postings", idxPath, queries, "doc_id", "text", k = 5)
    val fullPath = tmp("lex_full")
    graft.text.LexicalIndex.write(corpus, "doc_id", "text",
      table = "lex_stream_full", path = fullPath, numBuckets = 4)
    val rebuilt = graft.text.LexicalIndex.topK(spark,
      "lex_stream_full", fullPath, queries, "doc_id", "text", k = 5)
    assert(served.count() > 0)
    assert(served.exceptAll(rebuilt).isEmpty &&
           rebuilt.exceptAll(served).isEmpty,
      "stream-maintained index diverged from the one-shot rebuild")
  }
}
