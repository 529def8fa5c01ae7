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

  test("streamed KNN-donor merges serve under the frozen geometry") {
    val idxPath = tmp("knn_stream")
    // initial donors on the 0..90 grid; two recipients between points
    val base = ((0 until 10).map(i => (i.toLong, Some(100.0 + i), i * 10.0))
      ++ Seq((100L, Option.empty[Double], 7.0),
             (101L, Option.empty[Double], 33.0)))
      .toDF("id", "v", "x")
    graft.impute.KnnImpute.writeDonorIndex(base, "id", "v", Seq("x"),
      table = "knn_stream_donors", path = idxPath, numCells = 3)
    def serve() = graft.impute.KnnImpute.imputeServe(spark,
        "knn_stream_donors", idxPath, base, "id", "v", Seq("x"),
        k = 1, nProbe = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val before = serve()
    assert(before(100L) === 101.0 && before(101L) === 103.0)
    // stream two batches of closer donors through the maintainer
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Option[Double], Double)]
    val q = StreamingIndexMaintain.runKnnDonor(
      input.toDF().toDF("id", "v", "x"), "id", "v", Seq("x"),
      "knn_stream_donors", idxPath, tmp("knn_ck"))
    input.addData(Seq((50L, Some(555.0), 6.0)))
    q.processAllAvailable()
    input.addData(Seq((51L, Some(777.0), 34.0)))
    q.processAllAvailable()
    q.stop()
    // the merge refreshes the MICRO-BATCH session's table-metadata
    // cache; a different serving session (this one) must refresh its
    // own — standard Spark catalog-cache semantics, documented on
    // runKnnDonor
    spark.catalog.refreshTable("knn_stream_donors")
    val after = serve()
    assert(after(100L) === 555.0 && after(101L) === 777.0)
    assert(after(3L) === 103.0, "known cells untouched")
    assert(spark.table("knn_stream_donors").count() === 12)
  }
}
