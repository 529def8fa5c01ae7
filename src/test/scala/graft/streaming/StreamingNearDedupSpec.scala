package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Doc(doc_id: Long, text: String)

/** Online (first-wins) near-dup dedup: the streaming claim machine fed
  * through MemoryStream — in one trigger and split across several —
  * must keep exactly the docs the batch twin keeps, and the batch twin
  * is oracle-backed (c2_online_dedup_twin). */
class StreamingNearDedupSpec extends SparkSpec {

  import spark.implicits._

  private def streamKept(chunks: Seq[Seq[Doc]], name: String): Set[Long] = {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Doc]
    val kept = scala.collection.mutable.Set[Long]()
    val q = StreamingNearDedup.bandVerdicts(input.toDF(), "doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        kept ++= StreamingNearDedup.resolveKept(batch)
          .collect().map(_.getLong(0))
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"neardedup_$name").toString)
      .start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    kept.toSet
  }

  private lazy val corpus = Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("text")).as[Doc].collect().toSeq
    .sortBy(_.doc_id)

  private lazy val batchKept =
    StreamingNearDedup.keptBatch(Tables.documents(spark, sf0001),
      "doc_id", "text").collect().map(_.getLong(0)).toSet

  test("streaming == batch twin, single trigger") {
    val got = streamKept(Seq(corpus), "one")
    assert(batchKept.nonEmpty && batchKept.size < corpus.size,
      "corpus should contain near-dups for the test to bite")
    assert(got === batchKept)
  }

  test("streaming == batch twin, arrival split across three triggers") {
    val third = corpus.size / 3
    val chunks = Seq(corpus.take(third),
      corpus.slice(third, 2 * third), corpus.drop(2 * third))
    assert(streamKept(chunks, "three") === batchKept)
  }

  test("first-wins semantics: later duplicate dropped, unseen doc kept") {
    val a = Doc(1L, "alpha beta gamma delta epsilon zeta")
    val dupOfA = Doc(2L, "alpha beta gamma delta epsilon zeta")
    val fresh = Doc(3L, "one two three four five six seven")
    val got = streamKept(Seq(Seq(a), Seq(dupOfA, fresh)), "firstwins")
    assert(got === Set(1L, 3L))
  }
}
