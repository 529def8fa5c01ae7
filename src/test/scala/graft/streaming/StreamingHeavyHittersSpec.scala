package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming Misra–Gries: the transformWithState fold must equal the
  * batch `graft_topk_freq` aggregate in the exact-capacity regime —
  * in one trigger and split across two (mergeability over time). */
class StreamingHeavyHittersSpec extends SparkSpec {

  import spark.implicits._

  private val K = 10
  private val Cap = 65536

  private lazy val items: Seq[FreqItem] = {
    val df = Tables.documents(spark, sf0001)
      .select(col("lang"),
        explode(graft.text.TextFunctions.tokens(col("text"))).as("token"))
    StreamingHeavyHitters.toItems(df, "lang", "token").collect().toSeq
  }

  private def streamed(chunks: Seq[Seq[FreqItem]]): Seq[(String, String, Long, Int)] = {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[FreqItem]
    val name = "hh_sink_" + chunks.size
    val q = StreamingHeavyHitters.topKStream(input.toDS(), K, Cap)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    // each trigger appends a refreshed top-k; the rows at each key's
    // final n_seen are the current answer
    val t = spark.table(name)
    val latest = t.groupBy(col("key").as("k2")).agg(max("n_seen").as("mx"))
    t.join(latest, col("key") === col("k2") && col("n_seen") === col("mx"))
      .select("key", "item", "cnt", "rank")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSeq.sorted
  }

  private lazy val batch = StreamingHeavyHitters.topKBatch(
      items.toDS(), K, Cap)
    .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
    .toSeq.sorted

  test("one trigger == batch graft_topk_freq (exact regime)") {
    assert(batch.nonEmpty)
    assert(streamed(Seq(items)) === batch)
  }

  test("state merges across triggers: two-chunk feed == batch") {
    val (a, b) = items.splitAt(items.size / 2)
    assert(streamed(Seq(a, b)) === batch)
  }
}
