package graft.streaming

import java.sql.Timestamp

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The event-time timer processor: alerts fire only once the watermark
  * passes a click's deadline, purchases resolve in-window clicks, and
  * the emitted set equals the batch anti-interval-join twin (the
  * oracle-backed d38_abandoned_carts) — in one feed and split feeds. */
class AbandonedCartsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val events = Tables.events(spark, sf0001)
    .select("event_id", "ts", "user_id", "event_type", "value").cache()

  private def streamed(chunks: Seq[Seq[Ev]]): Seq[(Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Ev]
    val name = "cart_sink_" + chunks.size
    val q = AbandonedCarts.abandonedStream(
        input.toDF().withWatermark("ts", "0 seconds"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    // flush: a far-future event pushes the watermark past every deadline
    val maxTs = events.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val flush = new Timestamp(maxTs.getTime + 48L * 3600 * 1000)
    input.addData(Seq(Ev(-1L, flush, -1L, "view", 0.0)))
    q.processAllAvailable()
    // one more empty-ish trigger so timers registered at the watermark
    // boundary fire
    input.addData(Seq(Ev(-2L, new Timestamp(flush.getTime + 1000), -1L,
      "view", 0.0)))
    q.processAllAvailable()
    q.stop()
    spark.table(name).where(col("user_id") =!= -1L)
      .select("user_id", "click_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
  }

  private lazy val batch = AbandonedCarts.abandonedBatch(events)
    .select("user_id", "click_id")
    .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted

  test("hand fixture: purchase resolves in-window clicks, boundary inclusive") {
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      Ev(1L, ts("2024-01-01 10:00:00"), 1L, "click", 0.0),    // resolved (p at +30:00 exactly)
      Ev(2L, ts("2024-01-01 10:29:59"), 1L, "click", 0.0),    // resolved
      Ev(3L, ts("2024-01-01 10:30:00"), 1L, "purchase", 1.0),
      Ev(4L, ts("2024-01-01 11:00:01"), 1L, "click", 0.0),    // abandoned
      Ev(5L, ts("2024-01-01 09:00:00"), 2L, "click", 0.0),    // abandoned (p too late)
      Ev(6L, ts("2024-01-01 09:40:00"), 2L, "purchase", 1.0), // > 30 min later — wait, 40 min
      Ev(7L, ts("2024-01-01 12:00:00"), 3L, "purchase", 1.0)) // purchase w/o click: no alert
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val got = AbandonedCarts.abandonedBatch(ev)
      .select("click_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(4L, 5L))
  }

  test("stream == batch on real events (single feed)") {
    val rows = events.as[Ev].collect().toSeq
    assert(batch.nonEmpty, "fixture must contain abandoned carts")
    assert(streamed(Seq(rows)) === batch)
  }

  test("stream == batch with a time-split feed (state + timers carry over)") {
    val rows = events.as[Ev].collect().toSeq.sortBy(_.ts.getTime)
    val (a, b) = rows.splitAt(rows.size / 2)
    assert(streamed(Seq(a, b)) === batch)
  }
}
