package graft.streaming

import java.sql.Timestamp

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Per-key rate limiting: the pure fold, the batch window twin (the
  * oracle-backed query d29_rate_limit), and the transformWithState
  * streaming form must all agree — in one trigger and split across
  * two. */
class RateLimitSpec extends SparkSpec {

  import spark.implicits._

  private val Cap = 3

  private lazy val batchEvents = Tables.events(spark, sf0001)
    .select("event_id", "ts", "user_id", "event_type", "value").cache()

  private def ts(s: String) = Timestamp.valueOf(s)

  private def ev(id: Long, t: String, user: Long = 1L) =
    QuotaEvent(id, user, ts(t), ts(t).getTime * 1000L, "click")

  test("fold: cap admits first N per hour, resets at the hour boundary") {
    val events = Seq(
      ev(1, "2024-01-01 10:00:01"), ev(2, "2024-01-01 10:10:00"),
      ev(3, "2024-01-01 10:20:00"), ev(4, "2024-01-01 10:30:00"),
      ev(5, "2024-01-01 10:59:59"), ev(6, "2024-01-01 11:00:00"),
      ev(7, "2024-01-01 11:00:01"))
    val (out, state) = RateLimit.foldQuota(events,
      QuotaState(Long.MinValue, 0L), Cap)
    assert(out.map(_.n_in_hour) === Seq(1, 2, 3, 4, 5, 1, 2))
    assert(out.map(_.admitted) === Seq(1, 1, 1, 0, 0, 1, 1))
    // state carries the 11:00 bucket with 2 arrivals
    assert(state.n === 2L)
  }

  test("fold: carried state continues the same hour across calls") {
    val (first, s1) = RateLimit.foldQuota(
      Seq(ev(1, "2024-01-01 10:00:01"), ev(2, "2024-01-01 10:10:00")),
      QuotaState(Long.MinValue, 0L), Cap)
    val (second, _) = RateLimit.foldQuota(
      Seq(ev(3, "2024-01-01 10:20:00"), ev(4, "2024-01-01 10:30:00")),
      s1, Cap)
    assert(first.map(_.n_in_hour) === Seq(1, 2))
    assert(second.map(_.n_in_hour) === Seq(3, 4))
    assert(second.map(_.admitted) === Seq(1, 0))
  }

  test("batch window twin ≡ the fold on real events (day buckets)") {
    val byWindow = RateLimit.capBatch(batchEvents, Cap, truncUnit = "day")
      .select("event_id", "n_in_hour", "admitted")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val byFold = RateLimit.toQuotaEvents(batchEvents)
      .collect().groupBy(_.user_id).flatMap { case (_, evs) =>
        RateLimit.foldQuota(evs.sortBy(e => (e.ts_us, e.event_id)).toSeq,
          QuotaState(Long.MinValue, 0L), Cap, RateLimit.DayUs)._1
      }
      .map(d => d.event_id -> (d.n_in_hour, d.admitted)).toMap
    assert(byWindow.nonEmpty && byWindow === byFold)
    // the cap binds somewhere on the fixture (max 7/user-day at sf0.001)
    assert(byWindow.values.exists(_._2 == 0))
  }

  private def streamed(chunks: Seq[Seq[Ev]]): org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Ev]
    val name = "quota_sink_" + chunks.size
    val q = RateLimit.capStream(input.toDF(), Cap, RateLimit.DayUs)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    spark.table(name)
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.select("event_id", "user_id", "event_type", "n_in_hour", "admitted")
      .orderBy("user_id", "event_id").collect().toSeq

  test("transformWithState: one trigger == batch twin") {
    val rows = batchEvents.as[Ev].collect().toSeq
    val stream = sortedRows(streamed(Seq(rows)))
    val batch = sortedRows(RateLimit.capBatch(batchEvents, Cap, "day"))
    assert(batch.nonEmpty)
    assert(stream === batch)
  }

  test("transformWithState: state carries across triggers (time-split feed)") {
    val rows = batchEvents.as[Ev].collect().toSeq.sortBy(_.ts.getTime)
    val (first, second) = rows.splitAt(rows.size / 2)
    val stream = sortedRows(streamed(Seq(first, second)))
    val batch = sortedRows(RateLimit.capBatch(batchEvents, Cap, "day"))
    assert(stream === batch)
  }
}
