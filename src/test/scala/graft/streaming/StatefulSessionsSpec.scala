package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class RawEv(event_id: Long, ts: Timestamp, user_id: Long,
                 event_type: String, value: Double)

/** C9/C10 custom state: the capped-session operator. The pure fold is
  * unit-tested directly; the streaming wrapper is checked for batch
  * equivalence (same rows through MemoryStream + watermark-driven
  * timeouts must equal the batch twin, which is itself oracle-backed
  * via b12_capped_sessions). */
class StatefulSessionsSpec extends SparkSpec {

  import spark.implicits._

  private def ev(id: Long, uid: Long, us: Long, cents: Long) =
    SessionEvent(id, uid, new Timestamp(us / 1000), us, cents)

  private val M = 60000000L // one minute in micros

  test("foldEvents splits on gap, cap, and carries the open tail") {
    // user 1: 3 events 1min apart, then a 30min gap, then 1 event
    val events = Seq(
      ev(1, 1, 0, 100), ev(2, 1, M, 100), ev(3, 1, 2 * M, 50),
      ev(4, 1, 32 * M, 25))
    val (closed, open) =
      StatefulSessions.foldEvents(events.iterator, None, 10 * M, 20)
    assert(closed === Seq(CappedSession(1, 0, 2 * M, 3, 2.50, "gap")))
    assert(open === Some(OpenSession(32 * M, 32 * M, 1, 25)))

    // cap split: 5 events within gap, cap 2 -> two full chunks closed
    // "cap", one open remainder
    val burst = (0 until 5).map(i => ev(i, 2, i * M, 10))
    val (c2, o2) =
      StatefulSessions.foldEvents(burst.iterator, None, 10 * M, 2)
    assert(c2.map(_.closed_by) === Seq("cap", "cap"))
    assert(c2.map(_.n_events) === Seq(2, 2))
    assert(o2.map(_.n) === Some(1))
  }

  test("foldEvents checks gap before cap (boundary labeled gap)") {
    // session at cap (2 events), next event beyond gap: label = gap
    val events = Seq(ev(1, 1, 0, 10), ev(2, 1, M, 10), ev(3, 1, 20 * M, 10))
    val (closed, _) =
      StatefulSessions.foldEvents(events.iterator, None, 10 * M, 2)
    assert(closed.map(_.closed_by) === Seq("gap"))
  }

  test("foldEvents incremental (carried state) == one-shot") {
    val all = (0 until 50).map { i =>
      // irregular spacing: every 7th event jumps past the gap
      val t = i * 2 * M + (i / 7) * 30 * M
      ev(i, 9, t, i * 3)
    }
    val (oneShot, oneOpen) =
      StatefulSessions.foldEvents(all.iterator, None, 10 * M, 5)
    val (h1, o1) =
      StatefulSessions.foldEvents(all.take(23).iterator, None, 10 * M, 5)
    val (h2, o2) =
      StatefulSessions.foldEvents(all.drop(23).iterator, o1, 10 * M, 5)
    assert(h1 ++ h2 === oneShot)
    assert(o2 === oneOpen)
  }

  test("cappedSessions: streaming == batch on the events table") {
    val batchEvents = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value").cache()
    val rows = batchEvents.as[RawEv].collect().toSeq
    val maxTs = rows.map(_.ts.getTime).max

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawEv]
    val q = StatefulSessions.cappedSessions(input.toDF(),
        gapMinutes = 1440, maxEvents = 8)
      .writeStream.format("memory").queryName("capped_sink")
      .outputMode("append").start()
    // real data in one batch; then two far-future sentinel events (one
    // per trigger) so the watermark first advances past every session's
    // gap horizon (24h after its last event), then a further batch runs
    // with that watermark and fires the event-time timeouts that flush
    // open tails as "gap".
    input.addData(rows)
    q.processAllAvailable()
    input.addData(RawEv(-1, new Timestamp(maxTs + 3 * 86400000L), -1, "x", 0.0))
    q.processAllAvailable()
    input.addData(RawEv(-2, new Timestamp(maxTs + 4 * 86400000L), -1, "x", 0.0))
    q.processAllAvailable()
    q.stop()

    val stream = spark.table("capped_sink").filter(col("user_id") >= 0)
      .orderBy("user_id", "session_start").collect().toSeq
    val batch = StatefulSessions.cappedSessions(batchEvents,
        gapMinutes = 1440, maxEvents = 8)
      .orderBy("user_id", "session_start").collect().toSeq
    assert(stream === batch)
    // and both split conditions actually bind somewhere in the fixture
    assert(batch.exists(_.getString(5) == "cap"))
    assert(batch.exists(_.getString(5) == "gap"))
    assert(batch.forall(_.getLong(3) <= 8))
  }

  test("multi-trigger timeouts keep batch equivalence (incl. labels)") {
    // user 1's state times out mid-stream (trigger 2 advances the
    // watermark past its gap horizon with other-user traffic), then
    // user 1 returns with a beyond-gap event — the timed-out session's
    // label must match what batch derives from the full event list
    val D = 86400000L // one day in millis
    val t0 = 1700000000000L
    def ev(id: Long, uid: Long, ms: Long) =
      RawEv(id, new Timestamp(ms), uid, "x", 1.0)
    val trigger1 = Seq(ev(1, 1, t0), ev(2, 1, t0 + 60000))
    val trigger2 = Seq(ev(3, 2, t0 + 3 * D))   // watermark -> past user 1's horizon
    val trigger3 = Seq(ev(4, 2, t0 + 4 * D))   // fires user 1's timeout
    val trigger4 = Seq(ev(5, 1, t0 + 5 * D))   // user 1 returns, beyond gap
    val flush = Seq(ev(6, 3, t0 + 9 * D), ev(7, 3, t0 + 10 * D))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawEv]
    val q = StatefulSessions.cappedSessions(input.toDF(),
        gapMinutes = 1440, maxEvents = 8)
      .writeStream.format("memory").queryName("capped_multi")
      .outputMode("append").start()
    Seq(trigger1, trigger2, trigger3, trigger4, flush).foreach { batch =>
      input.addData(batch); q.processAllAvailable()
    }
    q.stop()

    val all = (trigger1 ++ trigger2 ++ trigger3 ++ trigger4 ++ flush).toDF()
    val batchOut = StatefulSessions.cappedSessions(all,
        gapMinutes = 1440, maxEvents = 8)
      .filter(col("user_id").isin(1L, 2L))
      .orderBy("user_id", "session_start").collect().toSeq
    val streamOut = spark.table("capped_multi")
      .filter(col("user_id").isin(1L, 2L))
      .orderBy("user_id", "session_start").collect().toSeq
    assert(streamOut === batchOut)
    // the mid-stream-timed-out session exists and is labeled gap
    assert(streamOut.count(r => r.getLong(0) == 1L) === 2)
    assert(streamOut.filter(r => r.getLong(0) == 1L)
      .forall(_.getString(5) == "gap"))
  }
}
