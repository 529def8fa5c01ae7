package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Streaming funnel: pure fold unit tests, batch-twin count
  * equivalence with the oracle-backed Funnel.funnel report, and
  * stream ≡ batch across triggers (incl. a completed-funnel tombstone
  * suppressing re-emission). */
class StatefulFunnelSpec extends SparkSpec {

  import spark.implicits._

  private val steps = Seq("signup", "click", "purchase")

  private def fe(id: Long, uid: Long, us: Long, step: Int) =
    FunnelEvent(id, uid, new Timestamp(us / 1000), us, step)

  test("foldEvents: ordered advance, strict ts, first-touch") {
    val M = 60000000L
    // click before signup ignored; signup@2M, purchase@3M ignored (not
    // frontier), click@8M advances, purchase@9M completes
    val evs = Seq(fe(1, 1, 1 * M, 1), fe(2, 1, 2 * M, 0), fe(3, 1, 3 * M, 2),
      fe(4, 1, 8 * M, 1), fe(5, 1, 9 * M, 2))
    val (out, times) = StatefulFunnel.foldEvents(1, evs.iterator, Nil, 3)
    assert(out.map(c => (c.step_idx, c.ts_us)) ===
      Seq((1L, 2 * M), (2L, 8 * M), (3L, 9 * M)))
    assert(times === Seq(2 * M, 8 * M, 9 * M))
    // same-ts does not advance (strict >)
    val tie = Seq(fe(1, 2, M, 0), fe(2, 2, M, 1))
    assert(StatefulFunnel.foldEvents(2, tie.iterator, Nil, 3)._2 === Seq(M))
    // carried state resumes mid-funnel
    val (out2, t2) = StatefulFunnel.foldEvents(1,
      Seq(fe(6, 1, 20 * M, 1)).iterator, Seq(10 * M), 3)
    assert(out2.map(_.step_idx) === Seq(2L) && t2 === Seq(10 * M, 20 * M))
    // completed funnel (carried full) emits nothing more
    assert(StatefulFunnel.foldEvents(1,
      Seq(fe(7, 1, 30 * M, 0)).iterator, Seq(M, 2 * M, 3 * M), 3)._1.isEmpty)
  }

  test("batch completions aggregate to the oracle-backed funnel report") {
    val events = Tables.events(spark, sf0001)
    val completions = StatefulFunnel.stepCompletions(events, steps)
    val counts = completions.groupBy("step_idx")
      .agg(count(lit(1)).as("n_users"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val report = graft.operators.Funnel.funnel(events, steps)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    // funnel() reports zero rows for empty steps; completions simply
    // have no rows — compare on the nonzero support
    assert(report.filter(_._2 > 0) === counts)
  }

  test("streaming == batch across triggers; tombstone stops re-emission") {
    val D = 86400000L
    val t0 = 1700000000000L
    def ev(id: Long, uid: Long, ms: Long, typ: String) =
      RawEv(id, new Timestamp(ms), uid, typ, 1.0)
    // user 1 completes the funnel in trigger 1, then REPEATS the whole
    // sequence in trigger 2 (within expiry) — no new completions may
    // appear; user 2 progresses across triggers
    val trigger1 = Seq(ev(1, 1, t0, "signup"), ev(2, 1, t0 + 1000, "click"),
      ev(3, 1, t0 + 2000, "purchase"), ev(4, 2, t0 + 3000, "signup"))
    val trigger2 = Seq(ev(5, 1, t0 + 10000, "signup"),
      ev(6, 1, t0 + 11000, "click"), ev(7, 1, t0 + 12000, "purchase"),
      ev(8, 2, t0 + 13000, "click"))
    val trigger3 = Seq(ev(9, 2, t0 + D, "purchase"))

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawEv]
    val q = StatefulFunnel.stepCompletions(input.toDF(), steps,
        expiryMinutes = 60 * 24 * 30)
      .writeStream.format("memory").queryName("funnel_sink")
      .outputMode("append").start()
    Seq(trigger1, trigger2, trigger3).foreach { b =>
      input.addData(b); q.processAllAvailable()
    }
    q.stop()

    val streamed = spark.table("funnel_sink")
      .orderBy("user_id", "step_idx").collect().toSeq
    val batch = StatefulFunnel.stepCompletions(
        (trigger1 ++ trigger2 ++ trigger3).toDF(), steps)
      .orderBy("user_id", "step_idx").collect().toSeq
    assert(streamed === batch)
    // user 1 completed exactly once despite the repeat
    assert(streamed.count(_.getLong(0) == 1L) === 3)
    // user 2 finished across three triggers
    assert(streamed.count(_.getLong(0) == 2L) === 3)
  }
}
