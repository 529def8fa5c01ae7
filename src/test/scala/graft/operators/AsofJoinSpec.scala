package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsofJoinSpec extends SparkSpec {

  import spark.implicits._

  private def ts(m: Long) = new Timestamp(m * 60000L)

  private lazy val quotes = Seq(
    (1L, ts(0), 10.0), (1L, ts(10), 11.0), (1L, ts(20), 12.0),
    (2L, ts(5), 100.0)).toDF("key", "qts", "price")
  private lazy val trades = Seq(
    (1L, ts(0), "at-tick"),   // equal ts: inclusive match -> 10.0
    (1L, ts(15), "between"),  // latest prior is ts(10) -> 11.0
    (1L, ts(99), "stale"),    // far after last quote -> 12.0
    (2L, ts(4), "early"),     // before any quote -> null
    (3L, ts(7), "no-key")     // key has no quotes -> null
  ).toDF("key", "tts", "label")

  test("backward inclusive semantics, left-outer nulls") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("key"), "tts", "qts")
      .orderBy("key", "tts")
      .select("label", "price").as[(String, Option[Double])].collect()
    assert(out === Seq(("at-tick", Some(10.0)), ("between", Some(11.0)),
      ("stale", Some(12.0)), ("early", None), ("no-key", None)))
  }

  test("tolerance nulls out stale matches") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("key"), "tts", "qts",
        toleranceUs = Some(10L * 60000000L)) // 10 minutes
      .orderBy("key", "tts")
      .select("label", "price").as[(String, Option[Double])].collect()
    val byLabel = out.toSeq.toMap
    assert(byLabel("stale") === None)    // 79 min stale
    assert(byLabel("between") === Some(11.0))
  }

  test("forward direction: nearest following quote, inclusive, with tolerance") {
    val out = AsofJoin.asofJoin(trades, quotes, Seq("key"), "tts", "qts",
        direction = "forward")
      .orderBy("key", "tts")
      .select("label", "price").as[(String, Option[Double])].collect()
    assert(out === Seq(
      ("at-tick", Some(10.0)),  // equal ts: inclusive
      ("between", Some(12.0)),  // next quote is ts(20)
      ("stale", None),          // nothing after ts(99)
      ("early", Some(100.0)),   // next quote ts(5)
      ("no-key", None)))
    val tol = AsofJoin.asofJoin(trades, quotes, Seq("key"), "tts", "qts",
        toleranceUs = Some(1L * 60000000L), direction = "forward")
      .select("label", "price").as[(String, Option[Double])].collect().toMap
    assert(tol("between") === None, "5-min-ahead quote outside 1-min tolerance")
    assert(tol("at-tick") === Some(10.0))
  }

  test("forward matches a brute-force min-following join") {
    val ev = Tables.events(spark, sf0001).select("event_id", "user_id", "ts")
    val snaps = ev.groupBy(col("user_id"),
        (date_trunc("day", col("ts")) + expr("INTERVAL 1 DAY")).as("snap_ts"))
      .agg(count(lit(1)).as("day_events"))
    val asof = AsofJoin.asofJoin(ev, snaps, Seq("user_id"), "ts", "snap_ts",
      direction = "forward")
    val brute = ev.as("e").join(snaps.as("s"),
        col("e.user_id") === col("s.user_id") && col("s.snap_ts") >= col("e.ts"),
        "left")
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("e.event_id"))
          .orderBy(col("s.snap_ts").asc_nulls_last)))
      .filter(col("rk") === 1)
      .select(col("e.event_id"), col("e.user_id"), col("e.ts"),
        col("s.snap_ts"), col("s.day_events"))
    assert(asof.exceptAll(brute).isEmpty && brute.exceptAll(asof).isEmpty)
  }

  test("matches a brute-force join on the events table") {
    val ev = Tables.events(spark, sf0001)
    val snaps = ev.groupBy(col("user_id"),
        (date_trunc("day", col("ts")) + expr("INTERVAL 1 DAY")).as("snap_ts"))
      .agg(count(lit(1)).as("day_events"))
    val left = ev.select("event_id", "user_id", "ts")

    val fast = AsofJoin.asofJoin(left, snaps, Seq("user_id"), "ts", "snap_ts")
      .select("event_id", "snap_ts", "day_events")

    // brute force: range join + row_number over candidates
    val w = Window.partitionBy("event_id").orderBy(col("snap_ts").desc)
    val brute = left.join(snaps, Seq("user_id"), "left")
      .filter(col("snap_ts").isNull || col("snap_ts") <= col("ts"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select("event_id", "snap_ts", "day_events")
    // brute force drops left rows whose only candidates were filtered
    // out (matched rows but all snap_ts > ts) — re-outer them
    val bruteOuter = left.select("event_id")
      .join(brute, Seq("event_id"), "left")

    assert(fast.orderBy("event_id").collect().toSeq ===
      bruteOuter.orderBy("event_id").collect().toSeq)
    // the join is non-vacuous both ways
    assert(fast.filter(col("snap_ts").isNotNull).count() > 0)
    assert(fast.filter(col("snap_ts").isNull).count() > 0)
  }

  test("plan: single shuffle for the asof core") {
    val leftIn = Seq((1L, ts(1), "a")).toDF("key", "tts", "payload")
    val rightIn = Seq((1L, ts(0), 1.0)).toDF("key", "qts", "v")
    val df = AsofJoin.asofJoin(leftIn, rightIn, Seq("key"), "tts", "qts")
    df.collect() // finalize the adaptive plan before counting exchanges
    // AQE's toString prints the final AND initial plans — count
    // shuffles in the final section only
    val physical = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(physical).length
    assert(shuffles === 1, s"expected the window's single shuffle:\n$physical")
    assert(physical.contains("Window"))
    assert(!physical.toLowerCase.contains("join"), "no join node expected")
  }

  test("colliding column names come back suffixed _right") {
    val leftIn = Seq((1L, ts(10), "a")).toDF("key", "ts", "label")
    val rightIn = Seq((1L, ts(0), "b")).toDF("key", "ts", "label")
    val out = AsofJoin.asofJoin(leftIn, rightIn, Seq("key"), "ts", "ts")
    assert(out.columns.toSeq ===
      Seq("key", "ts", "label", "ts_right", "label_right"))
    val row = out.collect()(0)
    assert(row.getAs[Timestamp]("ts_right") === ts(0))
    assert(row.getAs[String]("label_right") === "b")
    // a post-suffix overlap cannot be disambiguated: fail loudly
    val clash = leftIn.withColumn("ts_right", lit(1))
    val e = intercept[IllegalArgumentException] {
      AsofJoin.asofJoin(clash, rightIn, Seq("key"), "ts", "ts")
    }
    assert(e.getMessage.contains("ts_right"))
  }

  test("nearest: closer side wins, exact ties go backward") {
    // quotes at 0/10/20; trades at 4 (→0, d=4 vs 6), 15 (tie 5/5 →
    // backward 11.0), 16 (→20), 99 (only backward exists), and an
    // uncovered key
    val nTrades = Seq(
      (1L, ts(4), "closer-back"), (1L, ts(15), "tie"),
      (1L, ts(16), "closer-fwd"), (1L, ts(99), "only-back"),
      (3L, ts(7), "no-key")).toDF("key", "tts", "label")
    val out = AsofJoin.asofJoin(nTrades, quotes, Seq("key"), "tts", "qts",
        direction = "nearest")
      .orderBy("key", "tts")
      .select("label", "price").as[(String, Option[Double])].collect()
    assert(out === Seq(("closer-back", Some(10.0)), ("tie", Some(11.0)),
      ("closer-fwd", Some(12.0)), ("only-back", Some(12.0)),
      ("no-key", None)))
  }

  test("nearest with tolerance: both sides out of range -> null") {
    val nTrades = Seq((1L, ts(15), "mid"), (1L, ts(99), "far"))
      .toDF("key", "tts", "label")
    val out = AsofJoin.asofJoin(nTrades, quotes, Seq("key"), "tts", "qts",
        direction = "nearest", toleranceUs = Some(6L * 60000000L))
      .orderBy("tts").select("label", "price")
      .as[(String, Option[Double])].collect()
    assert(out === Seq(("mid", Some(11.0)), ("far", None)))
  }

  test("nearest plan: still one shuffle (two sorts over one exchange)") {
    val leftIn = Seq((1L, ts(1), "a")).toDF("key", "tts", "payload")
    val rightIn = Seq((1L, ts(0), 1.0)).toDF("key", "qts", "v")
    val df = AsofJoin.asofJoin(leftIn, rightIn, Seq("key"), "tts", "qts",
      direction = "nearest")
    df.collect()
    val physical = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(physical).length
    assert(shuffles === 1, s"one exchange for both traversals:\n$physical")
    assert(!physical.toLowerCase.contains("join"), "no join node expected")
  }
}
