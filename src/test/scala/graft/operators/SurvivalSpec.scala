package graft.operators

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {

  import spark.implicits._

  test("textbook KM: censoring shrinks the risk set without an event row") {
    // durations (bucket=1): E@1, C@2, E@3, E@3, C@5
    // t=1: n=5, d=1 → S=0.8; t=3: at-risk {3,3,5}=3, d=2 → S=0.8·(1/3)
    val ps = Seq((1L, 1), (2L, 0), (3L, 1), (3L, 1), (5L, 0))
      .toDF("duration", "event")
    val out = Survival.kaplanMeier(ps, "duration", "event", bucketUs = 1L)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(3), r.getDouble(4))).toMap
    assert(out.keySet === Set(1L, 3L))
    assert(out(1L) === ((1L, 5L, 0.8)))
    assert(out(3L)._1 === 2L && out(3L)._2 === 3L)
    assert(math.abs(out(3L)._3 - 0.8 / 3.0) < 1e-6)
  }

  test("everyone-converts terminal bucket lands S exactly at 0") {
    val ps = Seq((1L, 1), (2L, 1)).toDF("duration", "event")
    val out = Survival.kaplanMeier(ps, "duration", "event", bucketUs = 1L)
      .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
    assert(out(1L) === 0.5 && out(2L) === 0.0)
  }

  test("survival is monotone non-increasing on real conversions") {
    val perUser = graft.Tables.events(spark, sf0001)
      .groupBy("user_id").agg(
        org.apache.spark.sql.functions.expr("min(unix_micros(ts))").as("t0"),
        org.apache.spark.sql.functions.expr(
          "min(CASE WHEN event_type = 'purchase' THEN unix_micros(ts) END)").as("tp"),
        org.apache.spark.sql.functions.expr("max(unix_micros(ts))").as("tl"))
      .selectExpr(
        "CASE WHEN tp IS NOT NULL THEN tp - t0 ELSE tl - t0 END AS duration",
        "CASE WHEN tp IS NOT NULL THEN 1 ELSE 0 END AS event")
    val s = Survival.kaplanMeier(perUser, "duration", "event",
        bucketUs = 3600000000L)
      .orderBy("t_bucket").collect().map(_.getDouble(4))
    assert(s.nonEmpty && s.head <= 1.0)
    assert(s.sliding(2).forall(w => w.length < 2 || w(1) <= w(0) + 1e-12))
  }
}
