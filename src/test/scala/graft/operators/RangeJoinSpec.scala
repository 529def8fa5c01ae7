package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  private lazy val points = Seq(
    (1L, 1L, 5L), (2L, 1L, 10L), (3L, 1L, 25L), (4L, 2L, 5L),
    (5L, 1L, 1000L)).toDF("pid", "key", "p")
  private lazy val intervals = Seq(
    (1L, 0L, 10L, "a"),     // catches p=5 and p=10 (inclusive end)
    (1L, 8L, 12L, "b"),     // overlaps "a": p=10 matches both
    (1L, 900L, 20000L, "c"),// long interval -> fallback path (span > 4 buckets of 10)
    (2L, 0L, 3L, "d"),      // key 2: no point inside
    (3L, 0L, 100L, "e")     // key with no points
  ).toDF("key", "s", "e", "tag")

  private def run(maxSpan: Int = 4) = RangeJoin.pointInInterval(
    points, intervals, "p", "s", "e", Seq("key"),
    bucketWidth = 10L, maxSpanBuckets = maxSpan)

  test("containment with inclusive bounds, overlaps, and no dedup dupes") {
    val got = run().select("pid", "tag").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "a"), (2L, "a"), (2L, "b"), (5L, "c")))
    // exactly once per (point, interval) pair even when an interval
    // spans several buckets
    assert(run().count() === 4)
  }

  test("long-interval fallback equals the exploded path") {
    // force EVERY interval through the fallback, then through the
    // bucketed path; results must agree
    val viaFallback = run(maxSpan = 0).select("pid", "tag")
      .as[(Long, String)].collect().toSet
    val viaBuckets = run(maxSpan = 100000).select("pid", "tag")
      .as[(Long, String)].collect().toSet
    assert(viaFallback === viaBuckets)
  }

  test("keyless range join") {
    val p = Seq((1L, 5L), (2L, 50L)).toDF("pid", "p")
    val iv = Seq((0L, 10L, "x"), (40L, 60L, "y"), (100L, 200L, "z"))
      .toDF("s", "e", "tag")
    val got = RangeJoin.pointInInterval(p, iv, "p", "s", "e", Nil, 10L)
      .select("pid", "tag").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "x"), (2L, "y")))
  }

  test("negative axis values bucket consistently") {
    // pmod floors toward negative infinity on both sides, so points
    // and intervals agree on bucket boundaries below zero
    val p = Seq((1L, -5L), (2L, -15L), (3L, -10L)).toDF("pid", "p")
    val iv = Seq((-12L, -4L, "x"), (-100L, -14L, "y")).toDF("s", "e", "tag")
    val got = RangeJoin.pointInInterval(p, iv, "p", "s", "e", Nil, 10L)
      .select("pid", "tag").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "x"), (3L, "x"), (2L, "y")))
  }

  test("matches a plain BETWEEN join on the events table") {
    val ev = Tables.events(spark, sf0001)
    val pts = ev.select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("p"))
    val iv = ev.groupBy(col("user_id"),
        date_trunc("day", col("ts")).as("day"))
      .agg(min(unix_micros(col("ts"))).as("s"),
           max(unix_micros(col("ts"))).as("e"))
      .drop("day")
    val fast = RangeJoin.pointInInterval(pts, iv, "p", "s", "e",
        Seq("user_id"), bucketWidth = 3600000000L)
      .select("event_id", "s", "e")
    val brute = pts.join(iv, Seq("user_id"))
      .filter(col("p").between(col("s"), col("e")))
      .select("event_id", "s", "e")
    assert(fast.orderBy("event_id", "s").collect().toSeq ===
      brute.orderBy("event_id", "s").collect().toSeq)
    assert(fast.count() > 0)
  }
}
