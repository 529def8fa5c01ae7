package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class Scd2Spec extends SparkSpec {

  import spark.implicits._

  private def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")

  test("intervals: contiguous per key, open-ended current version") {
    val changes = Seq(
      (1L, ts(1), "bronze"), (1L, ts(5), "silver"), (1L, ts(9), "gold"),
      (2L, ts(3), "bronze"))
      .toDF("user_id", "change_ts", "tier")
    val iv = Scd2.buildIntervals(changes, "user_id", "change_ts", "tier")
      .orderBy("user_id", "valid_from").collect()
    val u1 = iv.filter(_.getLong(0) == 1L)
    assert(u1.map(r => (r.getString(2), r.getTimestamp(3),
      Option(r.getTimestamp(4)))).toSeq === Seq(
      ("bronze", ts(1), Some(ts(5))),
      ("silver", ts(5), Some(ts(9))),
      ("gold", ts(9), None)))
    // contiguity: each valid_to == next valid_from
    u1.sliding(2).foreach { w =>
      assert(w(0).getTimestamp(4) === w(1).getTimestamp(3))
    }
    assert(iv.filter(_.getLong(0) == 2L).head.isNullAt(4))
  }

  test("pointInTime ≡ BETWEEN interval join; pre-history facts get nulls") {
    val changes = Seq(
      (1L, ts(2), "bronze"), (1L, ts(6), "silver"), (2L, ts(4), "gold"))
      .toDF("user_id", "change_ts", "tier")
    val iv = Scd2.buildIntervals(changes, "user_id", "change_ts", "tier")
    val facts = Seq(
      (10L, 1L, ts(1)),  // before any version → null tier
      (11L, 1L, ts(2)),  // exactly at a change → that version
      (12L, 1L, ts(5)), (13L, 1L, ts(8)), (14L, 2L, ts(9)))
      .toDF("fact_id", "user_id", "fact_ts")
    val got = Scd2.pointInTime(facts, iv, Seq("user_id"), "fact_ts")
    val tierCol = got.columns.find(_.contains("tier")).get
    val byFact = got.collect()
      .map(r => r.getLong(0) -> Option(r.getAs[String](tierCol))).toMap
    // naive BETWEEN twin (valid_to null = open)
    val naive = facts.join(iv,
        facts("user_id") === iv("user_id") &&
          facts("fact_ts") >= iv("valid_from") &&
          (iv("valid_to").isNull || facts("fact_ts") < iv("valid_to")),
        "left")
      .select(facts("fact_id"), iv("tier"))
      .collect().map(r => r.getLong(0) -> Option(r.getAs[String](1))).toMap
    assert(byFact === naive)
    assert(byFact(10L).isEmpty && byFact(11L).contains("bronze"))
    assert(byFact(12L).contains("bronze") && byFact(13L).contains("silver"))
    assert(byFact(14L).contains("gold"))
  }
}
