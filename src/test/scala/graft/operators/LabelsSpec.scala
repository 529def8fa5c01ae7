package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class LabelsSpec extends SparkSpec {

  import spark.implicits._

  private def ts(day: Int, hour: Int = 12) =
    Timestamp.valueOf(f"2024-01-$day%02d $hour%02d:00:00")

  // cutoff Jan 10, horizon 5 days (label window Jan 10–15]
  private val cutoff = "2024-01-10 00:00:00"

  private def fixture = Seq(
    // u1: active before, returns on day 12 → NOT churned
    ("u1", ts(3), 10.0), ("u1", ts(8), 20.0), ("u1", ts(12), 5.0),
    // u2: active before, silent in the horizon, returns day 20 →
    // CHURNED (the post-horizon return must not leak)
    ("u2", ts(5), 7.0), ("u2", ts(20), 99.0),
    // u3: born after the cutoff → excluded entirely
    ("u3", ts(11), 1.0),
    // u4: returns exactly at the horizon edge (day 15, 00:00) → seen
    ("u4", ts(9), 3.0), ("u4", ts(15, 0), 2.0))
    .toDF("user_id", "ts", "value")

  test("hand-labeled fixture: windows, exclusions, and edge inclusion") {
    val r = Labels.churnLabels(fixture, "user_id", "ts", "value",
      cutoff, horizonDays = 5)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(2), x.getLong(3), x.getLong(4),
          x.getInt(5))).toMap
    assert(r.keySet === Set("u1", "u2", "u4"), "u3 born late: excluded")
    assert(r("u1") === ((2L, 30.0, 2L, 1L, 0)), r("u1").toString)
    // u2: features exclude the day-20 event; recency = 4 days (day 5
    // 12:00 → day 10 00:00 is 4.5 days, floored)
    assert(r("u2") === ((1L, 7.0, 1L, 4L, 1)), r("u2").toString)
    assert(r("u4")._5 === 0, "horizon-edge event counts as retained")
  }

  test("no feature column ever reads past the cutoff") {
    val r = Labels.churnLabels(fixture, "user_id", "ts", "value",
      cutoff, horizonDays = 5)
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    // u2's value_sum is 7.0, not 106.0 — the day-20 purchase is label
    // territory and must not appear in a feature
    assert(r("u2") === 7.0)
  }

  test("events table: base rate is sane and features are populated") {
    val rows = Labels.churnLabels(graft.Tables.events(spark, sf0001),
      "user_id", "ts", "value", "2024-01-20 00:00:00", 7).collect()
    assert(rows.nonEmpty)
    val churnRate = rows.map(_.getInt(5)).sum.toDouble / rows.length
    assert(churnRate >= 0 && churnRate < 1)
    rows.foreach { x =>
      assert(x.getLong(1) >= 1 && x.getLong(4) >= 0)
    }
  }
}
