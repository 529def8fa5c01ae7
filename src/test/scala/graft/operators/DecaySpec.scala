package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class DecaySpec extends SparkSpec {

  import spark.implicits._

  private def ts(day: Int) = Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  test("hand-computed half-life weights; future events are excluded") {
    // cutoff day 15, half-life 7: day 15 → w 1; day 8 → w 0.5;
    // day 1 → w 0.25; day 20 → EXCLUDED (future)
    val ev = Seq(("u", ts(15), 8.0), ("u", ts(8), 8.0),
      ("u", ts(1), 8.0), ("u", ts(20), 999.0))
      .toDF("user_id", "ts", "value")
    val r = Decay.decayedFeatures(ev, "user_id", "ts", "value",
      "2024-01-15 00:00:00", halfLifeDays = 7.0).head
    assert(r.getLong(1) === 3L)
    assert(math.abs(r.getDouble(2) - 1.75) < 1e-6, r.toString)
    assert(math.abs(r.getDouble(3) - 14.0) < 1e-6, "8·(1+.5+.25)")
  }

  test("a regular beats a lapsed whale on decayed count") {
    // whale: 50 events a year before the cutoff; regular: 3 this week
    val whale = (1 to 50).map(_ =>
      ("whale", Timestamp.valueOf("2023-01-10 00:00:00"), 1.0))
    val reg = (13 to 15).map(d => ("reg", ts(d), 1.0))
    val r = Decay.decayedFeatures((whale ++ reg)
        .toDF("user_id", "ts", "value"),
      "user_id", "ts", "value", "2024-01-15 00:00:00", 7.0)
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r("reg") > 1.0 && r("whale") < 0.01,
      s"reg ${r("reg")} vs whale ${r("whale")}")
  }

  test("units with only future events are absent") {
    val ev = Seq(("late", ts(20), 1.0), ("ok", ts(10), 1.0))
      .toDF("user_id", "ts", "value")
    val r = Decay.decayedFeatures(ev, "user_id", "ts", "value",
      "2024-01-15 00:00:00", 7.0).collect()
    assert(r.map(_.getString(0)).toSet === Set("ok"))
  }
}
