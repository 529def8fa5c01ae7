package graft.operators

import graft.SparkSpec

class CountHealthSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed dispersion with analytic zeros") {
    // universe: units u1..u4 (u4 only ever does 'other').
    // key 'a': counts (3, 1, 0, 0) over the 4-unit universe →
    // mean 1, var = (9+1 − 16/4)/3 = 2, dispersion 2, zero_share .5
    val ev = Seq(("u1", "a"), ("u1", "a"), ("u1", "a"), ("u2", "a"),
      ("u3", "other"), ("u4", "other"))
      .toDF("user_id", "event_type")
    val r = SeriesStats.countHealth(ev, "user_id", "event_type")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4),
          x.getDouble(5), x.getDouble(6))).toMap
    assert(r("a") === ((4L, 2L, 0.5, 1.0, 2.0, 2.0)), r.toString)
  }

  test("a constant-rate key reads dispersion at the binomial floor") {
    // every unit does 'k' exactly twice: var = 0 → dispersion 0
    val ev = (1 to 10).flatMap(i => Seq((s"u$i", "k"), (s"u$i", "k")))
      .toDF("user_id", "event_type")
    val r = SeriesStats.countHealth(ev, "user_id", "event_type").head
    assert(r.getDouble(5) === 0.0 && r.getDouble(6) === 0.0)
    assert(r.getDouble(3) === 0.0, "no zeros")
  }

  test("events table: all five types read sane, zero-aware stats") {
    val rows = SeriesStats.countHealth(
      graft.Tables.events(spark, sf0001), "user_id", "event_type")
      .collect()
    assert(rows.length === 5)
    rows.foreach { x =>
      assert(x.getLong(2) <= x.getLong(1))
      assert(x.getDouble(3) >= 0 && x.getDouble(3) < 1)
      assert(x.getDouble(6) >= 0)
    }
  }
}
