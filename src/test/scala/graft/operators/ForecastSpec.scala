package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class ForecastSpec extends SparkSpec {

  import spark.implicits._

  test("hand-traced recursion on a 3-point series") {
    // y = (10, 14, 15), α = .5, β = .5:
    //   init: l=10, b=4
    //   t2: l = .5·14 + .5·14 = 14;      b = .5·4 + .5·4 = 4
    //   t3: l = .5·15 + .5·18 = 16.5;    b = .5·2.5 + .5·4 = 3.25
    // forecasts: 19.75, 23.0
    val s = Seq(("a", 1, 10.0), ("a", 2, 14.0), ("a", 3, 15.0))
      .toDF("g", "t", "y")
    val r = Forecast.holt(s, Seq("g"), "t", "y", alpha = 0.5,
      beta = 0.5, horizon = 2)
      .collect().map(x => x.getLong(1) ->
        (x.getDouble(2), x.getDouble(3), x.getDouble(4))).toMap
    assert(r(1L) === ((16.5, 3.25, 19.75)), r.toString)
    assert(r(2L)._3 === 23.0)
  }

  test("a perfect linear series forecasts the exact continuation") {
    // y = 5t: Holt locks on after init (l₁=5, b₁=5 is already right)
    val s = (1 to 20).map(t => ("lin", t, 5.0 * t)).toDF("g", "t", "y")
    val r = Forecast.holt(s, Seq("g"), "t", "y", horizon = 3)
      .collect().map(x => x.getLong(1) -> x.getDouble(4)).toMap
    assert(math.abs(r(1L) - 105.0) < 1e-6, r.toString)
    assert(math.abs(r(3L) - 115.0) < 1e-6)
  }

  test("t ordering is by value, not string (10 after 2)") {
    // same linear series with t = 1..12: a string sort would fold 10,
    // 11, 12 before 2 and wreck the fitted trend
    val s = (1 to 12).map(t => ("x", t, 2.0 * t)).toDF("g", "t", "y")
    val r = Forecast.holt(s, Seq("g"), "t", "y", horizon = 1).head
    assert(math.abs(r.getDouble(4) - 26.0) < 1e-6, r.toString)
  }

  test("single-point groups are dropped; groups keep typed columns") {
    val s = Seq(("one", 1, 3.0), ("two", 1, 1.0), ("two", 2, 2.0))
      .toDF("g", "t", "y")
    val r = Forecast.holt(s, Seq("g"), "t", "y", horizon = 2).collect()
    assert(r.map(_.getString(0)).toSet === Set("two"))
    assert(r.length === 2)
  }

  test("timestamp group columns and null group keys survive the " +
    "typed re-attach") {
    // the old stringified-key join rendered java.sql.Timestamp as
    // '…:00.0' vs Spark's cast '…:00' (and nulls as "null" vs skipped)
    // and silently dropped those groups — the typed path must keep them
    val ts1 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    val ts2 = java.sql.Timestamp.valueOf("2024-01-02 00:00:00")
    val s = Seq(
      (Option(ts1), 1, 1.0), (Option(ts1), 2, 2.0),
      (Option(ts2), 1, 4.0), (Option(ts2), 2, 8.0),
      (Option.empty[java.sql.Timestamp], 1, 7.0),
      (Option.empty[java.sql.Timestamp], 2, 9.0))
      .toDF("day", "t", "y")
    val r = Forecast.holt(s, Seq("day"), "t", "y", horizon = 1)
    assert(r.schema("day").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val got = r.collect()
      .map(x => Option(x.getTimestamp(0)) -> x.getDouble(4)).toMap
    assert(got.keySet === Set(Some(ts1), Some(ts2), None),
      "every group, including the null key, must survive")
    // linear series forecast exactly continues for the ts1 group
    assert(math.abs(got(Some(ts1)) - 3.0) < 1e-6)
  }
}
