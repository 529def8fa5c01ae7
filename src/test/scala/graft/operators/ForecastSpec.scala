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
}
