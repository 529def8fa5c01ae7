package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ConformalSpec extends SparkSpec {

  import spark.implicits._

  test("qhat is the ceil((n+1)(1-alpha))-th residual order statistic") {
    // train: y = 10 twice -> yhat = 10. cal: residuals exactly 1..10
    // (y = 10 ± r). idx = ceil(11·0.9) = 10 -> qhat = 10.0
    val train = Seq.fill(2)(("g", "train", 10.0))
    val cal = (1 to 10).map(r => ("g", "cal", 10.0 + r))
    val test = Seq(("g", "test", 15.0), ("g", "test", 25.0))
    val df = (train ++ cal ++ test).toDF("g", "role", "y")
    val r = Conformal.meanInterval(df, "role", "y", Seq("g")).head()
    assert(r.getLong(1) === 2L && r.getLong(2) === 10L && r.getLong(3) === 2L)
    assert(r.getDouble(4) === 10.0) // yhat
    assert(r.getDouble(5) === 10.0) // qhat
    assert(r.getDouble(6) === 0.5) // |15-10|=5 in, |25-10|=15 out
    // alpha10 = 5 (50%): idx = ceil(11·0.5) = 6 -> qhat = 6
    val r5 = Conformal.meanInterval(df, "role", "y", Seq("g"),
      alpha10 = 5).head()
    assert(r5.getDouble(5) === 6.0)
  }

  test("coverage hits the 1-alpha floor on an exchangeable fixture") {
    // deterministic hash-pseudo-random y, identical distribution in
    // every role -> split-conformal coverage >= 0.9 - small-sample slack
    val df = (1 to 3000).map { i =>
      val role = i % 3 match {
        case 0 => "train"; case 1 => "cal"; case _ => "test"
      }
      ("g", role, ((i * 2654435761L) % 10000).toDouble / 100.0)
    }.toDF("g", "role", "y")
    val r = Conformal.meanInterval(df, "role", "y", Seq("g")).head()
    val cov = r.getDouble(6)
    assert(cov >= 0.87 && cov <= 0.95, s"coverage $cov")
  }

  test("null metrics take no part in fit, calibration, or coverage") {
    val df = (Seq(("g", "train", Some(5.0)), ("g", "train", None)) ++
      Seq.fill(10)(("g", "cal", Some(8.0))) ++ Seq(("g", "cal", None)) ++
      Seq(("g", "test", Some(7.0)), ("g", "test", None)))
      .toDF("g", "role", "y")
    val r = Conformal.meanInterval(df, "role", "y", Seq("g")).head()
    assert(r.getLong(1) === 1L && r.getLong(2) === 10L && r.getLong(3) === 1L)
    assert(r.getDouble(4) === 5.0)
  }

  test("tied residuals on the grid axis resolve to the same qhat") {
    // every cal residual identical -> qhat is that value at any alpha
    val df = (Seq(("g", "train", 5.0)) ++
      Seq.fill(20)(("g", "cal", 8.0)) ++ Seq(("g", "test", 7.0)))
      .toDF("g", "role", "y")
    val r = Conformal.meanInterval(df, "role", "y", Seq("g")).head()
    assert(r.getDouble(5) === 3.0)
    assert(r.getDouble(6) === 1.0) // |7-5| = 2 <= 3
  }
}
