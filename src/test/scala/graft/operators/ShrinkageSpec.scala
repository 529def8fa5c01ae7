package graft.operators

import graft.SparkSpec

class ShrinkageSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed MoM prior and posterior means") {
    // group rates .5, .9, .1, .5 → μ = .5, v = .32/3 ≈ .106667
    // α + β = .25/v − 1 = 1.34375, α = β = .671875
    val df = Seq(("a", 1L, 2L), ("b", 9L, 10L), ("c", 1L, 10L),
      ("d", 5L, 10L)).toDF("g", "k", "n")
    val r = Shrinkage.ebRates(df, Seq("g"), "k", "n")
      .collect().map(x => x.getString(0) ->
        (x.getDouble(3), x.getDouble(4), x.getDouble(5), x.getDouble(6)))
      .toMap
    assert(math.abs(r("a")._3 - 0.671875) < 1e-4, r("a").toString)
    assert(math.abs(r("a")._4 - 0.671875) < 1e-4)
    // at the ensemble mean, shrinkage is a fixed point
    assert(math.abs(r("a")._2 - 0.5) < 1e-4, r("a").toString)
    // extremes move toward the middle, big-n less than small-n
    assert(r("b")._2 < r("b")._1 && r("b")._2 > 0.8, r("b").toString)
    assert(r("c")._2 > r("c")._1 && r("c")._2 < 0.2, r("c").toString)
  }

  test("the 2/2 seller no longer outranks the 980/1000 one") {
    val df = (Seq(("tiny", 2L, 2L), ("big", 980L, 1000L)) ++
      (1 to 30).map(i => (s"mid$i", (i % 7).toLong + 1L, 10L)))
      .toDF("g", "k", "n")
    val r = Shrinkage.ebRates(df, Seq("g"), "k", "n")
      .collect().map(x => x.getString(0) -> x.getDouble(4)).toMap
    assert(r("big") > r("tiny"),
      s"big ${r("big")} must beat tiny ${r("tiny")}")
  }

  test("degenerate ensembles fall back to the uniform prior") {
    // identical rates → v = 0 → α = β = 1 (Laplace)
    val df = Seq(("a", 1L, 2L), ("b", 2L, 4L), ("c", 3L, 6L))
      .toDF("g", "k", "n")
    val r = Shrinkage.ebRates(df, Seq("g"), "k", "n").collect()
    assert(r.forall(x => x.getDouble(5) === 1.0 && x.getDouble(6) === 1.0))
    // Laplace-smoothed: (1+1)/(2+2) = .5 stays put here
    assert(r.forall(x => math.abs(x.getDouble(4) - 0.5) < 1e-9))
  }
}
