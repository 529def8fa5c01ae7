package graft.operators

import graft.SparkSpec

class EntropyLDiversitySpec extends SparkSpec {

  import spark.implicits._

  test("uniform class reads effective_l = #values; skew reads lower") {
    val df = Seq(
      // class u: 4 values uniform → H = ln 4, eff_l = 4
      ("u", "a"), ("u", "b"), ("u", "c"), ("u", "d"),
      // class s: 99:1-style skew (9:1 here) → 2 distinct, eff_l ≪ 2
      ("s", "a"), ("s", "a"), ("s", "a"), ("s", "a"), ("s", "a"),
      ("s", "a"), ("s", "a"), ("s", "a"), ("s", "a"), ("s", "b"),
      // class p: point mass → H = 0, eff_l = 1
      ("p", "a"), ("p", "a"))
      .toDF("q", "v")
    val r = Anonymity.entropyLDiversity(df, Seq("q"), "v", l = 3.0)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4),
          x.getInt(5))).toMap
    assert(r("u")._1 === 4L && r("u")._2 === 4L)
    assert(math.abs(r("u")._4 - 4.0) < 1e-4, r("u").toString)
    assert(r("u")._5 === 0, "uniform-4 passes l = 3")
    // skewed: H = −0.9·ln0.9 − 0.1·ln0.1 ≈ 0.325083, eff ≈ 1.38
    assert(r("s")._2 === 2L)
    assert(math.abs(r("s")._3 - 0.325083) < 1e-5, r("s").toString)
    assert(r("s")._5 === 1, "9:1 skew fails l = 3 despite 2 distinct")
    assert(r("p")._3 === 0.0 && r("p")._4 === 1.0 && r("p")._5 === 1)
  }

  test("entropy l is never above distinct l (Jensen)") {
    val rows = Anonymity.entropyLDiversity(
      graft.Tables.orders(spark, sf0001)
        .select($"o_orderstatus", $"o_orderpriority"),
      Seq("o_orderstatus"), "o_orderpriority", l = 3.0).collect()
    assert(rows.nonEmpty)
    rows.foreach { x =>
      assert(x.getDouble(3) >= 0)
      assert(x.getDouble(4) <= x.getLong(2).toDouble + 1e-6,
        s"effective_l must not exceed distinct_l: $x")
    }
  }

  test("null quasi/sensitive rows are excluded, not a class") {
    val df = Seq(("a", Some("x")), ("a", None),
      (null.asInstanceOf[String], Some("y"))).toDF("q", "v")
    val r = Anonymity.entropyLDiversity(df, Seq("q"), "v", 2.0).collect()
    assert(r.length === 1 && r.head.getString(0) === "a")
    assert(r.head.getLong(1) === 1L)
  }
}
