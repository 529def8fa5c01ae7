package graft.operators

import graft.SparkSpec

class MarketBasketSpec extends SparkSpec {

  import spark.implicits._

  // 4 baskets: {x,y} {x,y} {x,z} {z,w} — x in 3, y in 2, z in 2, w in 1
  private def baskets = Seq(
    (1L, "x"), (1L, "y"), (2L, "x"), (2L, "y"),
    (3L, "x"), (3L, "z"), (4L, "z"), (4L, "w"))
    .toDF("b", "i")

  test("hand-computed support, confidence, and lift — both directions") {
    val r = MarketBasket.rules(baskets, "b", "i", minPairs = 1, k = 50)
      .collect().map(x => (x.getString(0), x.getString(1)) ->
        (x.getLong(2), x.getDouble(3), x.getDouble(4), x.getDouble(5)))
      .toMap
    // x,y together in 2 of 4: support .5; conf x→y = 2/3, y→x = 1;
    // lift = 2·4/(3·2) = 4/3 both ways
    assert(r(("x", "y")) === ((2L, 0.5, 0.666667, 1.333333)), r.toString)
    assert(r(("y", "x")) === ((2L, 0.5, 1.0, 1.333333)))
    // z,w: 1 of 4; lift = 1·4/(2·1) = 2 — rarer but more surprising
    assert(r(("z", "w")) === ((1L, 0.25, 0.5, 2.0)))
    assert(r(("w", "z"))._3 === 1.0)
  }

  test("lift beats confidence at ranking: the bestseller is dethroned") {
    val r = MarketBasket.rules(baskets, "b", "i", minPairs = 1, k = 50)
      .collect()
    // top rank by lift is the z-w pair (2.0), NOT the popular x-y
    assert(r.head.getDouble(5) === 2.0)
    assert(Set(r.head.getString(0), r.head.getString(1)) === Set("z", "w"))
    // but y→x has the highest confidence (1.0) — the base-rate trap
    val confTop = r.maxBy(_.getDouble(4))
    assert(confTop.getString(0) === "y" || confTop.getString(0) === "w")
  }

  test("minPairs prunes the tail; duplicates inside a basket collapse") {
    val dup = baskets.union(Seq((1L, "x")).toDF("b", "i"))
    val r = MarketBasket.rules(dup, "b", "i", minPairs = 2, k = 50)
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    assert(r === Set(("x", "y"), ("y", "x")), r.toString)
  }

  test("backtest: hits only count in the future, never the train set") {
    import java.sql.Timestamp
    def ts(y: Int) = Timestamp.valueOf(f"$y-06-01 00:00:00")
    // train (1999): {x,y}×2 — rule x→y and y→x.
    // test (2001): basket 10 has {x,y} → x's rec y HITS (and y→x);
    // basket 11 has {x,z} → x's rec y MISSES; z has no rule.
    val df = Seq(
      (1L, "x", ts(1999)), (1L, "y", ts(1999)),
      (2L, "x", ts(1999)), (2L, "y", ts(1999)),
      (10L, "x", ts(2001)), (10L, "y", ts(2001)),
      (11L, "x", ts(2001)), (11L, "z", ts(2001)))
      .toDF("b", "i", "ts")
    val r = MarketBasket.backtest(df, "b", "i", "ts",
      "2000-01-01 00:00:00", minPairs = 1).head
    assert(r.getLong(0) === 2L, "two directed rules")
    assert(r.getLong(1) === 2L, "two test baskets")
    // recs issued: basket10 x→y (hit), y→x (hit); basket11 x→y (miss);
    // z has no rule → 3 recs, 2 hits
    assert(r.getLong(2) === 3L && r.getLong(3) === 2L, r.toString)
    assert(math.abs(r.getDouble(4) - 2.0 / 3.0) < 1e-6)
  }

  test("backtest: no future leakage — an empty test period scores 0/0") {
    import java.sql.Timestamp
    val df = Seq((1L, "x", Timestamp.valueOf("1999-06-01 00:00:00")),
      (1L, "y", Timestamp.valueOf("1999-06-01 00:00:00")))
      .toDF("b", "i", "ts")
    val r = MarketBasket.backtest(df, "b", "i", "ts",
      "2000-01-01 00:00:00", minPairs = 1).head
    assert(r.getLong(2) === 0L && r.getLong(3) === 0L)
    assert(r.getDouble(4) === 0.0)
  }

  test("co-purchase rules on lineitem: ranked, bounded, lift positive") {
    val li = graft.Tables.lineitem(spark, sf0001)
      .filter($"l_quantity" >= 45)
      .select($"l_orderkey".as("b"), $"l_partkey".as("i"))
    val r = MarketBasket.rules(li, "b", "i", minPairs = 1, k = 20)
      .collect()
    assert(r.nonEmpty && r.length <= 20)
    val lifts = r.map(_.getDouble(5))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
    assert(lifts.forall(_ > 0))
  }
}
