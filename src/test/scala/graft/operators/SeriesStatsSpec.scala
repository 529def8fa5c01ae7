package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SeriesStatsSpec extends SparkSpec {

  import spark.implicits._

  test("alternating series: acf(1) = -(n-1)/n, acf(2) = (n-2)/n exactly") {
    // x alternates 10, 20 over n = 10 buckets: mean 15, deviations
    // +/-5 -> num_k = sum of (n-k) products of magnitude 25 with sign
    // (-1)^k, den = 10 * 25
    val df = (0 until 10).map(t => ("g", t.toLong,
      if (t % 2 == 0) 10.0 else 20.0)).toDF("g", "t", "x")
    val out = SeriesStats.acf(df, "t", "x", Seq("g"), maxLag = 3)
      .collect().map(r => r.getLong(1) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out(1L) === ((9L, -0.9)))
    assert(out(2L) === ((8L, 0.8)))
    assert(out(3L) === ((7L, -0.7)))
  }

  test("constant series: zero variance guards acf to 0, not NaN") {
    val df = (0 until 8).map(t => ("g", t.toLong, 42.0)).toDF("g", "t", "x")
    val out = SeriesStats.acf(df, "t", "x", Seq("g"), maxLag = 2).collect()
    assert(out.length === 2)
    assert(out.forall(_.getDouble(3) === 0.0))
  }

  test("Ljung-Box: alternating series rejects white noise, constant doesn't") {
    val df = (
      (0 until 40).map(t => ("alt", t.toLong,
        if (t % 2 == 0) 10.0 else 20.0)) ++
      (0 until 40).map(t => ("flat", t.toLong, 42.0))
    ).toDF("g", "t", "x")
    val out = SeriesStats.ljungBox(df, "t", "x", Seq("g"), maxLag = 3)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getLong(3))).toMap
    assert(out("alt")._1 === 3L)
    assert(out("alt")._3 === 1L, s"alternating must reject: ${out("alt")}")
    assert(out("flat")._2 === 0.0 && out("flat")._3 === 0L)
    // hand value for the alternating series: r = (-39/40, 38/40,
    // -37/40) rounded 6dp; Q = sum n(n+2) r_k^2/(n-k), n = 40
    val rs = Seq(39, 38, 37).zipWithIndex.map { case (m, i) =>
      val r = BigDecimal(math.pow(-1.0, i + 1) * m / 40.0)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      40.0 * 42.0 * r * r / (40 - (i + 1))
    }
    val q = BigDecimal(rs.sum).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(out("alt")._2 - q) < 1e-4, s"${out("alt")._2} vs $q")
  }

  test("Theil-Sen: exact slope on linear data; one wild point cannot move it") {
    // x = 2t over t = 0..9, with x_5 smashed to 100: 36 clean pairs
    // have slope exactly 2, 4 pairs fall far below, 5 far above ->
    // the median (23rd of 45) sits inside the clean run
    val clean = (0 until 10).map(t => ("clean", t.toLong, 2.0 * t))
    val dirty = (0 until 10).map(t => ("dirty", t.toLong,
      if (t == 5) 100.0 else 2.0 * t))
    val out = SeriesStats.theilSen(
      (clean ++ dirty).toDF("g", "t", "x"), "t", "x", Seq("g"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out("clean") === ((10L, 45L, 2.0)))
    assert(out("dirty") === ((10L, 45L, 2.0)))
  }

  test("Theil-Sen: groups with < 2 points are absent") {
    val df = Seq(("a", 1L, 1.0), ("a", 2L, 3.0), ("b", 1L, 9.0))
      .toDF("g", "t", "x")
    val out = SeriesStats.theilSen(df, "t", "x", Seq("g")).collect()
    assert(out.length === 1 && out(0).getString(0) === "a")
    assert(out(0).getDouble(3) === 2.0)
  }

  test("seasonal decomposition recovers an exact trend+seasonal series") {
    // x_t = 10t + s_{t mod 4}, s = (0, 5, -3, -2) (sums to 0): the
    // 2x4 centered MA cancels the periodic part exactly, so trend =
    // 10t, seasonal = s, residual = 0 on the interior
    val s = Seq(0.0, 5.0, -3.0, -2.0)
    val df = (0 until 20).map(t => ("g", t.toLong, 10.0 * t + s(t % 4)))
      .toDF("g", "t", "x")
    val out = SeriesStats.seasonalDecompose(df, "t", "x", Seq("g"), 4)
      .collect().map(r => r.getLong(1) -> r).toMap
    assert(out.size === 20)
    for (t <- 2 to 17) {
      val r = out(t.toLong)
      assert(r.getDouble(3) === 10.0 * t, s"trend at $t")
      assert(r.getDouble(4) === s(t % 4), s"seasonal at $t")
      assert(r.getDouble(5) === 0.0, s"residual at $t")
    }
    for (t <- Seq(0L, 1L, 18L, 19L)) {
      assert(out(t).isNullAt(3) && out(t).isNullAt(5), s"edge $t")
    }
  }

  test("seasonal decomposition: series shorter than period+1 is all-null trend") {
    val df = (0 until 3).map(t => ("g", t.toLong, 5.0)).toDF("g", "t", "x")
    val out = SeriesStats.seasonalDecompose(df, "t", "x", Seq("g"), 4)
      .collect()
    assert(out.length === 3)
    assert(out.forall(r => r.isNullAt(3) && r.isNullAt(4) && r.isNullAt(5)))
  }

  test("groups are independent; null buckets drop") {
    val df = (
      (0 until 10).map(t => ("flat", Some(t.toLong), 5.0)) ++
      (0 until 10).map(t => ("alt", Some(t.toLong),
        if (t % 2 == 0) 0.0 else 2.0)) ++
      Seq(("alt", None, 99.0))
    ).toDF("g", "t", "x")
    val out = SeriesStats.acf(df, "t", "x", Seq("g"), maxLag = 1)
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("flat") === 0.0)
    assert(out("alt") === -0.9)
  }
}
