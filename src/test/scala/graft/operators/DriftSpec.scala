package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DriftSpec extends SparkSpec {

  import spark.implicits._

  private def snap(base: Seq[Double], curr: Seq[Double]) =
    (base.map(("base", _)) ++ curr.map(("curr", _)))
      .toDF("snapshot", "v")

  test("PSI: hand fixture; zero on identical snapshots") {
    // base = one value per bin (0..9, B=10); curr = everything in the
    // top bin. pb = 1.5/15 each; pc = 0.5/15 ×9, 10.5/15 at bin 9:
    // PSI = 9·(1/30−0.1)·ln(1/3) + 0.6·ln 7 = 1.826713
    val vals = (0 to 9).map(_.toDouble)
    val r = Drift.psi(snap(vals, Seq.fill(10)(9.0)),
      "snapshot", "v", "base", "curr", bins = 10).head()
    assert(r.getLong(0) === 10L && r.getLong(1) === 10L)
    assert(r.getDouble(2) === 1.826713)
    // identical snapshots: every term is exactly 0
    val same = Drift.psi(snap(vals, vals),
      "snapshot", "v", "base", "curr", bins = 10).head()
    assert(same.getDouble(2) === 0.0)
  }

  test("PSI: affine-invariant binning; thresholds order drift sizes") {
    val base = (1 to 1000).map(i => (i % 97).toDouble)
    val small = base.map(_ + 2.0) // slight shift
    val big = (1 to 1000).map(i => 80.0 + (i % 17)) // concentrated high
    val pSmall = Drift.psi(snap(base, small),
      "snapshot", "v", "base", "curr").head().getDouble(2)
    val pBig = Drift.psi(snap(base, big),
      "snapshot", "v", "base", "curr").head().getDouble(2)
    assert(pSmall < pBig, s"$pSmall !< $pBig")
    assert(pBig > 0.25, s"major shift should flag: $pBig")
    // affine transform of BOTH snapshots leaves every bin assignment —
    // hence PSI — bit-identical (min–max-relative binning)
    val scaled = Drift.psi(
      snap(base.map(v => v * 3.5 - 11.0), small.map(v => v * 3.5 - 11.0)),
      "snapshot", "v", "base", "curr").head().getDouble(2)
    assert(scaled === pSmall)
  }

  test("Wasserstein-1: point masses and uniform shifts give exact distances") {
    // base at 0, curr at 7: W1 = 7 (move all mass 7 units)
    val point = Drift.wasserstein1(
      snap(Seq.fill(10)(0.0), Seq.fill(10)(7.0)),
      "snapshot", "v", "base", "curr").head()
    assert(point.getDouble(2) === 7.0)
    // uniform grid 1..100 vs the same grid shifted by 5: W1 = 5
    val shift = Drift.wasserstein1(
      snap((1 to 100).map(_.toDouble), (1 to 100).map(_ + 5.0)),
      "snapshot", "v", "base", "curr").head()
    assert(shift.getDouble(2) === 5.0)
    // identical snapshots: 0
    val same = Drift.wasserstein1(
      snap((1 to 50).map(_.toDouble), (1 to 50).map(_.toDouble)),
      "snapshot", "v", "base", "curr").head()
    assert(same.getDouble(2) === 0.0)
    // unbalanced sizes still integrate the ECDF gap, not raw counts:
    // base {0,1} x5 each vs curr {0,1} x50 each -> same distribution,
    // W1 = 0 despite 10x the rows
    val sizes = Drift.wasserstein1(
      snap(Seq.fill(5)(0.0) ++ Seq.fill(5)(1.0),
        Seq.fill(50)(0.0) ++ Seq.fill(50)(1.0)),
      "snapshot", "v", "base", "curr").head()
    assert(sizes.getDouble(2) === 0.0)
  }

  test("CUSUM: closed form equals the direct recursion; planted shift alarms") {
    // level 100 for t < 20, shifted to 130 after; mean ends up between,
    // so the upper CUSUM climbs through the shift and alarms
    val xs = (0 until 40).map(t => if (t < 20) 100.0 else 130.0)
    val df = xs.zipWithIndex.map { case (x, t) => ("g", t.toLong, x) }
      .toDF("g", "t", "x")
    val out = Drift.cusum(df, "t", "x", Seq("g"),
      allowanceMicro = 5000000L, thresholdMicro = 30000000L)
      .orderBy("t").collect()
    // direct recursion in micro-units
    val mu = (xs.map(x => (x * 100).toLong * 10000L).sum / 40L)
    var sUp = 0L; var sDn = 0L
    xs.zipWithIndex.foreach { case (x, t) =>
      val xm = (x * 100).toLong * 10000L
      sUp = math.max(0L, sUp + xm - mu - 5000000L)
      sDn = math.max(0L, sDn + mu - xm - 5000000L)
      val r = out(t)
      assert(r.getDouble(2) === sUp / 1e6, s"s_plus at t=$t")
      assert(r.getDouble(3) === sDn / 1e6, s"s_minus at t=$t")
      assert(r.getLong(4) === (if (sUp > 30000000L) 1L else 0L))
      assert(r.getLong(5) === (if (sDn > 30000000L) 1L else 0L))
    }
    // the shift is caught: upper alarms fire in the second half only
    val ups = out.map(_.getLong(4))
    assert(ups.take(20).forall(_ === 0L), "no false alarm pre-shift")
    assert(ups.drop(20).exists(_ === 1L), "shift alarmed")
    // the pre-shift segment runs BELOW the overall mean -> the lower
    // side legitimately alarms there (S⁻ peaks at 200 at t=19), then
    // drains at 20/step post-shift: 200−20(t−19) ≤ 30 from t = 28
    assert(out.map(_.getLong(5)).drop(28).forall(_ === 0L))
    assert(out(19).getLong(5) === 1L)
  }

  test("CUSUM: null buckets and values are excluded from the series") {
    val df = Seq(("g", Some(0L), Some(50.0)), ("g", Some(1L), None),
      ("g", None, Some(99.0)), ("g", Some(2L), Some(50.0)))
      .toDF("g", "t", "x")
    val out = Drift.cusum(df, "t", "x", Seq("g"),
      allowanceMicro = 1000000L, thresholdMicro = 10000000L)
    assert(out.count() === 2L) // only the two fully-present rows
    assert(out.agg(max(col("alarm_up"))).head().getLong(0) === 0L)
  }

  test("CUSUM: stable series never alarms; per-group isolation") {
    val df = ((0 until 30).map(t => ("a", t.toLong, 50.0)) ++
      (0 until 30).map(t => ("b", t.toLong, if (t < 15) 10.0 else 500.0)))
      .toDF("g", "t", "x")
    val out = Drift.cusum(df, "t", "x", Seq("g"),
      allowanceMicro = 1000000L, thresholdMicro = 10000000L)
    assert(out.filter(col("g") === "a")
      .agg(max(col("alarm_up")) + max(col("alarm_down"))).head().getLong(0) === 0L)
    assert(out.filter(col("g") === "b")
      .agg(max(col("alarm_up"))).head().getLong(0) === 1L)
  }

  test("PSI: per-group independence; current outliers clamp to edge bins") {
    val df = (
      (1 to 100).map(i => ("g1", "base", (i % 10).toDouble)) ++
      (1 to 100).map(i => ("g1", "curr", (i % 10).toDouble)) ++
      (1 to 100).map(i => ("g2", "base", (i % 10).toDouble)) ++
      // g2 current sits entirely OUTSIDE the baseline range -> all
      // rows clamp into the top edge bin, a maximal drift signal
      (1 to 100).map(i => ("g2", "curr", 1000.0 + i))
    ).toDF("g", "snapshot", "v")
    val out = Drift.psi(df, "snapshot", "v", "base", "curr",
      groupCols = Seq("g")).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("g1") === 0.0)
    assert(out("g2") > 1.0, s"clamped drift should be large: ${out("g2")}")
  }

  test("JSD: zero on identical snapshots, bounded by 1 bit, orders drift") {
    val same = (1 to 100).flatMap(i =>
      Seq(("g", "base", i.toDouble), ("g", "curr", i.toDouble)))
    val far = (1 to 100).flatMap(i =>
      Seq(("h", "base", i.toDouble),
        ("h", "curr", 1000.0 + i))) // clamps into the top edge bin
    val near = (1 to 100).flatMap(i =>
      Seq(("m", "base", i.toDouble), ("m", "curr", i + 10.0)))
    val out = Drift.jsDivergence(
      (same ++ far ++ near).toDF("g", "snap", "v"),
      "snap", "v", "base", "curr", bins = 10, groupCols = Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("g") === 0.0)
    assert(out("h") > out("m") && out("m") > 0.0,
      s"ordering: ${out("h")} > ${out("m")} > 0")
    assert(out.values.forall(v => v >= 0.0 && v <= 1.0 + 1e-9),
      s"JSD in bits must land in [0,1]: $out")
  }

  test("JSD: symmetric when both sides share the support") {
    // identical min/max on both sides -> the baseline-edge asymmetry
    // vanishes and JSD(base, curr) == JSD(curr, base)
    val rows = ((1 to 50).map(i => ("g", "a", i.toDouble)) ++
      (1 to 50).map(i => ("g", "b", if (i <= 25) i.toDouble else 50.0)) ++
      Seq(("g", "a", 50.0), ("g", "b", 1.0))).toDF("g", "snap", "v")
    val ab = Drift.jsDivergence(rows, "snap", "v", "a", "b",
      groupCols = Seq("g")).collect()(0).getDouble(3)
    val ba = Drift.jsDivergence(rows, "snap", "v", "b", "a",
      groupCols = Seq("g")).collect()(0).getDouble(3)
    assert(ab === ba, s"$ab vs $ba")
    assert(ab > 0.0)
  }
}
