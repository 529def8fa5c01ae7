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
}
