package graft.impute

import graft.SparkSpec

class RobustSpec extends SparkSpec {

  import spark.implicits._

  // group "a": 1..20 plus two wild outliers; percentile(0.05/0.95) of
  // 1..20,‑1000,1000 are interpolated type-7 values computed by Spark —
  // assert the CLIPPING behavior, not the fence arithmetic (the fence
  // sits under the DuckDB oracle row)
  private val df = ((1 to 20).map(i => ("a", i.toDouble)) ++
    Seq(("a", -1000.0), ("a", 1000.0), ("b", 7.0), ("b", 7.0)))
    .toDF("g", "v")

  test("winsorize: outliers clamp to fences, interior values untouched") {
    val out = Robust.winsorize(df, "v", Seq("g"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val a = out.filter(_._1 == "a")
    val lo = a.map(_._3).min; val hi = a.map(_._3).max
    // the wild values must be clamped exactly to the fences
    assert(a.find(_._2 == -1000.0).get._3 === lo)
    assert(a.find(_._2 == 1000.0).get._3 === hi)
    assert(lo > -1000.0 && hi < 1000.0)
    // values inside the fences pass through bit-identical
    a.filter(r => r._2 > lo && r._2 < hi).foreach(r => assert(r._3 === r._2))
    // monotone: clipping preserves order
    val sorted = a.sortBy(_._2)
    assert(sorted.map(_._3).sliding(2).forall(w => w(0) <= w(1)))
  }

  test("robustScale: median maps to 0, IQR=0 group maps to 0 not NaN") {
    val out = Robust.robustScale(df, "v", Seq("g"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    // all-equal group: IQR 0 → scaled 0
    out.filter(_._1 == "b").foreach(r => assert(r._3 === 0.0))
    val a = out.filter(_._1 == "a")
    // strictly increasing in v (affine positive transform)
    val sorted = a.sortBy(_._2)
    assert(sorted.map(_._3).sliding(2).forall(w => w(0) < w(1)))
    // a value at the median scales to 0: median of 22 values is between
    // 10 and 11 — check sign change around it instead of an exact zero
    assert(a.find(_._2 == 10.0).get._3 < 0 && a.find(_._2 == 11.0).get._3 > 0)
    assert(a.forall(r => !r._3.isNaN && !r._3.isInfinite))
  }

  test("schema: appends exactly one derived column") {
    assert(Robust.winsorize(df, "v", Seq("g")).columns.toSeq
      === Seq("g", "v", "v_clipped"))
    assert(Robust.robustScale(df, "v", Seq("g")).columns.toSeq
      === Seq("g", "v", "v_scaled"))
  }

  test("madOutliers: burst flagged, median row at z=0, σ-masking avoided") {
    import spark.implicits._
    // 11 calm hours around 10 plus one 100× burst: the σ z-score of
    // the burst is dragged DOWN by its own contribution to σ, MAD is
    // not. (Values deliberately spread: a majority sitting exactly AT
    // the median would make MAD itself 0 — the documented degenerate.)
    val vals = Seq(8.0, 9.0, 9.0, 10.0, 10.0, 10.0,
      11.0, 11.0, 12.0, 12.0, 8.0, 1000.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("a", i, v) }
      .toDF("g", "hour", "v")
    val out = Robust.madOutliers(df, "v", Seq("g"))
      .collect().map(r => r.getDouble(2) ->
        (r.getDouble(r.fieldIndex("robust_z")),
          r.getLong(r.fieldIndex("flagged")))).toMap
    assert(out(1000.0)._2 === 1L, "burst must flag")
    assert(out(10.0)._1 === 0.0 && out(10.0)._2 === 0L, "median rows calm")
    assert(out.count(_._2._2 == 1L) === 1, "only the burst flags")
    // degenerate group (constant values → MAD 0): z pinned to 0
    val const = Seq(("b", 1, 5.0), ("b", 2, 5.0)).toDF("g", "hour", "v")
    assert(Robust.madOutliers(const, "v", Seq("g"))
      .select("robust_z").collect().forall(_.getDouble(0) === 0.0))
  }

  test("ecdf: uniformization, max = 1, monotone, duplicate-safe") {
    val df = (Seq.fill(2)(("a", 10.0)) ++ Seq(("a", 20.0), ("a", 30.0)) ++
      Seq(("b", 5.0))).toDF("g", "v")
    val out = Robust.ecdf(df, "v", Seq("g"))
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2))
      .toMap
    // group a (n=4): F(10)=2/4, F(20)=3/4, F(30)=1
    assert(out(("a", 10.0)) === 0.5)
    assert(out(("a", 20.0)) === 0.75)
    assert(out(("a", 30.0)) === 1.0)
    // a single-row group maps to exactly 1
    assert(out(("b", 5.0)) === 1.0)
    // duplicates keep their multiplicity in the OUTPUT rows
    val rows = Robust.ecdf(df, "v", Seq("g")).collect()
    assert(rows.count(r => r.getString(0) == "a" && r.getDouble(1) == 10.0)
      === 2)
  }
}
