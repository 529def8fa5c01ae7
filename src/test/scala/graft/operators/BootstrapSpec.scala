package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BootstrapSpec extends SparkSpec {

  import spark.implicits._

  private def events = graft.Tables.events(spark, sf0001)

  test("CI brackets the point estimate and is deterministic") {
    val out = Bootstrap.meanCi(events, "value", Seq("event_type"),
        col("event_id"), b = 60)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.nonEmpty)
    out.foreach { case (g, (n, mean, lo, hi)) =>
      assert(n > 0)
      assert(lo <= hi, s"$g: lo $lo > hi $hi")
      // the point estimate sits inside (or on) the percentile interval
      assert(mean >= lo - 1e-9 && mean <= hi + 1e-9,
        s"$g: mean $mean outside [$lo, $hi]")
      // a nontrivial group gets a nontrivial interval
      if (n > 30) assert(hi > lo, s"$g: degenerate CI with n=$n")
    }
    // relayout determinism — the draw is keyed, not partition-dependent
    val again = Bootstrap.meanCi(events.repartition(7), "value",
        Seq("event_type"), col("event_id"), b = 60)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(again === out)
  }

  test("width shrinks roughly like 1/√n (more data → tighter CI)") {
    val small = events.filter(pmod(col("event_id"), lit(8L)) === 0)
    def width(df: org.apache.spark.sql.DataFrame) =
      Bootstrap.meanCi(df, "value", Seq("event_type"),
          col("event_id"), b = 60)
        .filter(col("event_type") === "view")
        .select(col("ci_hi") - col("ci_lo")).head().getDouble(0)
    val wSmall = width(small); val wFull = width(events)
    // 8× the data should shrink the width clearly (≈2.8×); ask for 1.5×
    assert(wFull < wSmall / 1.5, s"full $wFull vs 1/8th $wSmall")
  }

  test("Poisson weights average ≈ 1 (the resample preserves mass)") {
    // replica means should scatter AROUND the point estimate, not
    // systematically off it: compare the grand mean of replica means
    val ci = Bootstrap.meanCi(events, "value", Seq("event_type"),
      col("event_id"), b = 60, alpha = 0.5) // inner quartiles
    ci.collect().foreach { r =>
      val mean = r.getDouble(r.fieldIndex("mean"))
      val lo = r.getDouble(r.fieldIndex("ci_lo"))
      val hi = r.getDouble(r.fieldIndex("ci_hi"))
      // even the tight 50% interval must straddle the estimate
      assert(lo <= mean && mean <= hi)
    }
  }
}
