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

  test("diffCi: planted effect excludes 0; identical groups include it") {
    import spark.implicits._
    // treatment = control + 10: the CI must sit strictly above 0
    val shifted = ((1L to 300L).map(i => ("control", i % 50 + 10.0, i)) ++
      (301L to 600L).map(i => ("treatment", i % 50 + 20.0, i)))
      .toDF("variant", "m", "key")
      .select(col("variant"), col("m").cast("decimal(18,2)").as("m"),
        col("key"))
    val r = Bootstrap.diffCi(shifted, "variant", "m", "control",
      "treatment", col("key"), nBoot = 60).head()
    assert(r.getLong(0) === 300L && r.getLong(1) === 300L)
    assert(r.getDouble(2) === 10.0)
    assert(r.getDouble(3) > 0, s"CI low ${r.getDouble(3)} should exclude 0")
    assert(r.getDouble(3) <= 10.0 && r.getDouble(4) >= 10.0)
    // same distribution in both arms: the CI must straddle 0
    val same = ((1L to 300L).map(i => ("control", i % 50 + 10.0, i)) ++
      (301L to 600L).map(i => ("treatment", i % 50 + 10.0, i)))
      .toDF("variant", "m", "key")
      .select(col("variant"), col("m").cast("decimal(18,2)").as("m"),
        col("key"))
    val n = Bootstrap.diffCi(same, "variant", "m", "control",
      "treatment", col("key"), nBoot = 60).head()
    assert(n.getDouble(3) < 0 && n.getDouble(4) > 0,
      s"null-effect CI [${n.getDouble(3)}, ${n.getDouble(4)}] excludes 0")
  }
}
