package graft.impute

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The `exact = false` SCALE MODE of the percentile-fence family:
  * approx_percentile's GK sketch (O(accuracy) mergeable state) replaces
  * exact `percentile`'s per-group value buffer — the one OOM-shaped
  * construct at 100 TB (every value of a group on one task). These
  * specs pin how far the sketch fences drift from the exact type-7
  * fences at working accuracy, so the trade is measured, not argued.
  */
class RobustModeSpec extends SparkSpec {

  private def li = graft.Tables.lineitem(spark, sf0001)

  test("winsorize approx fences sit within 1% of exact (per group)") {
    def fences(exact: Boolean) =
      Robust.winsorize(li, "l_extendedprice", Seq("l_returnflag"),
          exact = exact)
        .groupBy("l_returnflag")
        .agg(min("l_extendedprice_clipped").as("lo"),
          max("l_extendedprice_clipped").as("hi"))
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), r.getDouble(2))).toMap
    val e = fences(exact = true); val a = fences(exact = false)
    assert(e.keySet === a.keySet)
    e.foreach { case (g, (lo, hi)) =>
      val (alo, ahi) = a(g)
      val span = hi - lo
      assert(math.abs(alo - lo) <= 0.01 * span,
        s"group $g lo fence drift ${math.abs(alo - lo)} > 1% of $span")
      assert(math.abs(ahi - hi) <= 0.01 * span,
        s"group $g hi fence drift ${math.abs(ahi - hi)} > 1% of $span")
    }
  }

  test("robustScale approx: same zeros, scaled values track exact") {
    // scaled is a pure function of (group, value), so compare on the
    // DISTINCT (group, value) domain — (l_orderkey, l_linenumber) is
    // NOT unique in this data generation (the KNN query documents the
    // duplicate groups) and a row join would pair unrelated rows
    def scaled(exact: Boolean) =
      Robust.robustScale(li, "l_extendedprice", Seq("l_returnflag"),
          exact = exact)
        .select("l_returnflag", "l_extendedprice", "l_extendedprice_scaled")
        .distinct()
    val mx = scaled(true).withColumnRenamed("l_extendedprice_scaled", "se")
      .join(scaled(false).withColumnRenamed("l_extendedprice_scaled", "sa"),
        Seq("l_returnflag", "l_extendedprice"))
      .agg(max(abs(col("se") - col("sa"))).as("mx"))
      .head().getDouble(0)
    // scaled values are (x−med)/IQR ~ O(1); 2% absolute covers both
    // fence drifts compounding through the division
    assert(mx <= 0.02, s"max scaled delta $mx > 0.02")
  }

  test("madOutliers approx flags agree on ≥99% of rows") {
    val hourly = graft.Tables.events(spark, sf0001)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
    def flags(exact: Boolean) =
      Robust.madOutliers(hourly, "n", Seq("event_type"), exact = exact)
        .select(col("event_type"), col("hour"), col("flagged"))
    val disagree = flags(true).withColumnRenamed("flagged", "fe")
      .join(flags(false).withColumnRenamed("flagged", "fa"),
        Seq("event_type", "hour"))
      .filter(col("fe") =!= col("fa")).count()
    val total = hourly.count()
    assert(disagree.toDouble / total <= 0.01,
      s"$disagree / $total flags disagree")
  }

  test("quantileBins approx bins agree with exact on ≥99% of values") {
    // bin is a pure function of (group, value) — compare on the
    // distinct domain (see robustScale note on non-unique row keys)
    def bins(exact: Boolean) =
      Discretize.quantileBins(li, "l_extendedprice",
          Seq("l_returnflag"), nBins = 10, exact = exact)
        .select("l_returnflag", "l_extendedprice", "l_extendedprice_bin")
        .distinct()
    val joined = bins(true).withColumnRenamed("l_extendedprice_bin", "be")
      .join(bins(false).withColumnRenamed("l_extendedprice_bin", "ba"),
        Seq("l_returnflag", "l_extendedprice"))
    val n = joined.count()
    val disagree = joined.filter(col("be") =!= col("ba")).count()
    assert(disagree.toDouble / n <= 0.01, s"$disagree / $n bins disagree")
  }
}
