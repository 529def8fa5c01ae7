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

  test("ecdf scale mode: sup-norm drift ≤1%; rows and nulls preserved") {
    def e(exact: Boolean) =
      Robust.ecdf(li.select("l_returnflag", "l_extendedprice"),
          "l_extendedprice", Seq("l_returnflag"), exact = exact)
        .withColumnRenamed("l_extendedprice_ecdf",
          if (exact) "fe" else "fa")
    val joined = e(true).join(e(false),
      Seq("l_returnflag", "l_extendedprice"))
    assert(joined.count() >= li.count())
    val sup = joined.agg(max(abs(col("fe") - col("fa"))))
      .head().getDouble(0)
    assert(sup <= 0.01, s"ECDF sup-norm drift $sup > 1%")
  }

  test("ecdf: >6dp doubles are grid-quantized, not float-joined; " +
       "null values survive with null ecdf") {
    import spark.implicits._
    // two values closer than the 6-dp grid MUST collapse to one axis
    // point (the enforced bounded-axis contract), and a null value
    // row must come back (null ecdf) instead of silently dropping
    val rows = Seq(("g", Some(1.00000001)), ("g", Some(1.00000002)),
      ("g", Some(2.0)), ("g", None)).toDF("g", "v")
    val out = Robust.ecdf(rows, "v", Seq("g"))
    assert(out.count() === 4)
    assert(out.filter(col("v").isNull).count() === 1)
    assert(out.filter(col("v").isNull).head().isNullAt(
      out.columns.indexOf("v_ecdf")))
    val byV = out.filter(col("v").isNotNull)
      .collect().map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // the two sub-grid neighbours share one ecdf (both = 2/3)
    assert(byV(1.00000001) === byV(1.00000002))
    assert(math.abs(byV(1.00000001) - 2.0 / 3) < 1e-6)
    assert(byV(2.0) === 1.0)
  }

  test("gini scale mode drifts ≤ 0.001 from exact") {
    def g(exact: Boolean) =
      graft.operators.Inequality.gini(
          graft.Tables.events(spark, sf0001), "value", Seq("event_type"),
          exact = exact)
        .select(col("event_type"), col("gini").as(if (exact) "ge" else "ga"))
    val deltas = g(true).join(g(false), "event_type")
      .agg(max(abs(col("ge") - col("ga")))).head().getDouble(0)
    assert(deltas <= 0.001, s"gini drift $deltas > 0.001")
  }

  test("mann-whitney scale mode: z within 0.01 of exact") {
    val pu = graft.Tables.events(spark, sf0001)
      .groupBy(col("user_id"))
      .agg(sum(when(col("event_type") === "purchase",
          col("value").cast("decimal(12,2)"))
        .otherwise(lit(0).cast("decimal(12,2)")))
        .cast("decimal(18,2)").as("m"))
      .withColumn("variant", graft.operators.Experiment.variantOf(
        col("user_id"), Seq("control", "treatment"), salt = 17))
    def z(exact: Boolean) =
      graft.operators.Experiment.mannWhitney(pu, "variant", "m",
        "control", "treatment", exact = exact).head().getDouble(3)
    val d = math.abs(z(true) - z(false))
    assert(d <= 0.01, s"M-W z drift $d > 0.01")
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
