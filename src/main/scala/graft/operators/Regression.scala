package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ORDINARY LEAST SQUARES (simple regression with inference) — the
  * relationship readout the correlation matrix (D62) only hints at:
  * fit y = β₀ + β₁x by least squares and report the slope WITH its
  * standard error, t statistic and R², so "price rises with quantity"
  * becomes "β₁ = 3 612 ± 11 per unit, R² = 0.87" — an auditable
  * effect size, not a unitless correlation. [[graft.operators
  * .SeriesStats]]' Theil–Sen is the robust sibling (median of slopes);
  * OLS is the inference-bearing one (exact SEs under the classical
  * model), and real analytics surfaces ship both.
  *
  * Closed form off six exact moments:
  *
  *   β₁ = Sxy/Sxx,  β₀ = ȳ − β₁x̄,  R² = Sxy²/(Sxx·Syy),
  *   s² = (Syy − β₁·Sxy)/(n−2),  se(β₁) = √(s²/Sxx),
  *   se(β₀) = √(s²·(1/n + x̄²/Sxx))
  *
  * with Sxx = Σx² − (Σx)²/n etc. the centered sums.
  *
  * Scale/determinism: ONE hash aggregate (map-side partial) produces
  * n and five sums as exact decimals — inputs must sit on an exact
  * grid — and every reported number is one fixed IEEE sequence off
  * that row, identically written in the SQL twin; grouped form keys
  * the same aggregate by the group columns (bounded-axis output,
  * no window, no join). */
object Regression {

  /** Per-group simple OLS of `yCol` on `xCol`. Output: `(groupCols…,
    * n, slope, intercept, r2, se_slope, t_slope (6 dp))`; groups with
    * n < 3 or zero x-variance are dropped (no inference to report);
    * a perfect fit reports se_slope = 0 with t_slope null. */
  def ols(df: DataFrame, xCol: String, yCol: String,
          groupCols: Seq[String] = Nil): DataFrame = {
    val x = col(xCol); val y = col(yCol)
    val agg = Seq(count(lit(1)).as("__n"), sum(x).as("__sx"),
      sum(y).as("__sy"), sum(x * x).as("__sxx"),
      sum(y * y).as("__syy"), sum(x * y).as("__sxy"))
    val sums =
      if (groupCols.isEmpty) df.agg(agg.head, agg.tail: _*)
      else df.groupBy(groupCols.map(col): _*).agg(agg.head, agg.tail: _*)
    def d(c: String) = col(c).cast("double")
    val n = d("__n")
    val sxx = d("__sxx") - d("__sx") * d("__sx") / n
    val syy = d("__syy") - d("__sy") * d("__sy") / n
    val sxy = d("__sxy") - d("__sx") * d("__sy") / n
    val slope = sxy / sxx
    val intercept = d("__sy") / n - slope * d("__sx") / n
    val r2 = sxy * sxy / (sxx * syy)
    val s2 = (syy - slope * sxy) / (n - lit(2.0))
    val seSlope = sqrt(s2 / sxx)
    sums.filter(col("__n") >= 3 && sxx > 0)
      .select((groupCols.map(col) ++ Seq(
        col("__n").as("n"), round(slope, 6).as("slope"),
        round(intercept, 6).as("intercept"), round(r2, 6).as("r2"),
        round(seSlope, 6).as("se_slope"),
        when(seSlope === 0, lit(null).cast("double"))
          .otherwise(round(slope / seSlope, 6)).as("t_slope"))): _*)
  }

  /** DuckDB twin of [[ols]]: `rowsSql` must select `(groupCols…, x,
    * y)` on an exact grid. */
  def sqlOls(rowsSql: String, groupCols: Seq[String] = Nil): String = {
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val n = d("n0")
    val sxx = s"(${d("sxx")} - ${d("sx")} * ${d("sx")} / $n)"
    val syy = s"(${d("syy")} - ${d("sy")} * ${d("sy")} / $n)"
    val sxy = s"(${d("sxy")} - ${d("sx")} * ${d("sy")} / $n)"
    val slope = s"($sxy / $sxx)"
    val intercept = s"(${d("sy")} / $n - $slope * ${d("sx")} / $n)"
    val r2 = s"($sxy * $sxy / ($sxx * $syy))"
    val s2 = s"(($syy - $slope * $sxy) / ($n - 2.0e0))"
    val seSlope = s"sqrt($s2 / $sxx)"
    val gsel = if (groupCols.isEmpty) "" else groupCols.mkString("", ", ", ",")
    val gby = if (groupCols.isEmpty) "" else
      groupCols.mkString("GROUP BY ", ", ", "")
    s"""
    WITH r0 AS ($rowsSql), sums AS (
      SELECT $gsel CAST(count(*) AS BIGINT) AS n0,
        sum(x) AS sx, sum(y) AS sy, sum(x * x) AS sxx,
        sum(y * y) AS syy, sum(x * y) AS sxy
      FROM r0 $gby)
    SELECT $gsel n0 AS n, round($slope, 6) AS slope,
      round($intercept, 6) AS intercept, round($r2, 6) AS r2,
      round($seSlope, 6) AS se_slope,
      CASE WHEN $seSlope = 0 THEN NULL
        ELSE round($slope / $seSlope, 6) END AS t_slope
    FROM sums WHERE n0 >= 3 AND $sxx > 0"""
  }

  /** REGRESSION DISCONTINUITY — the third quasi-experimental read
    * next to DiD and the event study: when treatment switches at a
    * CUTOFF of a running variable (spend ≥ threshold gets the perk,
    * score ≥ bar gets admitted), units just left and just right of
    * the cutoff are as-good-as-randomized, so the outcome's JUMP at
    * the cutoff is the causal effect. Local linear on each side
    * within a bandwidth (the standard estimator):
    *
    *   τ = β₀ʳ − β₀ˡ   (each side's intercept AT x = r − cutoff = 0),
    *   se = √(se(β₀ˡ)² + se(β₀ʳ)²),
    *   se(β₀) = √(s²·(1/n + x̄²/Sxx))
    *
    * Cutoff convention: r = cutoff belongs to the RIGHT side
    * (treatment fires at ≥, documented).
    *
    * Determinism/scale: ONE conditional exact-sum aggregate over the
    * bandwidth window (bandwidth filter pushes to the scan), twelve
    * moments, one closed form — the [[Experiment.diffInDiff]] shape
    * with OLS cells. Output one row: `(n_l, n_r, intercept_l,
    * intercept_r, slope_l, slope_r, effect, se, t (6 dp))`. */
  def discontinuity(df: DataFrame, runCol: String, yCol: String,
                    cutoff: Double, bandwidth: Double): DataFrame = {
    require(bandwidth > 0)
    // exact-grid contract: runCol/yCol must fit DECIMAL(12,2); x and
    // every moment then sum exactly (double x would make Σx·y
    // summation-order-dependent)
    val r = col(runCol).cast("decimal(12,2)")
    val cut = lit(cutoff).cast("decimal(12,2)")
    val x = r - cut
    val y = col(yCol)
    val inBand = df.filter(
      r >= lit(cutoff - bandwidth).cast("decimal(12,2)") &&
        r <= lit(cutoff + bandwidth).cast("decimal(12,2)"))
    def side(isL: Boolean): Column =
      if (isL) r < cut else r >= cut
    def moments(tag: String, isL: Boolean) = Seq(
      count(when(side(isL), lit(1))).as(s"n_$tag"),
      sum(when(side(isL), x)).as(s"sx_$tag"),
      sum(when(side(isL), y)).as(s"sy_$tag"),
      sum(when(side(isL), x * x)).as(s"sxx_$tag"),
      sum(when(side(isL), y * y)).as(s"syy_$tag"),
      sum(when(side(isL), x * y)).as(s"sxy_$tag"))
    val aggs = moments("l", isL = true) ++ moments("r", isL = false)
    val sums = inBand.agg(aggs.head, aggs.tail: _*)
    def d(c: String) = col(c).cast("double")
    def fit(t: String): (Column, Column, Column) = {
      val n = d(s"n_$t")
      val sxx = d(s"sxx_$t") - d(s"sx_$t") * d(s"sx_$t") / n
      val syy = d(s"syy_$t") - d(s"sy_$t") * d(s"sy_$t") / n
      val sxy = d(s"sxy_$t") - d(s"sx_$t") * d(s"sy_$t") / n
      val slope = sxy / sxx
      val b0 = d(s"sy_$t") / n - slope * d(s"sx_$t") / n
      val s2 = (syy - slope * sxy) / (n - lit(2.0))
      val seB0 = sqrt(s2 * (lit(1.0) / n +
        (d(s"sx_$t") / n) * (d(s"sx_$t") / n) / sxx))
      (slope, b0, seB0)
    }
    val (slL, b0L, seL) = fit("l")
    val (slR, b0R, seR) = fit("r")
    val effect = b0R - b0L
    val se = sqrt(seL * seL + seR * seR)
    // zero x-variance on a side (one grid value in-band) has no local
    // line — filter it out BEFORE the projection evaluates the ratios
    // (ANSI division errors even on doubles)
    def sxxOf(t: String) =
      d(s"sxx_$t") - d(s"sx_$t") * d(s"sx_$t") / d(s"n_$t")
    sums.filter(col("n_l") >= 3 && col("n_r") >= 3 &&
        sxxOf("l") > 0 && sxxOf("r") > 0)
      .select(col("n_l"), col("n_r"),
        round(b0L, 6).as("intercept_l"), round(b0R, 6).as("intercept_r"),
        round(slL, 6).as("slope_l"), round(slR, 6).as("slope_r"),
        round(effect, 6).as("effect"), round(se, 6).as("se"),
        when(se === 0, lit(null).cast("double"))
          .otherwise(round(effect / se, 6)).as("t"))
  }

  /** DuckDB twin of [[discontinuity]]: `rowsSql` must select `(r, y)`
    * on an exact grid. */
  def sqlDiscontinuity(rowsSql: String, cutoff: Double,
                       bandwidth: Double): String = {
    import graft.functions.Noise.sqlDouble
    val c = sqlDouble(cutoff); val h = sqlDouble(bandwidth)
    def d(x: String) = s"CAST($x AS DOUBLE)"
    def fit(t: String): (String, String, String) = {
      val n = d(s"n_$t")
      val sxx = s"(${d(s"sxx_$t")} - ${d(s"sx_$t")} * ${d(s"sx_$t")} / $n)"
      val syy = s"(${d(s"syy_$t")} - ${d(s"sy_$t")} * ${d(s"sy_$t")} / $n)"
      val sxy = s"(${d(s"sxy_$t")} - ${d(s"sx_$t")} * ${d(s"sy_$t")} / $n)"
      val slope = s"($sxy / $sxx)"
      val b0 = s"(${d(s"sy_$t")} / $n - $slope * ${d(s"sx_$t")} / $n)"
      val s2 = s"(($syy - $slope * $sxy) / ($n - 2.0e0))"
      val seB0 = s"""sqrt($s2 * (1.0e0 / $n
        + (${d(s"sx_$t")} / $n) * (${d(s"sx_$t")} / $n) / $sxx))"""
      (slope, b0, seB0)
    }
    val (slL, b0L, seL) = fit("l")
    val (slR, b0R, seR) = fit("r")
    val effect = s"($b0R - $b0L)"
    val se = s"sqrt($seL * $seL + $seR * $seR)"
    s"""
    WITH r0 AS (
      SELECT CAST(r AS DECIMAL(12,2)) - CAST($c AS DECIMAL(12,2)) AS x,
        y, CAST(r AS DECIMAL(12,2)) < CAST($c AS DECIMAL(12,2)) AS lft
      FROM ($rowsSql)
      WHERE CAST(r AS DECIMAL(12,2)) >= CAST($c AS DECIMAL(12,2))
          - CAST($h AS DECIMAL(12,2))
        AND CAST(r AS DECIMAL(12,2)) <= CAST($c AS DECIMAL(12,2))
          + CAST($h AS DECIMAL(12,2))
    ), sums AS (
      SELECT
        CAST(count(CASE WHEN lft THEN 1 END) AS BIGINT) AS n_l,
        sum(CASE WHEN lft THEN x END) AS sx_l,
        sum(CASE WHEN lft THEN y END) AS sy_l,
        sum(CASE WHEN lft THEN x * x END) AS sxx_l,
        sum(CASE WHEN lft THEN y * y END) AS syy_l,
        sum(CASE WHEN lft THEN x * y END) AS sxy_l,
        CAST(count(CASE WHEN NOT lft THEN 1 END) AS BIGINT) AS n_r,
        sum(CASE WHEN NOT lft THEN x END) AS sx_r,
        sum(CASE WHEN NOT lft THEN y END) AS sy_r,
        sum(CASE WHEN NOT lft THEN x * x END) AS sxx_r,
        sum(CASE WHEN NOT lft THEN y * y END) AS syy_r,
        sum(CASE WHEN NOT lft THEN x * y END) AS sxy_r
      FROM r0)
    SELECT n_l, n_r,
      round($b0L, 6) AS intercept_l, round($b0R, 6) AS intercept_r,
      round($slL, 6) AS slope_l, round($slR, 6) AS slope_r,
      round($effect, 6) AS effect, round($se, 6) AS se,
      CASE WHEN $se = 0 THEN NULL
        ELSE round($effect / $se, 6) END AS t
    FROM sums WHERE n_l >= 3 AND n_r >= 3
      AND (${d("sxx_l")} - ${d("sx_l")} * ${d("sx_l")} / ${d("n_l")}) > 0
      AND (${d("sxx_r")} - ${d("sx_r")} * ${d("sx_r")} / ${d("n_r")}) > 0"""
  }
}
