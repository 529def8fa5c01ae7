package graft.operators

import org.apache.spark.sql.{DataFrame}
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
}
