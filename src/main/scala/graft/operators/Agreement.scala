package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** INTER-RATER AGREEMENT (Cohen's κ) — the label-quality gate for any
  * human- or model-labeled training set: raw percent agreement between
  * two label sources flatters itself whenever the label distribution
  * is skewed (two raters who both say "clean" 95% of the time agree
  * 90.25% by CHANCE). κ subtracts exactly that chance term:
  *
  *   κ = (p_o − p_e) / (1 − p_e),   p_e = Σ_l p_A(l)·p_B(l)
  *
  * The same statistic reads as model-vs-ground-truth agreement (the
  * lang-ID confusion matrix's scalar summary) or annotator-vs-
  * annotator consistency.
  *
  * Determinism: all counts are exact BIGINT from two hash aggs; p_o is
  * one double division; p_e folds the per-label products over the
  * BOUNDED label axis via an ordered running-sum window (products are
  * non-negative, so the window MAX of the running sum IS the total —
  * no unordered double agg); κ is a fixed double expression rounded to
  * the 6-dp grid.
  *
  * Scale: one pass for the diagonal + marginals (hash aggs, map-side
  * partials), label-axis-sized frames after that. Output one row:
  * `n, p_o, p_e, kappa`. */
object Agreement {

  /** Cohen's κ between `colA` and `colB` over one row per item. */
  def cohenKappa(df: DataFrame, colA: String, colB: String): DataFrame = {
    val base = df.select(col(colA).cast("string").as("__a"),
      col(colB).cast("string").as("__b"))
    val totals = base.agg(count(lit(1)).as("n"),
      count(when(col("__a") === col("__b"), lit(1))).as("n_agree"))
    val margA = base.groupBy(col("__a").as("__l")).agg(count(lit(1)).as("__na"))
    val margB = base.groupBy(col("__b").as("__l")).agg(count(lit(1)).as("__nb"))
    val wCum = Window.orderBy(col("__l"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("__l"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // per-label chance product nA_l·nB_l, folded in label order; the
    // full-outer join keeps labels only one source uses (their product
    // term is 0 — coalesce, not drop)
    val pe = margA.join(margB, Seq("__l"), "full_outer")
      .withColumn("__prod",
        coalesce(col("__na"), lit(0L)).cast("double") *
          coalesce(col("__nb"), lit(0L)).cast("double"))
      .withColumn("__peSum", max(sum(col("__prod")).over(wCum)).over(wAll))
      .limit(1).select(col("__peSum"))
    totals.crossJoin(pe)
      .select(col("n"),
        round(col("n_agree").cast("double") / col("n").cast("double"), 6)
          .as("p_o"),
        round(col("__peSum") / (col("n").cast("double") * col("n").cast("double")), 6)
          .as("p_e"))
      .withColumn("kappa",
        when(col("p_e") === 1.0, lit(0.0))
          .otherwise(round((col("p_o") - col("p_e")) / (lit(1.0) - col("p_e")), 6)))
  }

  /** DuckDB twin of [[cohenKappa]] — identical aggs, fold order, and
    * the ROUNDED p_o/p_e feeding κ. `pairsSql` must select `(a, b)`. */
  def sqlCohenKappa(pairsSql: String): String = s"""
    WITH base AS (
      SELECT CAST(a AS VARCHAR) AS a, CAST(b AS VARCHAR) AS b
      FROM ($pairsSql)
    ), t AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        CAST(count(CASE WHEN a = b THEN 1 END) AS BIGINT) AS n_agree
      FROM base
    ), ma AS (SELECT a AS l, CAST(count(*) AS BIGINT) AS na
      FROM base GROUP BY 1
    ), mb AS (SELECT b AS l, CAST(count(*) AS BIGINT) AS nb
      FROM base GROUP BY 1
    ), prods AS (
      SELECT coalesce(ma.l, mb.l) AS l,
        CAST(coalesce(na, 0) AS DOUBLE) * CAST(coalesce(nb, 0) AS DOUBLE)
          AS prod
      FROM ma FULL OUTER JOIN mb ON ma.l = mb.l
    ), cums AS (
      SELECT l, sum(prod) OVER (ORDER BY l
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM prods
    ), pe AS (SELECT max(cum) AS peSum FROM cums
    ), r AS (
      SELECT t.n,
        round(CAST(n_agree AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_o,
        round(peSum / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS p_e
      FROM t CROSS JOIN pe
    )
    SELECT n, p_o, p_e,
      CASE WHEN p_e = 1.0e0 THEN 0.0e0
        ELSE round((p_o - p_e) / (1.0e0 - p_e), 6) END AS kappa
    FROM r"""
}
