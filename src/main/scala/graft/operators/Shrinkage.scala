package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EMPIRICAL-BAYES RATE SHRINKAGE — the fix for every "top groups by
  * rate" list that is secretly a "smallest n" list: a 2/2 seller
  * outranks a 980/1000 one on the raw rate and loses all meaning.
  * Fit a Beta prior to the ENSEMBLE of group rates by method of
  * moments,
  *
  *   α + β = μ(1 − μ)/v − 1,   α = μ·(α + β)
  *
  * (μ, v = mean/variance of observed group rates), then report each
  * group's posterior mean
  *
  *   shrunk = (k + α) / (n + α + β)
  *
  * — small-n groups collapse toward the ensemble rate, big-n groups
  * keep their evidence. The classic baseball-batting-average move
  * (Efron & Morris 1975's machinery in its modern ranking form),
  * and the correct input for funnel/seller/domain leaderboards.
  *
  * Determinism/scale: pass 1 aggregates per group (k, n) — corpus-
  * sized hash agg; pass 2 fits (μ, v) over the GROUP axis with each
  * group's rate quantized to the 1e-6 integer grid first (floor-
  * portable) so the ensemble moments are exact BIGINT sums, order-
  * free in both engines; pass 3 broadcasts (α, β) back as one row.
  * Degenerate ensembles (v = 0, or v ≥ μ(1−μ) — rates MORE dispersed
  * than binomial allows no Beta fit) fall back to α = β = 1 (the
  * uniform prior: Laplace smoothing), documented. */
object Shrinkage {

  /** Per-group shrunk rates. `rows` must carry integer `kCol`
    * (successes) and `nCol` (trials ≥ 1) per group. Output:
    * `(groupCols…, n, k, rate_raw (6dp), rate_shrunk (6dp),
    * alpha (6dp), beta (6dp))`. */
  def ebRates(rows: DataFrame, groupCols: Seq[String], kCol: String,
              nCol: String): DataFrame = {
    val g = groupCols.map(col)
    val perGroup = rows.groupBy(g: _*)
      .agg(sum(col(kCol)).cast("bigint").as("k"),
        sum(col(nCol)).cast("bigint").as("n"))
      .filter(col("n") >= 1)
    def d(c: Column) = c.cast("double")
    val rateMicro = floor(d(col("k")) / d(col("n")) * lit(1e6) + lit(0.5))
      .cast("bigint")
    val ensemble = perGroup
      .select(rateMicro.as("__rm"))
      .agg(count(lit(1)).as("__g"), sum(col("__rm")).as("__s"),
        sum(col("__rm") * col("__rm")).as("__q"))
    val mu = d(col("__s")) / d(col("__g")) / lit(1e6)
    val v = (d(col("__q")) - d(col("__s")) * d(col("__s")) /
      d(col("__g"))) / (d(col("__g")) - lit(1.0)) / lit(1e12)
    val prior = ensemble.select(
      when(col("__g") >= 2 && v > 0 && v < mu * (lit(1.0) - mu),
        round(mu * (mu * (lit(1.0) - mu) / v - lit(1.0)), 6))
        .otherwise(lit(1.0)).as("__a"),
      when(col("__g") >= 2 && v > 0 && v < mu * (lit(1.0) - mu),
        round((lit(1.0) - mu) * (mu * (lit(1.0) - mu) / v - lit(1.0)), 6))
        .otherwise(lit(1.0)).as("__b"))
    perGroup.crossJoin(broadcast(prior))
      .select((g ++ Seq(col("n"), col("k"),
        round(d(col("k")) / d(col("n")), 6).as("rate_raw"),
        round((d(col("k")) + col("__a")) /
          (d(col("n")) + col("__a") + col("__b")), 6).as("rate_shrunk"),
        col("__a").as("alpha"), col("__b").as("beta"))): _*)
  }

  /** DuckDB twin of [[ebRates]]: `rowsSql` must select
    * `(groupCols…, k, n)` integer counts. */
  def sqlEbRates(rowsSql: String, groupCols: Seq[String]): String = {
    val ks = groupCols.mkString(", ")
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val mu = s"(${d("s")} / ${d("gc")} / 1e6)"
    val v = s"""(((${d("q")} - ${d("s")} * ${d("s")} / ${d("gc")})
      / (${d("gc")} - 1.0e0)) / 1e12)"""
    val fitOk = s"(gc >= 2 AND $v > 0 AND $v < $mu * (1e0 - $mu))"
    val ab = s"($mu * (1e0 - $mu) / $v - 1.0e0)"
    s"""
    WITH pg AS (
      SELECT $ks, CAST(sum(k) AS BIGINT) AS k, CAST(sum(n) AS BIGINT) AS n
      FROM ($rowsSql) GROUP BY $ks
      HAVING sum(n) >= 1
    ), ens AS (
      SELECT CAST(count(*) AS BIGINT) AS gc,
        CAST(sum(rm) AS BIGINT) AS s, CAST(sum(rm * rm) AS BIGINT) AS q
      FROM (SELECT CAST(floor(CAST(k AS DOUBLE) / CAST(n AS DOUBLE)
          * 1e6 + 0.5e0) AS BIGINT) AS rm FROM pg)
    ), prior AS (
      SELECT
        CASE WHEN $fitOk THEN round($mu * $ab, 6) ELSE 1.0e0 END AS a,
        CASE WHEN $fitOk THEN round((1e0 - $mu) * $ab, 6)
          ELSE 1.0e0 END AS b
      FROM ens)
    SELECT $ks, n, k,
      round(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate_raw,
      round((CAST(k AS DOUBLE) + a) / (CAST(n AS DOUBLE) + a + b), 6)
        AS rate_shrunk,
      a AS alpha, b AS beta
    FROM pg, prior"""
  }
}
