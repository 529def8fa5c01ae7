package graft.operators

import graft.functions.Noise
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A/B experiment analysis — the measurement half of every rollout a
  * data/curation pipeline ships (new dedup threshold, new quality gate,
  * new ranking): assign units to variants DETERMINISTICALLY, aggregate
  * a per-unit metric, and report the Welch two-sample t statistic.
  *
  * Design decisions, each forced by the 100 TB / oracle constraints:
  *
  *  - Assignment is [[Noise.intRank]] mod #variants — pure BIGINT
  *    arithmetic on the unit's own key. Same unit ⇒ same variant on
  *    any engine, any partitioning, any day (the property that makes
  *    an experiment re-analyzable and lets late events join the right
  *    arm); and DuckDB reproduces the exact assignment, so the whole
  *    analysis sits under the bit-exact oracle. Engine RNGs can do
  *    none of this.
  *  - Per-unit metrics are summed on the DECIMAL grid (events.value
  *    lives on a 2-dp money grid, FIXTURES.md), so the group sums are
  *    exact and addition-order-insensitive — partial aggregation and
  *    AQE re-planning cannot change a digit.
  *  - The t statistic itself is one FIXED sequence of IEEE double ops
  *    over those exact sums, rounded to the 6-dp grid — the repo's
  *    standard recipe for cross-engine float agreement.
  *
  * Scale shape: one hash shuffle on the unit key (the per-unit metric
  * groupBy — partial-aggregated, so each mapper emits one row per
  * local unit), then a 1-row conditional aggregate (map-side partials,
  * no second wide shuffle). Nothing is ever collected; variance comes
  * from Σm and Σm² in the same pass, not a second scan.
  */
object Experiment {

  /** Deterministic variant label for a BIGINT unit key: variants(i)
    * where i = intRank(key, salt) mod variants.size. */
  def variantOf(key: Column, variants: Seq[String], salt: Int): Column = {
    require(variants.nonEmpty, "variants must be non-empty")
    val idx = pmod(Noise.intRank(key, salt), lit(variants.size.toLong))
    variants.zipWithIndex.tail.foldLeft(
      when(idx === 0L, variants.head)) { case (acc, (v, i)) =>
        acc.when(idx === i.toLong, v)
    }
  }

  /** DuckDB twin of [[variantOf]] — identical arithmetic. */
  def sqlVariantOf(keyExpr: String, variants: Seq[String], salt: Int): String = {
    val idx = s"(${Noise.sqlIntRank(keyExpr, salt)} % ${variants.size})"
    val whens = variants.zipWithIndex
      .map { case (v, i) => s"WHEN $idx = $i THEN '$v'" }.mkString(" ")
    s"(CASE $whens END)"
  }

  /** Welch two-sample t-test over per-unit metrics: one row with group
    * sizes, means, sample variances, the t statistic and the
    * Welch–Satterthwaite degrees of freedom. `metricCol` must already
    * be DECIMAL (exact) — the caller owns the grid; `perUnit` must hold
    * one row per experimental unit.
    *
    * Output columns (doubles rounded to 6 dp): n_a, n_b, mean_a,
    * mean_b, var_a, var_b, t_stat, df_welch.
    */
  def welchTTest(perUnit: DataFrame, variantCol: String, metricCol: String,
                 a: String, b: String): DataFrame = {
    val m = col(metricCol)
    def side(v: String, agg: Column): Column =
      sum(when(col(variantCol) === v, agg).otherwise(lit(null)))
    // Σm exact on the input grid; Σm² exact on the squared grid (the
    // square of a DECIMAL is DECIMAL — Spark and DuckDB both widen)
    val sums = perUnit.agg(
      count(when(col(variantCol) === a, lit(1))).as("n_a"),
      count(when(col(variantCol) === b, lit(1))).as("n_b"),
      side(a, m).as("s_a"), side(b, m).as("s_b"),
      side(a, m * m).as("q_a"), side(b, m * m).as("q_b"))
    // fixed double-op sequence from the exact sums (same order as sql())
    def d(c: String) = col(c).cast("double")
    val meanA = d("s_a") / d("n_a")
    val meanB = d("s_b") / d("n_b")
    val varA = (d("q_a") - d("s_a") * d("s_a") / d("n_a")) / (d("n_a") - lit(1.0))
    val varB = (d("q_b") - d("s_b") * d("s_b") / d("n_b")) / (d("n_b") - lit(1.0))
    val seA = varA / d("n_a")
    val seB = varB / d("n_b")
    val se2 = seA + seB
    val t = (meanA - meanB) / sqrt(se2)
    val dfW = se2 * se2 /
      (seA * seA / (d("n_a") - lit(1.0)) + seB * seB / (d("n_b") - lit(1.0)))
    sums.select(
      col("n_a"), col("n_b"),
      round(meanA, 6).as("mean_a"), round(meanB, 6).as("mean_b"),
      round(varA, 6).as("var_a"), round(varB, 6).as("var_b"),
      round(t, 6).as("t_stat"), round(dfW, 6).as("df_welch"))
  }

  /** DuckDB twin of [[welchTTest]]: `perUnitSql` must select
    * `(variant, m)` with `m` DECIMAL. */
  def sqlWelch(perUnitSql: String, a: String, b: String): String = {
    def side(v: String, e: String) =
      s"sum(CASE WHEN variant = '$v' THEN $e ELSE NULL END)"
    s"""
    WITH pu AS ($perUnitSql), sums AS (
      SELECT
        count(CASE WHEN variant = '$a' THEN 1 END) AS n_a,
        count(CASE WHEN variant = '$b' THEN 1 END) AS n_b,
        ${side(a, "m")} AS s_a, ${side(b, "m")} AS s_b,
        ${side(a, "m * m")} AS q_a, ${side(b, "m * m")} AS q_b
      FROM pu)
    SELECT n_a, n_b,
      round(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6) AS mean_a,
      round(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6) AS mean_b,
      round((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
        / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0e0), 6) AS var_a,
      round((CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
        / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0e0), 6) AS var_b,
      round(((CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
           - (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)))
        / sqrt(
            ((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
              / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0e0))
              / CAST(n_a AS DOUBLE)
          + ((CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
              / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0e0))
              / CAST(n_b AS DOUBLE)), 6) AS t_stat,
      round(
        (((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
            / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0e0))
            / CAST(n_a AS DOUBLE)
         + ((CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
            / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0e0))
            / CAST(n_b AS DOUBLE))
        * (((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
            / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0e0))
            / CAST(n_a AS DOUBLE)
         + ((CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
            / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0e0))
            / CAST(n_b AS DOUBLE))
        / (
          (((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
            / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0e0))
            / CAST(n_a AS DOUBLE))
          * (((CAST(q_a AS DOUBLE) - CAST(s_a AS DOUBLE) * CAST(s_a AS DOUBLE)
            / CAST(n_a AS DOUBLE)) / (CAST(n_a AS DOUBLE) - 1.0e0))
            / CAST(n_a AS DOUBLE))
          / (CAST(n_a AS DOUBLE) - 1.0e0)
          + (((CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
            / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0e0))
            / CAST(n_b AS DOUBLE))
          * (((CAST(q_b AS DOUBLE) - CAST(s_b AS DOUBLE) * CAST(s_b AS DOUBLE)
            / CAST(n_b AS DOUBLE)) / (CAST(n_b AS DOUBLE) - 1.0e0))
            / CAST(n_b AS DOUBLE))
          / (CAST(n_b AS DOUBLE) - 1.0e0)), 6) AS df_welch
    FROM sums"""
  }
}
