package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FIXED-EFFECT META-ANALYSIS — pool one effect measured in many
  * segments (sites, markets, cohorts, weeks) into a single estimate
  * with an honest heterogeneity read:
  *
  *   w_i = 1/se_i²,  pooled = Σw·e/Σw,  se = √(1/Σw),
  *   Q = Σw·(e − pooled)²  (χ²_{k−1} under homogeneity),
  *   I² = max(0, (Q − (k−1))/Q)
  *
  * The pooled row answers "what's the overall effect"; Q/I² answer
  * the question every per-segment table buries — "is it ONE effect,
  * or am I averaging different things?" (I² > ~50% = stop pooling,
  * investigate the segments). The inverse-variance weights make this
  * the minimum-variance combination — not the naive mean of effects.
  *
  * Determinism/scale: the segment axis is bounded by construction;
  * each segment's w, w·e and (for Q) w·e² terms are quantized to the
  * 1e-6 integer grid (floor-portable) so the folds are exact BIGINT
  * sums — order-free in both engines — and Q expands as
  * Σw·e² − pooled²·Σw (one closed form off the three sums, no second
  * pass). Output ONE row: `(k, pooled (6dp), se, z, q_stat, i2)`.
  * Segments with se ≤ 0 are dropped (no weight definable). */
object MetaAnalysis {

  /** Pool `effectCol` ± `seCol` across segment rows. */
  def fixedEffect(segments: DataFrame, effectCol: String,
                  seCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val e = d(col(effectCol)); val se = d(col(seCol))
    val w = lit(1.0) / (se * se)
    def micro(c: Column) =
      floor(c * lit(1e6) + lit(0.5)).cast("bigint")
    val sums = segments.filter(se > 0)
      .select(micro(w).as("__w"), micro(w * e).as("__we"),
        micro(w * e * e).as("__wee"))
      .agg(count(lit(1)).as("__k"), sum(col("__w")).as("__sw"),
        sum(col("__we")).as("__swe"), sum(col("__wee")).as("__swee"))
    def dd(c: String) = col(c).cast("double")
    val sw = dd("__sw") / lit(1e6)
    val swe = dd("__swe") / lit(1e6)
    val swee = dd("__swee") / lit(1e6)
    val pooled = swe / sw
    val seP = sqrt(lit(1.0) / sw)
    val q = swee - pooled * pooled * sw
    val df = dd("__k") - lit(1.0)
    val i2 = when(col("__k") >= 2 && q > df, (q - df) / q)
      .otherwise(lit(0.0))
    sums.filter(col("__k") >= 1)
      .select(col("__k").as("k"), round(pooled, 6).as("pooled"),
        round(seP, 6).as("se"), round(pooled / seP, 6).as("z"),
        round(q, 6).as("q_stat"), round(i2, 6).as("i2"))
  }

  /** DuckDB twin of [[fixedEffect]]: `segmentsSql` must select
    * `(e, se)` per segment. */
  def sqlFixedEffect(segmentsSql: String): String = {
    def m(x: String) = s"CAST(floor(($x) * 1e6 + 0.5e0) AS BIGINT)"
    val w = "(1e0 / (CAST(se AS DOUBLE) * CAST(se AS DOUBLE)))"
    val e = "CAST(e AS DOUBLE)"
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val sw = s"(${d("sw")} / 1e6)"
    val swe = s"(${d("swe")} / 1e6)"
    val swee = s"(${d("swee")} / 1e6)"
    val pooled = s"($swe / $sw)"
    val seP = s"sqrt(1e0 / $sw)"
    val q = s"($swee - $pooled * $pooled * $sw)"
    val df = s"(${d("k")} - 1.0e0)"
    s"""
    WITH seg AS (
      SELECT ${m(w)} AS wq, ${m(s"$w * $e")} AS weq,
        ${m(s"$w * $e * $e")} AS weeq
      FROM ($segmentsSql) WHERE CAST(se AS DOUBLE) > 0
    ), sums AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
        CAST(sum(wq) AS BIGINT) AS sw, CAST(sum(weq) AS BIGINT) AS swe,
        CAST(sum(weeq) AS BIGINT) AS swee
      FROM seg)
    SELECT k, round($pooled, 6) AS pooled, round($seP, 6) AS se,
      round($pooled / $seP, 6) AS z, round($q, 6) AS q_stat,
      round(CASE WHEN k >= 2 AND $q > $df
        THEN ($q - $df) / $q ELSE 0e0 END, 6) AS i2
    FROM sums WHERE k >= 1"""
  }
}
