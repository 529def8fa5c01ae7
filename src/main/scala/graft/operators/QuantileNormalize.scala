package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** QUANTILE NORMALIZATION — harmonize per-group score distributions
  * onto the POOLED distribution before mixing: two crawl sources whose
  * quality scorers drift apart (one centers at 0.4, one at 0.7) cannot
  * share a global threshold until each value is mapped through its
  * group's ECDF onto the pooled quantile function,
  * v ↦ Q_pool(F_group(v)) — the standard batch-effect correction
  * (microarray lineage) applied to curation scores.
  *
  * Scale shape — NO theta join, NO per-row rank window: both the
  * per-group ECDFs and the pooled quantile function live on the
  * bounded VALUE AXIS (groupBy value + ordered running sums, the ecdf
  * recipe — the decimal-grid contract is enforced the same way), and
  * the lookup Q_pool(f) = min{u : F_pool(u) ≥ f} is ONE unpartitioned
  * window over the UNION of the two axes ordered by the fraction —
  * min-of-pooled-value over the [current, ∞) RANGE frame — instead of
  * the non-equi join a naive translation would emit (bounded × bounded
  * but still a nested loop; the union-axis window is a sort of
  * axis-sized input). Rows join back to their (group, value) axis key
  * exactly like ecdf. Null values pass through with a null
  * `v_norm`.
  *
  * Determinism: counts are exact, fractions are one division each,
  * the range-frame min compares identical doubles, and the output
  * value is a pooled INPUT value (decimal grid) — no arithmetic on it
  * at all. Output: the input rows + `v_norm`. */
object QuantileNormalize {

  def normalize(df: DataFrame, groupCol: String, valueCol: String)
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val vk = col(valueCol).cast("decimal(18,6)")
    val keyed = df.withColumn("__vk", vk)
    // the union frame needs one group-key type across both sides — a
    // string cast (lossless for the key types in play) keeps the
    // lookup generic
    val axis = keyed.filter(col("__vk").isNotNull)
      .groupBy(col(groupCol).cast("string").as("__g"), col("__vk"))
      .agg(count(lit(1)).as("__n"))
    def d(c: Column) = c.cast("double")
    // per-group inclusive ECDF over the value axis
    val wg = Window.partitionBy(col("__g")).orderBy(col("__vk"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wgAll = Window.partitionBy(col("__g"))
    val groupF = axis
      .withColumn("__f", d(sum(col("__n")).over(wg))
        / d(sum(col("__n")).over(wgAll)))
      .select(col("__g"), col("__vk"), col("__f"))
    // pooled inclusive ECDF over the pooled value axis
    val pooledAxis = axis.groupBy(col("__vk")).agg(sum(col("__n")).as("__n"))
    val wp = Window.orderBy(col("__vk"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wpAll = Window.partitionBy()
    val pooledF = pooledAxis
      .withColumn("__fp", d(sum(col("__n")).over(wp))
        / d(sum(col("__n")).over(wpAll)))
      .select(col("__vk").as("__u"), col("__fp"))
    // union-axis lookup: Q_pool(f) = min pooled value whose pooled
    // fraction >= f — min over the [current, +inf) RANGE frame of the
    // fraction-ordered union (pooled fractions ride as __fp rows)
    val unioned = groupF
      .select(col("__g"), col("__vk"), col("__f").as("__frac"),
        lit(null).cast("decimal(18,6)").as("__u"))
      .unionByName(pooledF
        .select(lit(null).cast("string").as("__g"),
          lit(null).cast("decimal(18,6)").as("__vk"),
          col("__fp").as("__frac"), col("__u")))
    // min over [current, +inf) in ASCENDING frac order, expressed as
    // an EXPANDING frame in DESCENDING order: Spark's
    // UnboundedFollowing frame re-aggregates from scratch per row
    // (quadratic in the axis — measured 104 s at sf0.1), while the
    // expanding UnboundedPreceding frame accumulates in O(n). RANGE
    // (not ROWS) keeps equal-frac ties inside the frame either way.
    val wLook = Window.orderBy(col("__frac").desc)
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val mapped = unioned
      .withColumn("__vn", min(col("__u")).over(wLook))
      .filter(col("__g").isNotNull)
      .select(col("__g"), col("__vk"), col("__vn"))
    keyed.join(mapped,
        keyed(groupCol).cast("string") === mapped("__g")
          && keyed("__vk") <=> mapped("__vk"), "left_outer")
      .withColumn("v_norm", col("__vn").cast("double"))
      .drop("__g", "__vk", "__vn")
  }

  /** DuckDB twin of [[normalize]] — identical axes, fractions and
    * union-axis range-frame lookup. `rowsSql` must select `(g, v,
    * …passthrough)`; `cols` lists the passthrough output columns. */
  def sqlNormalize(rowsSql: String, cols: Seq[String]): String = {
    val colList = cols.mkString(", ")
    s"""
    WITH rows0 AS (
      SELECT $colList, g AS __g0, CAST(v AS DECIMAL(18,6)) AS vk
      FROM ($rowsSql)
    ), axis AS (
      SELECT __g0 AS g, vk, CAST(count(*) AS BIGINT) AS n
      FROM rows0 WHERE vk IS NOT NULL GROUP BY __g0, vk
    ), groupf AS (
      SELECT g, vk,
        CAST(sum(n) OVER (PARTITION BY g ORDER BY vk
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          / CAST(sum(n) OVER (PARTITION BY g) AS DOUBLE) AS f
      FROM axis
    ), pooled AS (
      SELECT vk AS u,
        CAST(sum(sn) OVER (ORDER BY vk
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          / CAST(sum(sn) OVER () AS DOUBLE) AS fp
      FROM (SELECT vk, sum(n) AS sn FROM axis GROUP BY vk)
    ), unioned AS (
      SELECT g, vk, f AS frac, CAST(NULL AS DECIMAL(18,6)) AS u
      FROM groupf
      UNION ALL
      SELECT CAST(NULL AS VARCHAR), CAST(NULL AS DECIMAL(18,6)), fp, u
      FROM pooled
    ), mapped AS (
      SELECT g, vk,
        min(u) OVER (ORDER BY frac DESC
          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vn
      FROM unioned
      QUALIFY g IS NOT NULL)
    SELECT ${cols.map(c => s"rows0.$c").mkString(", ")},
      CAST(vn AS DOUBLE) AS v_norm
    FROM rows0 LEFT JOIN mapped
      ON rows0.__g0 = mapped.g AND rows0.vk IS NOT DISTINCT FROM mapped.vk"""
  }
}
