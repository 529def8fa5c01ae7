package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ROC-AUC — the threshold-free ranking metric the classifier-eval
  * family (Brier decomposition, reliability calibration) was missing:
  * P(score(random positive) > score(random negative)), ties counted
  * half. Computed by the rank-sum identity AUC = U⁺/(n⁺·n⁻) over the
  * DISTINCT-SCORE axis — the same tie-exact 2U fold as
  * [[Experiment.mannWhitney]] (AUC and Mann–Whitney are the same
  * statistic in different clothes), so ties are exact, no per-row
  * rank window ever touches the corpus, and the whole metric is one
  * hash agg + one bounded-axis ordered window.
  *
  * Determinism: counts are BIGINT; 2U stays integral through the tie
  * halves; the single emitted quotient finishes on the 6-dp
  * floor-portable grid (§5.3). Scores should already live on a
  * bounded grid (classifier outputs at 6 dp — the ecdf contract);
  * raw continuous scores make the axis corpus-sized, which is the
  * documented exact-percentile hazard, not a correctness issue.
  *
  * Scale: one (group, score)-keyed hash agg (partial map-side), an
  * ordered window over the bounded score axis per group, one final
  * group agg. Output per group: `(groupCols…, n_pos, n_neg, auc)`;
  * auc is null when either class is empty (0/0 is not 0.5). */
object RankEval {

  def auc(df: DataFrame, labelCol: String, scoreCol: String,
          groupCols: Seq[String] = Nil): DataFrame = {
    val g = groupCols.map(col)
    val byValue = df
      .filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
      .groupBy(g :+ col(scoreCol).cast("decimal(18,6)").as("__v"): _*)
      .agg(count(when(col(labelCol).cast("int") === 1, lit(1)))
          .as("__np"),
        count(when(col(labelCol).cast("int") === 0, lit(1)))
          .as("__nn"))
    val wPrev = (if (g.isEmpty) Window.orderBy(col("__v"))
      else Window.partitionBy(g: _*).orderBy(col("__v")))
      .rowsBetween(Window.unboundedPreceding, -1)
    val terms = byValue
      .withColumn("__cumN", coalesce(sum(col("__nn")).over(wPrev), lit(0L)))
      // 2·U⁺ = Σ 2·np·(negatives below) + np·nn (ties count half)
      .withColumn("__u2",
        lit(2L) * col("__np") * col("__cumN") + col("__np") * col("__nn"))
    val sums =
      if (g.isEmpty) terms.agg(sum(col("__np")).as("n_pos"),
        sum(col("__nn")).as("n_neg"), sum(col("__u2")).as("__u2s"))
      else terms.groupBy(g: _*).agg(sum(col("__np")).as("n_pos"),
        sum(col("__nn")).as("n_neg"), sum(col("__u2")).as("__u2s"))
    def d(c: String) = col(c).cast("double")
    sums.select(g ++ Seq(col("n_pos"), col("n_neg"),
      when(col("n_pos") > 0 && col("n_neg") > 0,
        floor(d("__u2s") / lit(2.0) / (d("n_pos") * d("n_neg"))
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("auc")): _*)
  }

  /** DuckDB twin of [[auc]]: `rowsSql` must select `(label, score)`
    * plus the group columns. */
  def sqlAuc(rowsSql: String, groupCols: Seq[String] = Nil): String = {
    val g = groupCols.mkString(", ")
    val gSel = if (groupCols.isEmpty) "" else s"$g, "
    val gBy = if (groupCols.isEmpty) "" else s"GROUP BY $g"
    val part = if (groupCols.isEmpty) "" else s"PARTITION BY $g "
    s"""
    WITH byv AS (
      SELECT ${gSel}CAST(score AS DECIMAL(18,6)) AS v,
        CAST(count(CASE WHEN CAST(label AS INT) = 1 THEN 1 END)
          AS BIGINT) AS np,
        CAST(count(CASE WHEN CAST(label AS INT) = 0 THEN 1 END)
          AS BIGINT) AS nn
      FROM ($rowsSql)
      WHERE score IS NOT NULL AND label IS NOT NULL
      GROUP BY ${gSel}CAST(score AS DECIMAL(18,6))
    ), terms AS (
      SELECT ${gSel}np, nn,
        coalesce(sum(nn) OVER (${part}ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumn
      FROM byv
    ), sums AS (
      SELECT ${gSel}CAST(sum(np) AS BIGINT) AS n_pos,
        CAST(sum(nn) AS BIGINT) AS n_neg,
        CAST(sum(2 * np * cumn + np * nn) AS BIGINT) AS u2s
      FROM terms $gBy)
    SELECT ${gSel}n_pos, n_neg,
      CASE WHEN n_pos > 0 AND n_neg > 0 THEN
        floor(CAST(u2s AS DOUBLE) / 2.0e0
          / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE))
          * 1e6 + 0.5e0) / 1e6 END AS auc
    FROM sums"""
  }
}
