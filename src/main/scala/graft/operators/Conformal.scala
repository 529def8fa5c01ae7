package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SPLIT-CONFORMAL PREDICTION INTERVALS — distribution-free
  * uncertainty for point predictions (Vovk's conformal framework; the
  * split/inductive form of Papadopoulos et al. 2002, Lei et al. 2018):
  * fit any predictor on a TRAIN slice, take the
  * ⌈(n_cal+1)(1−α)⌉-th smallest absolute residual q̂ on a disjoint
  * CALIBRATION slice, and [ŷ − q̂, ŷ + q̂] covers a fresh y with
  * probability ≥ 1−α — no normality, no asymptotics. This is the
  * honesty layer the imputation stack needs: "acctbal ≈ 4500 ± 310 at
  * 90%" instead of a bare point fill.
  *
  * The predictor here is the per-group train mean (the same plug-in
  * the mean-imputer family uses); the conformal guarantee is
  * predictor-agnostic, so swapping in the KNN/RBM imputers changes ŷ
  * but not the machinery.
  *
  * Scale-and-determinism shape (the KM/Mann–Whitney recipe): the
  * order statistic q̂ does NOT rank rows — residuals live on the
  * 2-dp money grid, so the quantile collapses to a groupBy on the
  * bounded RESIDUAL-VALUE axis + one ordered running count; the rank
  * index ⌈(n+1)(1−α)⌉ is exact BIGINT arithmetic ((n+1)·(10−a₁₀)+9)
  * div 10 for α = a₁₀/10). ŷ is one exact decimal sum / count
  * division; coverage compares identically-computed doubles. One
  * output row per group: `(groupCols…, n_train, n_cal, n_test, yhat
  * (6dp), qhat (6dp), coverage (6dp))`. */
object Conformal {

  /** `roleCol` ∈ {'train','cal','test'}; `alpha10` = α·10 ∈ [1,9]
    * (integer tenths keep the rank index exact). */
  def meanInterval(df: DataFrame, roleCol: String, yCol: String,
                   groupCols: Seq[String], alpha10: Int = 1): DataFrame = {
    require(alpha10 >= 1 && alpha10 <= 9, s"alpha10 in [1,9]: $alpha10")
    require(groupCols.nonEmpty, "meanInterval needs at least one group col")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val y = col(yCol).cast("decimal(18,2)")
    val keep = lit(10 - alpha10) // (1-α)·10
    // null metrics take no part (the ecdf convention — a null residual
    // on the ordered axis would sort differently cross-engine)
    val df0 = df.filter(col(yCol).isNotNull)
    // per-group train mean: exact decimal sum, one double division
    val fit = df0.filter(col(roleCol) === "train")
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_train"),
        (sum(y).cast("double") / count(lit(1))).as("__yhat"))
    val withHat = df0.join(broadcast(fit), groupCols)
      .withColumn("__res", abs(y.cast("double") - col("__yhat")))
    // q̂: bounded-residual-axis fold — never a per-row rank window
    val calByVal = withHat.filter(col(roleCol) === "cal")
      .groupBy(g :+ col("__res"): _*)
      .agg(count(lit(1)).as("__n"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__res"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wAll = Window.partitionBy(g: _*)
    val qhat = calByVal
      .withColumn("__cum", sum(col("__n")).over(wCum))
      .withColumn("n_cal", sum(col("__n")).over(wAll))
      // idx = ⌈(n_cal+1)·(1−α)⌉ clamped to n_cal; `div` = integer
      // division (Spark's `/` on longs detours through double)
      .withColumn("__num", (col("n_cal") + lit(1L)) * keep + lit(9L))
      .withColumn("__idx", least(expr("__num div 10"), col("n_cal")))
      .filter(col("__cum") >= col("__idx"))
      .groupBy(g: _*)
      .agg(max(col("n_cal")).as("n_cal"), min(col("__res")).as("__qhat"))
    val test = withHat.filter(col(roleCol) === "test")
      .join(broadcast(qhat.select(g :+ col("__qhat"): _*)), groupCols)
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n_test"),
        (count(when(col("__res") <= col("__qhat"), lit(1))).cast("double")
          / count(lit(1))).as("__cov"))
    fit.join(qhat, groupCols).join(test, groupCols)
      .select(g ++ Seq(col("n_train"), col("n_cal"), col("n_test"),
        round(col("__yhat"), 6).as("yhat"),
        round(col("__qhat"), 6).as("qhat"),
        round(col("__cov"), 6).as("coverage")): _*)
  }

  /** DuckDB twin of [[meanInterval]]: `rowsSql` must select
    * `(grp…, role, y)` with `y` castable to DECIMAL(18,2). */
  def sqlMeanInterval(rowsSql: String, groupCols: Seq[String],
                      alpha10: Int = 1): String = {
    val gl = groupCols.mkString(", ")
    val keep = 10 - alpha10
    s"""
    WITH rows0 AS (
      SELECT $gl, role, CAST(y AS DECIMAL(18,2)) AS y FROM ($rowsSql)
      WHERE y IS NOT NULL
    ), fit AS (
      SELECT $gl, CAST(count(*) AS BIGINT) AS n_train,
        CAST(sum(y) AS DOUBLE) / count(*) AS yhat
      FROM rows0 WHERE role = 'train' GROUP BY $gl
    ), res AS (
      SELECT rows0.*, yhat,
        abs(CAST(y AS DOUBLE) - yhat) AS r
      FROM rows0 JOIN fit USING ($gl)
    ), calv AS (
      SELECT $gl, r, CAST(count(*) AS BIGINT) AS n
      FROM res WHERE role = 'cal' GROUP BY $gl, r
    ), folded AS (
      SELECT $gl, r,
        sum(n) OVER (PARTITION BY $gl ORDER BY r
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        sum(n) OVER (PARTITION BY $gl) AS n_cal
      FROM calv
    ), qh AS (
      SELECT $gl, CAST(max(n_cal) AS BIGINT) AS n_cal,
        min(r) AS qhat_raw
      FROM folded
      WHERE cum >= least(((n_cal + 1) * $keep + 9) // 10, n_cal)
      GROUP BY $gl
    ), tst AS (
      SELECT $gl, CAST(count(*) AS BIGINT) AS n_test,
        CAST(count(CASE WHEN r <= qhat_raw THEN 1 END) AS DOUBLE)
          / count(*) AS cov
      FROM res JOIN qh USING ($gl)
      WHERE role = 'test' GROUP BY $gl)
    SELECT $gl, n_train, n_cal, n_test,
      round(yhat, 6) AS yhat, round(qhat_raw, 6) AS qhat,
      round(cov, 6) AS coverage
    FROM fit JOIN qh USING ($gl) JOIN tst USING ($gl)"""
  }
}
