package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCORE CALIBRATION (reliability bins + ECE) — the evaluation step
  * for any score a curation pipeline thresholds on (quality scores,
  * toxicity screens, dedup confidences): a score of 0.8 should be
  * RIGHT 80% of the time, or every threshold chosen from it is
  * miscalibrated. Rows bin by score into `nBins` equal-width bins;
  * per bin the mean score is compared with the observed positive rate,
  * and the expected calibration error is the row-weighted mean gap:
  *
  *   ECE = Σ_b (n_b / N) · |acc_b − conf_b|
  *
  * Determinism: the bin id is integer arithmetic on the 6-dp score
  * grid; per-bin score sums go through DECIMAL(18,6) (exact,
  * order-insensitive); accuracies are integer ratios; the ECE folds
  * non-negative per-bin terms over the BOUNDED bin axis via an ordered
  * running-sum window (the window MAX of the running sum is the total).
  *
  * Scale: one hash agg on the bin id (map-side partials, ≤ nBins rows
  * after the shuffle), then windows over nBins rows. Output one row
  * per non-empty bin: `bin, n, conf (6dp), acc (6dp), gap (6dp),
  * ece (6dp, repeated — the corpus total)`. */
object Calibration {

  /** Reliability table + ECE for `scoreCol` ∈ [0,1] (6-dp grid) against
    * boolean-ish `labelCol` (1 = positive). */
  def reliability(df: DataFrame, scoreCol: String, labelCol: String,
                  nBins: Int = 10): DataFrame = {
    require(nBins >= 2)
    val score = col(scoreCol).cast("decimal(18,6)")
    val bin = least(floor(col(scoreCol).cast("double") * nBins),
      lit((nBins - 1).toDouble)).cast("long")
    val perBin = df
      .select(bin.as("bin"), score.as("__s"),
        col(labelCol).cast("int").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__s")).as("__ss"),
        sum(col("__y")).as("__sy"))
    val total = perBin.agg(sum(col("n")).as("__nt"))
    val wCum = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    perBin.crossJoin(broadcast(total))
      .withColumn("conf",
        round(col("__ss").cast("double") / col("n").cast("double"), 6))
      .withColumn("acc",
        round(col("__sy").cast("double") / col("n").cast("double"), 6))
      .withColumn("gap", round(abs(col("acc") - col("conf")), 6))
      // weight the UNROUNDED ratio gap? No: weight the 6-dp gap — both
      // engines then fold identical operands (the repo's grid rule)
      .withColumn("__term",
        col("n").cast("double") / col("__nt").cast("double") * col("gap"))
      .withColumn("ece", round(max(sum(col("__term")).over(wCum))
        .over(wAll), 6))
      .select("bin", "n", "conf", "acc", "gap", "ece")
  }

  /** DuckDB twin of [[reliability]] — identical binning, decimal sums,
    * grid rounds and ordered fold. `scoredSql` must select
    * `(score, label)`. */
  def sqlReliability(scoredSql: String, nBins: Int = 10): String = s"""
    WITH base AS (
      SELECT CAST(least(floor(CAST(score AS DOUBLE) * $nBins),
          ${nBins - 1}.0e0) AS BIGINT) AS bin,
        CAST(score AS DECIMAL(18,6)) AS s, CAST(label AS INT) AS y
      FROM ($scoredSql)
    ), perBin AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
        sum(s) AS ss, CAST(sum(y) AS BIGINT) AS sy
      FROM base GROUP BY 1
    ), t AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM perBin
    ), r AS (
      SELECT bin, n,
        round(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE), 6) AS conf,
        round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS acc,
        nt
      FROM perBin CROSS JOIN t
    ), g AS (
      SELECT bin, n, conf, acc, round(abs(acc - conf), 6) AS gap, nt
      FROM r
    ), f AS (
      SELECT bin, n, conf, acc, gap,
        sum(CAST(n AS DOUBLE) / CAST(nt AS DOUBLE) * gap)
          OVER (ORDER BY bin
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM g
    ), tot2 AS (SELECT max(cum) AS e FROM f)
    SELECT bin, n, conf, acc, gap, round(e, 6) AS ece
    FROM f CROSS JOIN tot2"""
}
