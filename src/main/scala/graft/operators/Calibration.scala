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

  /** ISOTONIC CALIBRATION (pool-adjacent-violators) — the FIX to what
    * [[reliability]] diagnoses: learn the non-decreasing step map
    * score-bin → calibrated probability that minimizes squared error,
    * the standard post-hoc calibrator (Zadrozny & Elkan 2002) for any
    * score a pipeline thresholds on.
    *
    * Scale/determinism split: ONE hash agg collapses the corpus to
    * `nBins` (bin, n, Σy) integer rows; PAV runs driver-side over that
    * bounded table with EXACT integer cross-multiplication pooling
    * decisions (sy_i·n_j vs sy_j·n_i — no float compare can flip a
    * pool), so the learned step function is bit-reproducible. The
    * calibrated value is one integer ratio per block, rounded 6-dp.
    * An iterative pooling fixpoint is not one SQL query → rows+spec
    * (CalibrationSpec pins hand PAV, monotonicity, mass preservation
    * and idempotence).
    *
    * Output one row per non-empty bin: `(bin, n, raw_acc (6dp),
    * calibrated (6dp))` — apply by binning a new score the same way
    * and joining on `bin`. */
  def isotonic(df: DataFrame, scoreCol: String, labelCol: String,
               nBins: Int = 100): DataFrame = {
    require(nBins >= 2)
    val spark = df.sparkSession
    import spark.implicits._
    val bin = least(floor(col(scoreCol).cast("double") * nBins),
      lit((nBins - 1).toDouble)).cast("long")
    val bins = df
      .select(bin.as("bin"), col(labelCol).cast("long").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__y")).as("sy"))
      .orderBy(col("bin"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cal = pav(bins.map { case (_, n, sy) => (n, sy) })
    spark.createDataset(bins.zip(cal).map { case ((b, n, sy), c) =>
      (b, n,
        math.floor(sy.toDouble / n.toDouble * 1e6 + 0.5) / 1e6,
        math.floor(c * 1e6 + 0.5) / 1e6)
    }.toIndexedSeq).toDF("bin", "n", "raw_acc", "calibrated")
  }

  /** Pool-adjacent-violators over ascending (n, Σy) blocks: returns
    * each input position's pooled mean. Pooling compares block means
    * by exact integer cross-multiplication. */
  def pav(blocks: Array[(Long, Long)]): Array[Double] = {
    // stack of (n, sy, span)
    val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    blocks.foreach { case (n, sy) =>
      var cur = (n, sy, 1)
      // violation: prev mean > cur mean  ⇔  prevSy·curN > curSy·prevN
      while (st.nonEmpty &&
          st.last._2 * cur._1 > cur._2 * st.last._1) {
        val p = st.remove(st.length - 1)
        cur = (p._1 + cur._1, p._2 + cur._2, p._3 + cur._3)
      }
      st += cur
    }
    st.iterator.flatMap { case (n, sy, span) =>
      Iterator.fill(span)(sy.toDouble / n.toDouble)
    }.toArray
  }

  /** BRIER SCORE with the MURPHY DECOMPOSITION — the single-number
    * twin of the reliability table, split into its three causes:
    *
    *   Brier ≈ REL − RES + UNC,
    *   REL = Σ n_k(p̄_k − ō_k)²/N   (miscalibration — fixable),
    *   RES = Σ n_k(ō_k − ō)²/N     (discrimination — the model's worth),
    *   UNC = ō(1 − ō)              (the task's inherent noise floor)
    *
    * so "the score is bad" decomposes into "badly calibrated" vs
    * "can't discriminate" vs "the task is just hard" — three different
    * fixes. The DIRECT Brier Σ(s − y)²/N is reported alongside (the
    * decomposition identity is exact only within-bin-constant scores;
    * the gap is the within-bin variance, worth seeing).
    *
    * Determinism/scale: one binned hash agg ([[reliability]]'s shape);
    * per-bin REL/RES contributions are quantized to the 1e-12 grid so
    * the bin sums are exact BIGINTs (order-free); the direct Brier is
    * exact decimal sums (Σs², Σsy, Σy — y² = y) with one division.
    * Output ONE row: `(n, brier, reliability, resolution,
    * uncertainty, brier_decomp)` (6 dp). */
  def brierDecomposition(df: DataFrame, scoreCol: String,
                         labelCol: String, nBins: Int = 10): DataFrame = {
    require(nBins >= 2)
    val s = col(scoreCol).cast("decimal(18,6)")
    val bin = least(floor(col(scoreCol).cast("double") * nBins),
      lit((nBins - 1).toDouble)).cast("long")
    val perBin = df
      .select(bin.as("bin"), s.as("__s"),
        col(labelCol).cast("int").as("__y"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("__s")).as("__ss"),
        sum(col("__s") * col("__s")).as("__ss2"),
        sum(col("__s") * col("__y")).as("__ssy"),
        sum(col("__y")).as("__sy"))
    // NOTE: totals must not collide case-insensitively with perBin's
    // names (Spark resolves case-insensitively — `__sy` ≡ `__SY`)
    val tot = perBin.agg(sum(col("n")).as("__tn"),
      sum(col("__sy")).as("__ty"), sum(col("__ss2")).as("__ts2"),
      sum(col("__ssy")).as("__tsy"))
    def d(c: Column) = c.cast("double")
    val conf = d(col("__ss")) / d(col("n"))
    val acc = d(col("__sy")) / d(col("n"))
    val oBar = d(col("__ty")) / d(col("__tn"))
    val relTerm = floor(d(col("n")) / d(col("__tn")) *
      (conf - acc) * (conf - acc) * lit(1e12) + lit(0.5)).cast("bigint")
    val resTerm = floor(d(col("n")) / d(col("__tn")) *
      (acc - oBar) * (acc - oBar) * lit(1e12) + lit(0.5)).cast("bigint")
    perBin.crossJoin(broadcast(tot))
      .select(col("__tn"), col("__ty"), col("__ts2"), col("__tsy"),
        relTerm.as("__rel"), resTerm.as("__res"))
      .groupBy(col("__tn"), col("__ty"), col("__ts2"), col("__tsy"))
      .agg(sum(col("__rel")).as("__relS"), sum(col("__res")).as("__resS"))
      .select(col("__tn").as("n"),
        round((d(col("__ts2")) - lit(2.0) * d(col("__tsy")) +
          d(col("__ty"))) / d(col("__tn")), 6).as("brier"),
        round(d(col("__relS")) / lit(1e12), 6).as("reliability"),
        round(d(col("__resS")) / lit(1e12), 6).as("resolution"),
        round((d(col("__ty")) / d(col("__tn"))) *
          (lit(1.0) - d(col("__ty")) / d(col("__tn"))), 6)
          .as("uncertainty"),
        round(d(col("__relS")) / lit(1e12) - d(col("__resS")) / lit(1e12)
          + (d(col("__ty")) / d(col("__tn"))) *
            (lit(1.0) - d(col("__ty")) / d(col("__tn"))), 6)
          .as("brier_decomp"))
  }

  /** DuckDB twin of [[brierDecomposition]]: `scoredSql` must select
    * `(score, label)` with score on the 6-dp grid. */
  def sqlBrierDecomposition(scoredSql: String, nBins: Int = 10):
      String = {
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val conf = s"(${d("ss")} / ${d("n")})"
    val acc = s"(${d("sy")} / ${d("n")})"
    val oBar = s"(${d("yt")} / ${d("nt")})"
    s"""
    WITH s0 AS (
      SELECT least(CAST(floor(CAST(score AS DOUBLE) * $nBins) AS BIGINT),
               ${nBins - 1}) AS bin,
        CAST(score AS DECIMAL(18,6)) AS s, CAST(label AS INT) AS y
      FROM ($scoredSql)
    ), pb AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n, sum(s) AS ss,
        sum(s * s) AS ss2, sum(s * y) AS ssy,
        CAST(sum(y) AS BIGINT) AS sy
      FROM s0 GROUP BY bin
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(sy) AS BIGINT) AS yt,
        sum(ss2) AS s2t, sum(ssy) AS syt
      FROM pb
    ), terms AS (
      SELECT nt, yt, s2t, syt,
        CAST(floor(${d("n")} / ${d("nt")} * ($conf - $acc)
          * ($conf - $acc) * 1e12 + 0.5e0) AS BIGINT) AS relb,
        CAST(floor(${d("n")} / ${d("nt")} * ($acc - $oBar)
          * ($acc - $oBar) * 1e12 + 0.5e0) AS BIGINT) AS resb
      FROM pb, tot
    ), agg AS (
      SELECT nt, yt, s2t, syt, CAST(sum(relb) AS BIGINT) AS rels,
        CAST(sum(resb) AS BIGINT) AS ress
      FROM terms GROUP BY nt, yt, s2t, syt)
    SELECT nt AS n,
      round((${d("s2t")} - 2.0e0 * ${d("syt")} + ${d("yt")})
        / ${d("nt")}, 6) AS brier,
      round(${d("rels")} / 1e12, 6) AS reliability,
      round(${d("ress")} / 1e12, 6) AS resolution,
      round($oBar * (1e0 - $oBar), 6) AS uncertainty,
      round(${d("rels")} / 1e12 - ${d("ress")} / 1e12
        + $oBar * (1e0 - $oBar), 6) AS brier_decomp
    FROM agg"""
  }
}
