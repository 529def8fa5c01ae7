package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DISTRIBUTION-DRIFT diagnostics between two snapshots of the same
  * metric — the monitoring twin of [[Experiment]]'s two-sample tests:
  * where KS/Mann–Whitney answer "are these samples from one
  * distribution" with a p-value, the POPULATION STABILITY INDEX
  * answers "how far has production drifted from the baseline" with a
  * magnitude that feeds retraining triggers (the industry folk
  * thresholds: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).
  *
  *   PSI = Σ_bins (p_curr − p_base) · ln(p_curr / p_base)
  *
  * Scale shape: one pass bins both snapshots onto a FIXED axis derived
  * from the BASELINE min–max (the deployed-model convention — the bin
  * edges are part of the monitoring contract, so current outliers
  * clamp into the edge bins rather than moving them), then the sum
  * over bins folds through an ORDERED window over the bounded bin axis
  * — never an unordered double agg, so the fold order is one fixed
  * IEEE sequence in both engines (the repo-wide determinism rule).
  * Laplace smoothing (+0.5 per bin) keeps empty bins off ln(0) — the
  * standard fix, documented rather than hidden. ln is the same
  * libm-1-ulp class as BM25's, unobservable under the 6-dp round.
  *
  * Per group: one output row `(groupCols…, n_base, n_curr, psi)`.
  * Bin count stays model-sized (10–100 in practice); the input scan
  * is a single groupBy(group, bin) — no shuffle wider than the
  * aggregation itself.
  */
object Drift {

  /** PSI of `valueCol` between the `baseLabel` and `currLabel` rows of
    * `snapshotCol`, per `groupCols`. `bins` fixed cells on the
    * baseline's per-group [min, max]; values outside clamp into the
    * edge cells. */
  def psi(df: DataFrame, snapshotCol: String, valueCol: String,
          baseLabel: String, currLabel: String, bins: Int = 10,
          groupCols: Seq[String] = Nil): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val sides = df.filter(col(snapshotCol).isin(baseLabel, currLabel)
      && col(valueCol).isNotNull)
    val v = col(valueCol).cast("double")
    // bin edges from the BASELINE snapshot only (fixed axis)
    val edges = sides.filter(col(snapshotCol) === baseLabel)
      .groupBy(g: _*)
      .agg(min(v).as("__mn"), max(v).as("__mx"))
    val joined =
      if (groupCols.isEmpty) sides.crossJoin(broadcast(edges))
      else sides.join(broadcast(edges), groupCols)
    val span = col("__mx") - col("__mn")
    val rawBin = floor((v - col("__mn")) / span * lit(bins.toDouble))
    val bin = when(span === 0, lit(0L))
      .otherwise(greatest(lit(0L),
        least(rawBin.cast("bigint"), lit(bins.toLong - 1L))))
    val byBin = joined
      .withColumn("__bin", bin)
      .groupBy(g :+ col("__bin"): _*)
      .agg(count(when(col(snapshotCol) === baseLabel, lit(1))).as("__cb"),
        count(when(col(snapshotCol) === currLabel, lit(1))).as("__cc"))
    // a bin empty on BOTH sides is SKIPPED entirely (it never appears
    // in byBin — the convention for unobserved cells; note its term
    // would NOT be zero when n_base ≠ n_curr, so "skip" is a semantic
    // choice, mirrored in the SQL twin and the streaming monitor);
    // totals still smooth over the configured `bins` count.
    val wTot = if (groupCols.isEmpty) Window.partitionBy()
    else Window.partitionBy(groupCols.map(col): _*)
    val wCum = wTot.orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    def d(c: Column) = c.cast("double")
    val smooth = lit(0.5 * bins)
    val terms = byBin
      .withColumn("n_base", sum(col("__cb")).over(wTot))
      .withColumn("n_curr", sum(col("__cc")).over(wTot))
      .withColumn("__pb", (d(col("__cb")) + lit(0.5))
        / (d(col("n_base")) + smooth))
      .withColumn("__pc", (d(col("__cc")) + lit(0.5))
        / (d(col("n_curr")) + smooth))
      .withColumn("__term",
        (col("__pc") - col("__pb")) * log(col("__pc") / col("__pb")))
      .withColumn("__cum", sum(col("__term")).over(wCum))
    terms.groupBy(g: _*)
      .agg(max(col("n_base")).as("n_base"),
        max(col("n_curr")).as("n_curr"),
        round(max_by(col("__cum"), col("__bin")), 6).as("psi"))
  }

  /** ln 2 as one shared literal — both engines divide by the SAME
    * bits rather than each computing their own libm log(2). */
  private val Ln2 = 0.6931471805599453

  /** JENSEN–SHANNON DIVERGENCE between two snapshots — the BOUNDED
    * drift index that completes the triad: [[psi]] is the industry
    * index but unbounded (a bin going 1% → 0.01% contributes more
    * than a 10-point mass shift), [[wasserstein1]] is in metric
    * units; JSD is symmetric, finite by construction (m = (p+q)/2 is
    * never 0 where either side has mass) and lands in [0, 1] when
    * expressed in bits — the right number to THRESHOLD uniformly
    * across metrics with wildly different scales:
    *
    *   JSD = ½·KL(p‖m) + ½·KL(q‖m),  m = (p+q)/2
    *
    * Identical axis contract to [[psi]] (baseline-derived fixed bin
    * edges, outliers clamp into edge cells, +0.5 Laplace smoothing,
    * both-empty bins skipped, ordered fold over the bounded bin
    * axis). Output per group: `(groupCols…, n_base, n_curr, js)` in
    * bits (6dp). */
  def jsDivergence(df: DataFrame, snapshotCol: String, valueCol: String,
                   baseLabel: String, currLabel: String, bins: Int = 10,
                   groupCols: Seq[String] = Nil): DataFrame = {
    require(bins >= 2, s"bins must be >= 2: $bins")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val sides = df.filter(col(snapshotCol).isin(baseLabel, currLabel)
      && col(valueCol).isNotNull)
    val v = col(valueCol).cast("double")
    val edges = sides.filter(col(snapshotCol) === baseLabel)
      .groupBy(g: _*)
      .agg(min(v).as("__mn"), max(v).as("__mx"))
    val joined =
      if (groupCols.isEmpty) sides.crossJoin(broadcast(edges))
      else sides.join(broadcast(edges), groupCols)
    val span = col("__mx") - col("__mn")
    val rawBin = floor((v - col("__mn")) / span * lit(bins.toDouble))
    val bin = when(span === 0, lit(0L))
      .otherwise(greatest(lit(0L),
        least(rawBin.cast("bigint"), lit(bins.toLong - 1L))))
    val byBin = joined
      .withColumn("__bin", bin)
      .groupBy(g :+ col("__bin"): _*)
      .agg(count(when(col(snapshotCol) === baseLabel, lit(1))).as("__cb"),
        count(when(col(snapshotCol) === currLabel, lit(1))).as("__cc"))
    val wTot = if (groupCols.isEmpty) Window.partitionBy()
    else Window.partitionBy(groupCols.map(col): _*)
    val wCum = wTot.orderBy(col("__bin"))
      .rowsBetween(Window.unboundedPreceding, 0)
    def d(c: Column) = c.cast("double")
    val smooth = lit(0.5 * bins)
    val mm = (col("__pb") + col("__pc")) * lit(0.5)
    val terms = byBin
      .withColumn("n_base", sum(col("__cb")).over(wTot))
      .withColumn("n_curr", sum(col("__cc")).over(wTot))
      .withColumn("__pb", (d(col("__cb")) + lit(0.5))
        / (d(col("n_base")) + smooth))
      .withColumn("__pc", (d(col("__cc")) + lit(0.5))
        / (d(col("n_curr")) + smooth))
      .withColumn("__term", lit(0.5) *
        (col("__pb") * log(col("__pb") / mm)
          + col("__pc") * log(col("__pc") / mm)))
      .withColumn("__cum", sum(col("__term")).over(wCum))
    terms.groupBy(g: _*)
      .agg(max(col("n_base")).as("n_base"),
        max(col("n_curr")).as("n_curr"),
        round(max_by(col("__cum"), col("__bin")) / lit(Ln2), 6).as("js"))
  }

  /** DuckDB twin of [[jsDivergence]] — identical binning, smoothing,
    * term arithmetic and ordered fold. `rowsSql` must select
    * `(grp…, snapshot, v)`. */
  def sqlJsDivergence(rowsSql: String, baseLabel: String,
                      currLabel: String, bins: Int = 10,
                      groupCols: Seq[String] = Nil): String = {
    import graft.functions.Noise.sqlDouble
    val g = if (groupCols.isEmpty) "" else groupCols.mkString(", ") + ", "
    val gBy = if (groupCols.isEmpty) "" else
      "GROUP BY " + groupCols.mkString(", ")
    val part = if (groupCols.isEmpty) "" else
      "PARTITION BY " + groupCols.mkString(", ")
    val joinOn = if (groupCols.isEmpty) "ON TRUE" else
      "USING (" + groupCols.mkString(", ") + ")"
    val b = bins
    val smooth = s"${0.5 * b}e0"
    val pb = s"((CAST(cb AS DOUBLE) + 0.5e0) / (CAST(n_base AS DOUBLE) + $smooth))"
    val pc = s"((CAST(cc AS DOUBLE) + 0.5e0) / (CAST(n_curr AS DOUBLE) + $smooth))"
    val mm = s"(($pb + $pc) * 0.5e0)"
    s"""
    WITH rows0 AS (
      SELECT $g snapshot, CAST(v AS DOUBLE) AS v FROM ($rowsSql)
      WHERE snapshot IN ('$baseLabel', '$currLabel') AND v IS NOT NULL
    ), edges AS (
      SELECT $g min(v) AS mn, max(v) AS mx
      FROM rows0 WHERE snapshot = '$baseLabel' $gBy
    ), binned AS (
      SELECT $g snapshot,
        CASE WHEN mx - mn = 0 THEN CAST(0 AS BIGINT)
          ELSE greatest(CAST(0 AS BIGINT),
            least(CAST(floor((v - mn) / (mx - mn) * ${b}.0e0) AS BIGINT),
              CAST(${b - 1} AS BIGINT))) END AS bin
      FROM rows0 JOIN edges $joinOn
    ), bybin AS (
      SELECT $g bin,
        CAST(count(CASE WHEN snapshot = '$baseLabel' THEN 1 END)
          AS BIGINT) AS cb,
        CAST(count(CASE WHEN snapshot = '$currLabel' THEN 1 END)
          AS BIGINT) AS cc
      FROM binned GROUP BY ${g}bin
    ), tot AS (
      SELECT $g bin, cb, cc,
        CAST(sum(cb) OVER ($part) AS BIGINT) AS n_base,
        CAST(sum(cc) OVER ($part) AS BIGINT) AS n_curr
      FROM bybin
    ), terms AS (
      SELECT $g bin, n_base, n_curr,
        0.5e0 * ($pb * ln($pb / $mm) + $pc * ln($pc / $mm)) AS term
      FROM tot
    ), cums AS (
      SELECT $g bin, n_base, n_curr,
        sum(term) OVER ($part ORDER BY bin
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM terms)
    SELECT $g max(n_base) AS n_base, max(n_curr) AS n_curr,
      round(max_by(cum, bin) / ${sqlDouble(Ln2)}, 6) AS js
    FROM cums $gBy"""
  }

  /** WASSERSTEIN-1 DISTANCE (earth mover's) between two snapshots —
    * the drift MAGNITUDE in the metric's own units, where [[psi]]
    * gives a unitless index and KS a sup-norm: W₁ = ∫|F_base − F_curr|
    * over the pooled value axis, i.e. "how far, in dollars, did the
    * distribution move". The right monitoring readout for a continuous
    * metric whose business meaning is its scale.
    *
    * Same scale-and-determinism shape as the KS/Mann–Whitney family:
    * the pooled axis is a groupBy on the VALUE (bounded for grid
    * data), the two ECDFs are inclusive ordered running sums, the
    * segment integral |ΔF|·(v_{next} − v) folds through one more
    * ordered running sum (never an unordered double agg), and the
    * result is the per-group fold's last row, rounded to 6 dp. Null
    * values are excluded (the ecdf convention). Output per group:
    * `(groupCols…, n_base, n_curr, w1)`. */
  def wasserstein1(df: DataFrame, snapshotCol: String, valueCol: String,
                   baseLabel: String, currLabel: String,
                   groupCols: Seq[String] = Nil): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val sides = df.filter(col(snapshotCol).isin(baseLabel, currLabel)
      && col(valueCol).isNotNull)
    val v = col(valueCol).cast("double")
    val byValue = sides
      .groupBy(g :+ v.as("__v"): _*)
      .agg(count(when(col(snapshotCol) === baseLabel, lit(1))).as("__cb"),
        count(when(col(snapshotCol) === currLabel, lit(1))).as("__cc"))
    val wTot = if (groupCols.isEmpty) Window.partitionBy()
    else Window.partitionBy(g: _*)
    val wOrd = wTot.orderBy(col("__v"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    def d(c: Column) = c.cast("double")
    val terms = byValue
      .withColumn("n_base", sum(col("__cb")).over(wTot))
      .withColumn("n_curr", sum(col("__cc")).over(wTot))
      .withColumn("__fb", d(sum(col("__cb")).over(wCum)) / d(col("n_base")))
      .withColumn("__fc", d(sum(col("__cc")).over(wCum)) / d(col("n_curr")))
      .withColumn("__gap", lead(col("__v"), 1).over(wOrd) - col("__v"))
      // the last axis point has no next value: its segment is empty
      .withColumn("__seg",
        when(col("__gap").isNull, lit(0.0))
          .otherwise(abs(col("__fb") - col("__fc")) * col("__gap")))
      .withColumn("__cum", sum(col("__seg")).over(wCum))
    terms.groupBy(g: _*)
      .agg(max(col("n_base")).as("n_base"),
        max(col("n_curr")).as("n_curr"),
        round(max_by(col("__cum"), col("__v")), 6).as("w1"))
  }

  /** DuckDB twin of [[wasserstein1]] — identical axis aggregation,
    * cumulative folds and segment arithmetic. `rowsSql` must select
    * `(grp…, snapshot, v)`. */
  def sqlWasserstein1(rowsSql: String, baseLabel: String,
                      currLabel: String,
                      groupCols: Seq[String] = Nil): String = {
    val g = if (groupCols.isEmpty) "" else groupCols.mkString(", ") + ", "
    val gBy = if (groupCols.isEmpty) "" else
      "GROUP BY " + groupCols.mkString(", ")
    val part = if (groupCols.isEmpty) "" else
      "PARTITION BY " + groupCols.mkString(", ")
    s"""
    WITH rows0 AS (
      SELECT $g snapshot, CAST(v AS DOUBLE) AS v FROM ($rowsSql)
      WHERE snapshot IN ('$baseLabel', '$currLabel') AND v IS NOT NULL
    ), byv AS (
      SELECT $g v,
        CAST(count(CASE WHEN snapshot = '$baseLabel' THEN 1 END)
          AS BIGINT) AS cb,
        CAST(count(CASE WHEN snapshot = '$currLabel' THEN 1 END)
          AS BIGINT) AS cc
      FROM rows0 GROUP BY $g v
    ), folded AS (
      SELECT $g v,
        CAST(sum(cb) OVER ($part) AS BIGINT) AS n_base,
        CAST(sum(cc) OVER ($part) AS BIGINT) AS n_curr,
        sum(cb) OVER ($part ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS kb,
        sum(cc) OVER ($part ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS kc,
        lead(v) OVER ($part ORDER BY v) AS nv
      FROM byv
    ), segs AS (
      SELECT $g v, n_base, n_curr,
        CASE WHEN nv IS NULL THEN 0.0e0
          ELSE abs(CAST(kb AS DOUBLE) / CAST(n_base AS DOUBLE)
                 - CAST(kc AS DOUBLE) / CAST(n_curr AS DOUBLE))
               * (nv - v) END AS seg
      FROM folded
    ), cums AS (
      SELECT $g v, n_base, n_curr,
        sum(seg) OVER ($part ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM segs)
    SELECT $g max(n_base) AS n_base, max(n_curr) AS n_curr,
      round(max_by(cum, v), 6) AS w1
    FROM cums $gBy"""
  }

  /** CUSUM CHANGEPOINT DETECTION — the sequential shift detector that
    * complements [[psi]] (magnitude between two snapshots) and the
    * EWMA/seasonal anomaly rows (point outliers): CUSUM accumulates
    * small persistent deviations from a target until they cross a
    * decision interval, catching the slow drift a per-point z-score
    * never flags (Page 1954):
    *
    *   S⁺_t = max(0, S⁺_{t−1} + x_t − μ − κ)   (upward shifts)
    *   S⁻_t = max(0, S⁻_{t−1} + μ − x_t − κ)   (downward shifts)
    *
    * The recursion is NOT a window function, but its closed form is:
    * S_t = P_t − min_{0≤j≤t} P_j over the prefix sums P of the
    * deviations — one ordered running sum + one ordered running min,
    * both over the bounded per-group SERIES axis (time buckets, not
    * corpus rows).
    *
    * Determinism: everything folds in INTEGER MICRO-UNITS — `x` is
    * exact decimal → ×10⁶ BIGINT, the per-group target mean is one
    * truncating integer division, κ and h are micro-unit longs — so
    * prefix sums are order-insensitive exact and both engines compare
    * identical integers at the alarm boundary. Output per (group, t):
    * `s_plus, s_minus` (micro→double, 6dp exact) and `alarm_up /
    * alarm_down` (0/1). Values are assumed non-negative (the money
    * grid); the truncating mean is documented, not hidden. */
  def cusum(series: DataFrame, tCol: String, valueCol: String,
            groupCols: Seq[String], allowanceMicro: Long,
            thresholdMicro: Long): DataFrame = {
    require(groupCols.nonEmpty, "cusum needs at least one group col")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val xm = (col(valueCol).cast("decimal(18,2)") * lit(1000000L))
      .cast("long")
    val wAll = Window.partitionBy(g: _*)
    val wOrd = Window.partitionBy(g: _*).orderBy(col(tCol))
      .rowsBetween(Window.unboundedPreceding, 0)
    // null buckets/values are excluded (the ecdf convention: the two
    // engines order nulls differently, and a null observation has no
    // place on a sequential axis)
    val withMu = series
      .filter(col(tCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("__xm", xm)
      .withColumn("__mu", expr("sum(__xm) over " +
        s"(partition by ${groupCols.mkString(", ")}) div " +
        s"count(__xm) over (partition by ${groupCols.mkString(", ")})"))
    val dUp = col("__xm") - col("__mu") - lit(allowanceMicro)
    val dDn = col("__mu") - col("__xm") - lit(allowanceMicro)
    val folded = withMu
      .withColumn("__pu", sum(dUp).over(wOrd))
      .withColumn("__pd", sum(dDn).over(wOrd))
      .withColumn("__su",
        col("__pu") - least(lit(0L), min(col("__pu")).over(wOrd)))
      .withColumn("__sd",
        col("__pd") - least(lit(0L), min(col("__pd")).over(wOrd)))
    folded.select(g ++ Seq(col(tCol),
      (col("__su").cast("double") / lit(1e6)).as("s_plus"),
      (col("__sd").cast("double") / lit(1e6)).as("s_minus"),
      (col("__su") > thresholdMicro).cast("bigint").as("alarm_up"),
      (col("__sd") > thresholdMicro).cast("bigint").as("alarm_down")): _*)
  }

  /** DuckDB twin of [[cusum]]: `seriesSql` must select `(grp…, t, x)`
    * with `x` castable to DECIMAL(18,2). */
  def sqlCusum(seriesSql: String, groupCols: Seq[String],
               allowanceMicro: Long, thresholdMicro: Long): String = {
    val gl = groupCols.mkString(", ")
    s"""
    WITH s0 AS (
      SELECT $gl, t,
        CAST(CAST(x AS DECIMAL(18,2)) * 1000000 AS BIGINT) AS xm
      FROM ($seriesSql)
      WHERE t IS NOT NULL AND x IS NOT NULL
    ), mu AS (
      SELECT $gl, t, xm,
        sum(xm) OVER (PARTITION BY $gl) //
          count(xm) OVER (PARTITION BY $gl) AS mu
      FROM s0
    ), pre AS (
      SELECT $gl, t,
        sum(xm - mu - $allowanceMicro) OVER (PARTITION BY $gl ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pu,
        sum(mu - xm - $allowanceMicro) OVER (PARTITION BY $gl ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd
      FROM mu
    ), st AS (
      SELECT $gl, t,
        CAST(pu - least(0, min(pu) OVER (PARTITION BY $gl ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT)
          AS su,
        CAST(pd - least(0, min(pd) OVER (PARTITION BY $gl ORDER BY t
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS BIGINT)
          AS sd
      FROM pre)
    SELECT $gl, t,
      CAST(su AS DOUBLE) / 1000000.0e0 AS s_plus,
      CAST(sd AS DOUBLE) / 1000000.0e0 AS s_minus,
      CAST(su > $thresholdMicro AS BIGINT) AS alarm_up,
      CAST(sd > $thresholdMicro AS BIGINT) AS alarm_down
    FROM st"""
  }

  /** DuckDB twin of [[psi]] — identical binning arithmetic, smoothing
    * and ordered fold (DuckDB's `ln`; its `log` is log10). `rowsSql`
    * must select `(grp…, snapshot, v)` with `v` castable to DOUBLE;
    * `groupCols` as in [[psi]]. */
  def sqlPsi(rowsSql: String, baseLabel: String, currLabel: String,
             bins: Int = 10, groupCols: Seq[String] = Nil): String = {
    val g = if (groupCols.isEmpty) "" else groupCols.mkString(", ") + ", "
    val gBy = if (groupCols.isEmpty) "" else
      "GROUP BY " + groupCols.mkString(", ")
    val part = if (groupCols.isEmpty) "" else
      "PARTITION BY " + groupCols.mkString(", ")
    val joinOn = if (groupCols.isEmpty) "ON TRUE" else
      "USING (" + groupCols.mkString(", ") + ")"
    val b = bins
    val smooth = s"${0.5 * b}e0"
    val pb = s"((CAST(cb AS DOUBLE) + 0.5e0) / (CAST(n_base AS DOUBLE) + $smooth))"
    val pc = s"((CAST(cc AS DOUBLE) + 0.5e0) / (CAST(n_curr AS DOUBLE) + $smooth))"
    s"""
    WITH rows0 AS (
      SELECT $g snapshot, CAST(v AS DOUBLE) AS v FROM ($rowsSql)
      WHERE snapshot IN ('$baseLabel', '$currLabel') AND v IS NOT NULL
    ), edges AS (
      SELECT $g min(v) AS mn, max(v) AS mx
      FROM rows0 WHERE snapshot = '$baseLabel' $gBy
    ), binned AS (
      SELECT $g snapshot,
        CASE WHEN mx - mn = 0 THEN CAST(0 AS BIGINT)
          ELSE greatest(CAST(0 AS BIGINT),
            least(CAST(floor((v - mn) / (mx - mn) * ${b}.0e0) AS BIGINT),
              CAST(${b - 1} AS BIGINT))) END AS bin
      FROM rows0 JOIN edges $joinOn
    ), bybin AS (
      SELECT $g bin,
        CAST(count(CASE WHEN snapshot = '$baseLabel' THEN 1 END)
          AS BIGINT) AS cb,
        CAST(count(CASE WHEN snapshot = '$currLabel' THEN 1 END)
          AS BIGINT) AS cc
      FROM binned GROUP BY ${g}bin
    ), tot AS (
      SELECT $g bin, cb, cc,
        CAST(sum(cb) OVER ($part) AS BIGINT) AS n_base,
        CAST(sum(cc) OVER ($part) AS BIGINT) AS n_curr
      FROM bybin
    ), terms AS (
      SELECT $g bin, n_base, n_curr,
        ($pc - $pb) * ln($pc / $pb) AS term
      FROM tot
    ), cums AS (
      SELECT $g bin, n_base, n_curr,
        sum(term) OVER ($part ORDER BY bin
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM terms)
    SELECT $g max(n_base) AS n_base, max(n_curr) AS n_curr,
      round(max_by(cum, bin), 6) AS psi
    FROM cums $gBy"""
  }
}
