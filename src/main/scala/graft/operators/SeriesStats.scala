package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AUTOCORRELATION (ACF) — the series-memory diagnostic that rounds
  * out the time-series family (EWMA smooths, the seasonal row flags
  * point anomalies, CUSUM catches persistent shifts; ACF answers "how
  * much does this metric remember its past", the number read before
  * choosing seasonal windows or trusting an i.i.d. assumption):
  *
  *   r_k = Σ_t (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²
  *
  * Determinism: deviations are exact integer micro-units (decimal ×10⁶
  * BIGINT, truncating-division mean), and their products fold as
  * DECIMAL(38,0) exact sums (micro-unit products overflow BIGINT;
  * DuckDB's twin uses HUGEINT — both are exact integers, and the one
  * final integer→double cast rounds to nearest identically). Lag
  * pairing is ONE equi-join on the per-group row number shifted by
  * each lag (no per-lag window re-scan); the row number orders by the
  * bucket time — bounded series axis, never corpus rows. Null buckets
  * and values are excluded (the ecdf convention). Output per (group,
  * lag): `(groupCols…, lag, n_pairs, acf (6dp))`. */
object SeriesStats {

  def acf(series: DataFrame, tCol: String, valueCol: String,
          groupCols: Seq[String], maxLag: Int): DataFrame = {
    require(groupCols.nonEmpty && maxLag >= 1)
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val xm = (col(valueCol).cast("decimal(18,2)") * lit(1000000L))
      .cast("long")
    val wAll = Window.partitionBy(g: _*)
    val wOrd = Window.partitionBy(g: _*).orderBy(col(tCol))
    val devs = series
      .filter(col(tCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("__xm", xm)
      .withColumn("__mu", expr("sum(__xm) over " +
        s"(partition by ${groupCols.mkString(", ")}) div " +
        s"count(__xm) over (partition by ${groupCols.mkString(", ")})"))
      .withColumn("__d", (col("__xm") - col("__mu")).cast("decimal(38,0)"))
      .withColumn("__rn", row_number().over(wOrd).cast("bigint"))
      .select(g ++ Seq(col("__d"), col("__rn")): _*)
    val den = devs.groupBy(g: _*)
      .agg(sum(col("__d") * col("__d")).as("__den"))
    val lagged = devs
      .withColumn("lag",
        explode(array((1 to maxLag).map(k => lit(k.toLong)): _*)))
      .withColumn("__rn2", col("__rn") + col("lag"))
    val right = devs.select(
      g ++ Seq(col("__d").as("__d2"), col("__rn").as("__rn2")): _*)
    lagged.join(right, groupCols :+ "__rn2")
      .groupBy(g :+ col("lag"): _*)
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("__d") * col("__d2")).as("__num"))
      .join(den, groupCols)
      .select(g ++ Seq(col("lag"), col("n_pairs"),
        when(col("__den") === 0, lit(0.0))
          .otherwise(round(col("__num").cast("double")
            / col("__den").cast("double"), 6)).as("acf")): _*)
  }

  /** χ²(h) upper 5% quantiles, h = 1..10 — literals so both engines
    * compare identical bits at the decision boundary. */
  private val Chi2Q95 = Seq(3.841, 5.991, 7.815, 9.488, 11.070,
    12.592, 14.067, 15.507, 16.919, 18.307)

  /** LJUNG–BOX PORTMANTEAU TEST — "is this series white noise": Q =
    * n(n+2)·Σ_{k≤h} r_k²/(n−k) against χ²(h); the formal reading of
    * [[acf]]'s lag profile (any one r_k can look small while the
    * profile jointly screams autocorrelation). Composed directly on
    * the acf output (n recovered as n_pairs + lag), with the sum over
    * the ≤h lag axis folded through an ordered window — the repo's
    * no-unordered-double-agg rule — and the 5% decision made against
    * a χ² literal. Output per group: `(groupCols…, h, q (6dp),
    * reject_05)`. */
  def ljungBox(series: DataFrame, tCol: String, valueCol: String,
               groupCols: Seq[String], maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= Chi2Q95.size,
      s"maxLag in [1, ${Chi2Q95.size}]: $maxLag")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val r = acf(series, tCol, valueCol, groupCols, maxLag)
    def d(c: Column) = c.cast("double")
    val n = d(col("n_pairs") + col("lag"))
    val term = n * (n + lit(2.0)) *
      col("acf") * col("acf") / d(col("n_pairs"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("lag"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val q = r.withColumn("__term", term)
      .withColumn("__cum", sum(col("__term")).over(wCum))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("h"), max_by(col("__cum"), col("lag")).as("__q"))
    val crit = Chi2Q95.zipWithIndex.foldLeft(lit(Double.NaN)) {
      case (acc, (v, i)) => when(col("h") === (i + 1), lit(v)).otherwise(acc)
    }
    q.select(g ++ Seq(col("h"), round(col("__q"), 6).as("q"),
      (col("__q") > crit).cast("bigint").as("reject_05")): _*)
  }

  /** DuckDB twin of [[ljungBox]] — composes [[sqlAcf]] with the same
    * fold and χ² literal. */
  def sqlLjungBox(seriesSql: String, groupCols: Seq[String],
                  maxLag: Int): String = {
    require(maxLag >= 1 && maxLag <= Chi2Q95.size)
    val gl = groupCols.mkString(", ")
    val n = "(CAST(n_pairs + lag AS DOUBLE))"
    val term = s"($n * ($n + 2.0e0) * acf * acf " +
      "/ CAST(n_pairs AS DOUBLE))"
    val crit = Chi2Q95.zipWithIndex
      .map { case (v, i) => s"WHEN h = ${i + 1} THEN ${v}e0" }
      .mkString("CASE ", " ", " ELSE 0.0e0 END")
    s"""
    WITH r AS (${sqlAcf(seriesSql, groupCols, maxLag)}),
    folded AS (
      SELECT $gl, lag,
        sum($term) OVER (PARTITION BY $gl ORDER BY lag
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM r
    ), qs AS (
      SELECT $gl, CAST(count(*) AS BIGINT) AS h,
        max_by(cum, lag) AS q
      FROM folded GROUP BY $gl)
    SELECT $gl, h, round(q, 6) AS q,
      CAST(q > $crit AS BIGINT) AS reject_05
    FROM qs"""
  }

  /** THEIL–SEN ROBUST TREND — the median of all pairwise slopes
    * (x_j − x_i)/(j − i) over the per-group series: the trend readout
    * that one corrupted bucket cannot move (OLS on the same series
    * has breakdown point 0; Theil–Sen tolerates ~29% wild points),
    * i.e. the robust companion to [[Drift.cusum]]'s "did it shift"
    * — this answers "how fast is it moving, ignoring the spikes".
    *
    * Determinism: values fold to exact micro-unit BIGINTs, the slope
    * of each pair is ONE integer→double division (identical bits in
    * both engines), and the median is the exact interpolated (type-7)
    * quantile — `percentile` ≡ DuckDB `quantile_cont`, the Robust
    * convention. Slopes are per BUCKET STEP (the row-number axis),
    * so callers interpret the unit as "per bucket" — time buckets
    * must be unique per group (they come from a groupBy).
    *
    * Scale: pairing is AXIS-BOUNDED QUADRATIC BY DESIGN — Theil–Sen
    * is O(n²) in the series length, and the axis is the bucketed
    * series (hours/days), never corpus rows: 1 year of hourly buckets
    * = 38M pairs per group, one hash-join task per group. Groups with
    * < 2 points have no pairs and are absent from the output. Output:
    * `(groupCols…, n, n_pairs, slope (6dp, per bucket step))`. */
  def theilSen(series: DataFrame, tCol: String, valueCol: String,
               groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty, "theilSen needs at least one group col")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val xm = (col(valueCol).cast("decimal(18,2)") * lit(1000000L))
      .cast("long")
    val wOrd = Window.partitionBy(g: _*).orderBy(col(tCol))
    val pts = series
      .filter(col(tCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("__xm", xm)
      .withColumn("__rn", row_number().over(wOrd).cast("bigint"))
      .select(g ++ Seq(col("__xm"), col("__rn")): _*)
    val rhs = pts.select(
      g ++ Seq(col("__xm").as("__xm2"), col("__rn").as("__rn2")): _*)
    pts.join(rhs, groupCols)
      .filter(col("__rn2") > col("__rn"))
      .withColumn("__slope", (col("__xm2") - col("__xm")).cast("double")
        / (col("__rn2") - col("__rn")).cast("double"))
      .groupBy(g: _*)
      .agg(max(col("__rn2")).as("n"),
        count(lit(1)).as("n_pairs"),
        round(expr("percentile(__slope, 0.5)") / lit(1e6), 6).as("slope"))
  }

  /** DuckDB twin of [[theilSen]]: `seriesSql` must select
    * `(grp…, t, x)` with `x` castable to DECIMAL(18,2). */
  def sqlTheilSen(seriesSql: String, groupCols: Seq[String]): String = {
    val gl = groupCols.mkString(", ")
    s"""
    WITH s0 AS (
      SELECT $gl, t,
        CAST(CAST(x AS DECIMAL(18,2)) * 1000000 AS BIGINT) AS xm
      FROM ($seriesSql)
      WHERE t IS NOT NULL AND x IS NOT NULL
    ), pts AS (
      SELECT $gl, xm,
        CAST(row_number() OVER (PARTITION BY $gl ORDER BY t)
          AS BIGINT) AS rn
      FROM s0
    ), pairs AS (
      SELECT $gl, b.rn AS rn2,
        CAST(b.xm - a.xm AS DOUBLE) / CAST(b.rn - a.rn AS DOUBLE) AS slope
      FROM pts a JOIN (SELECT $gl, xm, rn FROM pts) b USING ($gl)
      WHERE b.rn > a.rn)
    SELECT $gl, max(rn2) AS n, CAST(count(*) AS BIGINT) AS n_pairs,
      round(quantile_cont(slope, 0.5) / 1000000.0e0, 6) AS slope
    FROM pairs GROUP BY $gl"""
  }

  /** CLASSICAL SEASONAL DECOMPOSITION (additive, moving-average) —
    * x_t = trend + seasonal + residual: the decomposition read before
    * trusting [[Drift.cusum]] or the seasonal-anomaly row on a metric
    * with a daily/weekly rhythm (a raw CUSUM on strongly-seasonal
    * revenue alarms every morning; on the RESIDUAL it alarms on real
    * shifts).
    *
    *  - trend: centered moving average over one `period` (the 2×p MA
    *    for even periods — ½-weighted ends), defined only where the
    *    full window exists (null at the series edges, the classical
    *    convention);
    *  - seasonal: per-phase mean of the detrended interior, CENTERED
    *    so the seasonal component sums to ~0 over a cycle;
    *  - residual: x − trend − seasonal (null where trend is).
    *
    * Determinism: the MA numerator and the detrended values stay in
    * EXACT scaled integers (micro-units × 2·period — the ½-weighted
    * ends double cleanly), per-phase sums are exact BIGINT folds, and
    * the only doubles are final fixed-sequence divisions plus ONE
    * ordered fold over the p-row phase axis for the centering mean.
    * Scale: two ordered windows over the bounded per-group series
    * axis + a phase-axis groupBy (p rows per group) broadcast back —
    * never a corpus-sized window. Output per input point:
    * `(groupCols…, t, x, trend, seasonal, residual)` (6dp). */
  def seasonalDecompose(series: DataFrame, tCol: String, valueCol: String,
                        groupCols: Seq[String], period: Int): DataFrame = {
    require(groupCols.nonEmpty && period >= 2)
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val h = period / 2
    val even = period % 2 == 0
    val den = if (even) 2L * period else period.toLong
    val xm = (col(valueCol).cast("decimal(18,2)") * lit(1000000L))
      .cast("long")
    val wOrd = Window.partitionBy(g: _*).orderBy(col(tCol))
    val wMa = wOrd.rowsBetween(-h, h)
    val s = sum(col("__xm")).over(wMa)
    val tnumRaw =
      if (even) lit(2L) * s - lag(col("__xm"), h).over(wOrd) -
        lead(col("__xm"), h).over(wOrd)
      else s
    val base = series
      .filter(col(tCol).isNotNull && col(valueCol).isNotNull)
      .withColumn("__xm", xm)
      .withColumn("__rn", row_number().over(wOrd).cast("bigint"))
      .withColumn("__tnum",
        when(count(lit(1)).over(wMa) === lit(2 * h + 1), tnumRaw))
      .withColumn("__ph", ((col("__rn") - 1) % period).cast("bigint"))
    // per-phase means of the detrended interior, exact integer sums;
    // centering mean via ONE ordered fold over the p-row phase axis
    val wPhAll = Window.partitionBy(g: _*)
    val wPhCum = Window.partitionBy(g: _*).orderBy(col("__ph"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val seasonal = base.filter(col("__tnum").isNotNull)
      .withColumn("__det", lit(den) * col("__xm") - col("__tnum"))
      .groupBy(g :+ col("__ph"): _*)
      .agg(sum(col("__det")).as("__snum"), count(lit(1)).as("__scnt"))
      .withColumn("__sraw",
        col("__snum").cast("double") / col("__scnt").cast("double"))
      .withColumn("__cum", sum(col("__sraw")).over(wPhCum))
      .withColumn("__sc", col("__sraw")
        - max_by(col("__cum"), col("__ph")).over(wPhAll)
          / count(lit(1)).over(wPhAll).cast("double"))
      .select(g ++ Seq(col("__ph"), col("__sc")): _*)
    val dD = lit(den.toDouble); val micro = lit(1e6)
    val xD = col("__xm").cast("double") / micro
    val trendD = col("__tnum").cast("double") / dD / micro
    val seasD = col("__sc") / dD / micro
    base.join(broadcast(seasonal), groupCols :+ "__ph", "left_outer")
      .select(g ++ Seq(col(tCol), round(xD, 6).as("x"),
        round(trendD, 6).as("trend"),
        round(seasD, 6).as("seasonal"),
        round(xD - trendD - seasD, 6).as("residual")): _*)
  }

  /** DuckDB twin of [[seasonalDecompose]]: `seriesSql` must select
    * `(grp…, t, x)` with `x` castable to DECIMAL(18,2). */
  def sqlSeasonalDecompose(seriesSql: String, groupCols: Seq[String],
                           period: Int): String = {
    val gl = groupCols.mkString(", ")
    val h = period / 2
    val even = period % 2 == 0
    val den = if (even) 2L * period else period.toLong
    val tnum =
      if (even) s"(2 * sum(xm) OVER ma - lag(xm, $h) OVER o - lead(xm, $h) OVER o)"
      else s"(sum(xm) OVER ma)"
    s"""
    WITH s0 AS (
      SELECT $gl, t,
        CAST(CAST(x AS DECIMAL(18,2)) * 1000000 AS BIGINT) AS xm
      FROM ($seriesSql)
      WHERE t IS NOT NULL AND x IS NOT NULL
    ), base AS (
      SELECT $gl, t, xm,
        (CAST(row_number() OVER o AS BIGINT) - 1) % $period AS ph,
        CASE WHEN count(*) OVER ma = ${2 * h + 1} THEN $tnum END AS tnum
      FROM s0
      WINDOW o AS (PARTITION BY $gl ORDER BY t),
             ma AS (PARTITION BY $gl ORDER BY t
                    ROWS BETWEEN $h PRECEDING AND $h FOLLOWING)
    ), phagg AS (
      SELECT $gl, ph, sum($den * xm - tnum) AS snum,
        CAST(count(*) AS BIGINT) AS scnt
      FROM base WHERE tnum IS NOT NULL GROUP BY $gl, ph
    ), ph2 AS (
      SELECT $gl, ph,
        CAST(snum AS DOUBLE) / CAST(scnt AS DOUBLE) AS sraw,
        sum(CAST(snum AS DOUBLE) / CAST(scnt AS DOUBLE))
          OVER (PARTITION BY $gl ORDER BY ph
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM phagg
    ), phc AS (
      SELECT $gl, ph,
        sraw - max_by(cum, ph) OVER (PARTITION BY $gl)
             / CAST(count(*) OVER (PARTITION BY $gl) AS DOUBLE) AS sc
      FROM ph2)
    SELECT $gl, t,
      round(CAST(xm AS DOUBLE) / 1000000.0e0, 6) AS x,
      round(CAST(tnum AS DOUBLE) / ${den}.0e0 / 1000000.0e0, 6) AS trend,
      round(sc / ${den}.0e0 / 1000000.0e0, 6) AS seasonal,
      round(CAST(xm AS DOUBLE) / 1000000.0e0
        - CAST(tnum AS DOUBLE) / ${den}.0e0 / 1000000.0e0
        - sc / ${den}.0e0 / 1000000.0e0, 6) AS residual
    FROM base LEFT JOIN phc USING ($gl, ph)"""
  }

  /** DuckDB twin of [[acf]]: `seriesSql` must select `(grp…, t, x)`. */
  def sqlAcf(seriesSql: String, groupCols: Seq[String],
             maxLag: Int): String = {
    val gl = groupCols.mkString(", ")
    s"""
    WITH s0 AS (
      SELECT $gl, t,
        CAST(CAST(x AS DECIMAL(18,2)) * 1000000 AS BIGINT) AS xm
      FROM ($seriesSql)
      WHERE t IS NOT NULL AND x IS NOT NULL
    ), devs AS (
      SELECT $gl,
        CAST(xm - (sum(xm) OVER (PARTITION BY $gl) //
          count(xm) OVER (PARTITION BY $gl)) AS HUGEINT) AS d,
        CAST(row_number() OVER (PARTITION BY $gl ORDER BY t)
          AS BIGINT) AS rn
      FROM s0
    ), den AS (
      SELECT $gl, sum(d * d) AS den FROM devs GROUP BY $gl
    ), lagged AS (
      SELECT $gl, d, rn + k.lag AS rn2, CAST(k.lag AS BIGINT) AS lag
      FROM devs, LATERAL unnest(generate_series(1, $maxLag)) k(lag)
    ), nums AS (
      SELECT $gl, lag, CAST(count(*) AS BIGINT) AS n_pairs,
        sum(lagged.d * b.d2) AS num
      FROM lagged JOIN (SELECT $gl, d AS d2, rn AS rn2 FROM devs) b
        USING ($gl, rn2)
      GROUP BY $gl, lag)
    SELECT $gl, lag, n_pairs,
      CASE WHEN den = 0 THEN 0.0e0
        ELSE round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) END
        AS acf
    FROM nums JOIN den USING ($gl)"""
  }

  /** COUNT-METRIC HEALTH: overdispersion + zero inflation — the two
    * diagnoses that decide whether a count metric (events per user,
    * purchases per session) can be modeled as Poisson at all. The
    * dispersion index var/mean reads 1 under Poisson; ≫ 1 means a
    * negative-binomial world where Poisson-assuming CIs and anomaly
    * thresholds are fiction. The zero share (units with NO activity
    * of this type, relative to the full unit universe) reads the
    * zero-inflation that per-active-user means silently drop.
    *
    * Determinism/scale: one (unit, key) count agg, one key-axis agg
    * of exact integer moments, one broadcast unit-universe total.
    * Zeros enter the moments analytically (zero counts add nothing to
    * Σx/Σx² but do add to n — no unit × key cross join materializes).
    * Output per key: `(keyCol, n_units, n_active, zero_share (6dp),
    * mean (6dp), variance (6dp), dispersion (6dp))`. */
  def countHealth(events: DataFrame, unitCol: String,
                  keyCol: String): DataFrame = {
    val perUnit = events.groupBy(col(keyCol), col(unitCol))
      .agg(count(lit(1)).as("__c"))
    val universe = events.select(col(unitCol)).distinct()
      .agg(count(lit(1)).as("__u"))
    def d(c: Column) = c.cast("double")
    val byKey = perUnit.groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_active"),
        sum(col("__c")).cast("bigint").as("__s"),
        sum(col("__c") * col("__c")).cast("bigint").as("__q"))
      .crossJoin(broadcast(universe))
    val n = d(col("__u"))
    val mean = d(col("__s")) / n
    // zeros contribute to n only: Σx, Σx² are over active units
    val variance = (d(col("__q")) - d(col("__s")) * d(col("__s")) / n) /
      (n - lit(1.0))
    byKey.select(col(keyCol), col("__u").as("n_units"), col("n_active"),
      round(lit(1.0) - d(col("n_active")) / n, 6).as("zero_share"),
      round(mean, 6).as("mean"), round(variance, 6).as("variance"),
      round(variance / mean, 6).as("dispersion"))
  }

  /** DuckDB twin of [[countHealth]]: `eventsSql` must select
    * `(unit, key)` one row per event. */
  def sqlCountHealth(eventsSql: String, keyOut: String): String = {
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val n = d("u")
    val mean = s"(${d("s")} / $n)"
    val variance =
      s"((${d("q")} - ${d("s")} * ${d("s")} / $n) / ($n - 1.0e0))"
    s"""
    WITH pu AS (
      SELECT key, unit, CAST(count(*) AS BIGINT) AS c
      FROM ($eventsSql) GROUP BY key, unit
    ), uni AS (
      SELECT CAST(count(DISTINCT unit) AS BIGINT) AS u
      FROM ($eventsSql)
    ), bk AS (
      SELECT key, CAST(count(*) AS BIGINT) AS n_active,
        CAST(sum(c) AS BIGINT) AS s, CAST(sum(c * c) AS BIGINT) AS q
      FROM pu GROUP BY key)
    SELECT key AS $keyOut, u AS n_units, n_active,
      round(1e0 - ${d("n_active")} / $n, 6) AS zero_share,
      round($mean, 6) AS mean, round($variance, 6) AS variance,
      round($variance / $mean, 6) AS dispersion
    FROM bk, uni"""
  }
}
