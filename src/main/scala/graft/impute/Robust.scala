package graft.impute

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ROBUST (PERCENTILE-BASED) PREPROCESSING — the outlier-tolerant
  * companions to Scaling's min-max: winsorization clips a value column
  * at per-group percentile fences (corrupt magnitudes stop dominating
  * sums and fitted scales), robust scaling centers on the median and
  * divides by the IQR (one wild value cannot move the transform the
  * way it moves mean/min/max). Both are standard tabular-ML prep the
  * upstream's min-max path has no answer for when data is dirty —
  * which is the whole premise of a cleaning library.
  *
  * Determinism (SURVEY §5.3): fences/median/IQR are EXACT interpolated
  * (type-7) quantiles — identical in Spark (`percentile`) and DuckDB
  * (`quantile_cont`) — rounded to the 4-dp grid before use, so every
  * derived threshold and every scaled value is a double op on
  * identical operands in both engines.
  *
  * Scale shape: one grouped percentile aggregate over the value column
  * (the only pass over the big table), broadcast-joined back, then a
  * codegen'd projection. Same stats-attach pattern as
  * MeanImpute/Scaling — PlanQualitySpec asserts the broadcast.
  *
  * THE 100-TB HAZARD — exact `percentile` buffers EVERY value of a
  * group on one aggregation task (it is a sort-based agg over an
  * in-memory value buffer). At sf0.1 that is ~200k doubles per group;
  * at 100× it is tens of millions per group on a single buffer — the
  * one OOM-shaped construct in this family. Every operator here
  * therefore takes `exact: Boolean = true`: `false` swaps in
  * `approx_percentile` (Greenwald–Khanna sketch, O(accuracy) state
  * per group, mergeable map-side → constant memory at ANY group
  * size), the same trade ColumnProfile documents for exact-distinct
  * vs HLL. Exact stays the default because it is the oracle-exact
  * form; at corpus scale callers pass `exact = false` (fence deltas
  * pinned ≤1% by RobustModeSpec).
  */
object Robust {

  /** GK-sketch accuracy for the `exact = false` scale mode: inverse
    * relative-rank error (10000 ⇒ ±0.01% rank error). */
  val ApproxAccuracy: Int = 10000

  private def pct(valueCol: String, p: Double, exact: Boolean) =
    if (exact) expr(s"percentile($valueCol, $p)")
    else expr(s"approx_percentile($valueCol, $p, $ApproxAccuracy)")

  /** Clip `valueCol` into its per-group [loP, hiP] percentile fences.
    * Output: input columns + `<valueCol>_clipped`. */
  def winsorize(df: DataFrame, valueCol: String, groupCols: Seq[String],
                loP: Double = 0.05, hiP: Double = 0.95,
                exact: Boolean = true): DataFrame = {
    require(loP >= 0 && hiP <= 1 && loP < hiP)
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(round(pct(valueCol, loP, exact).cast("double"), 4).as("__lo"),
        round(pct(valueCol, hiP, exact).cast("double"), 4).as("__hi"))
    df.join(broadcast(stats), groupCols)
      .withColumn(s"${valueCol}_clipped",
        least(greatest(col(valueCol).cast("double"), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Median/IQR scaling: (x − p50) / (p75 − p25) per group, rounded to
    * the 6-dp grid. Degenerate groups (IQR = 0) scale to 0 rather than
    * NaN. Output: input columns + `<valueCol>_scaled`. */
  def robustScale(df: DataFrame, valueCol: String,
                  groupCols: Seq[String], exact: Boolean = true): DataFrame = {
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(round(pct(valueCol, 0.5, exact).cast("double"), 4).as("__med"),
        (round(pct(valueCol, 0.75, exact).cast("double"), 4) -
          round(pct(valueCol, 0.25, exact).cast("double"), 4)).as("__iqr"))
    df.join(broadcast(stats), groupCols)
      .withColumn(s"${valueCol}_scaled",
        when(col("__iqr") === 0, lit(0.0))
          .otherwise(round((col(valueCol).cast("double") - col("__med"))
            / col("__iqr"), 6)))
      .drop("__med", "__iqr")
  }

  /** ECDF RANK TRANSFORM — map each value to its empirical CDF within
    * its group: F(x) = #{v ≤ x}/n ∈ (0, 1]. The fully nonparametric
    * normalization (quantile-uniformization): heavy tails, outliers
    * and arbitrary monotone distortions all flatten to uniform, which
    * is what rank-based models and copula-style preprocessing want.
    *
    * Determinism & scale (the Mann–Whitney/KM recipe): the CDF
    * collapses to a groupBy on the (group, value) axis + one running
    * sum over the bounded VALUE axis per group — never a corpus-sized
    * rank window — and attaches back via a hash equi-join on (group,
    * value). Exact integer counts, one double division, 6-dp grid →
    * bit-exact oracle.
    *
    * The bounded-axis contract is ENFORCED, not prose: the axis/join
    * key is the value cast to DECIMAL(18,6) — exact for any value
    * already on a ≤6-dp grid (money, counts, rates), and a hard 6-dp
    * quantization for anything finer, so the axis can never exceed the
    * value range × 10⁶ and the equi-join key is never a raw float.
    * For a CONTINUOUS metric whose range × 10⁶ is still corpus-sized,
    * pass `exact = false`: the axis first quantizes to `gridLevels`
    * per-group min–max levels (one extra tiny stats agg + broadcast),
    * bounding it ABSOLUTELY — ECDF drift is ≤ the largest probability
    * mass inside one grid cell (RobustModeSpec pins ≤1% sup-norm on
    * this data; still deterministic and SQL-twinned, since min/max are
    * order-insensitive exact aggregates and the level arithmetic is a
    * fixed double sequence).
    *
    * NULL rows (null value or null group key) take no part in the
    * axis — they'd otherwise fold engine-dependently (Spark windows
    * sort nulls first, DuckDB last) — and come back with a null ecdf
    * via the left join-back, preserving the input row set.
    * Output: input columns + `<valueCol>_ecdf`. */
  def ecdf(df: DataFrame, valueCol: String, groupCols: Seq[String],
           exact: Boolean = true, gridLevels: Int = 10000): DataFrame = {
    require(groupCols.nonEmpty && gridLevels >= 2)
    import org.apache.spark.sql.expressions.Window
    val keyed =
      if (exact)
        df.withColumn("__vk", col(valueCol).cast("decimal(18,6)"))
      else {
        val stats = df.filter(col(valueCol).isNotNull)
          .groupBy(groupCols.map(col): _*)
          .agg(min(col(valueCol).cast("double")).as("__mn"),
            max(col(valueCol).cast("double")).as("__mx"))
        df.join(broadcast(stats), groupCols, "left_outer")
          .withColumn("__vk",
            graft.functions.AxisGrid.rep(col(valueCol).cast("double"),
              col("__mn"), col("__mx"), gridLevels))
          .drop("__mn", "__mx")
      }
    val axis = keyed.filter(col("__vk").isNotNull)
      .groupBy(groupCols.map(col) :+ col("__vk"): _*)
      .agg(count(lit(1)).as("__k"))
    val wCum = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__vk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = axis.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__k")).as("__n"))
    val cdf = axis
      .withColumn("__cum", sum(col("__k")).over(wCum))
      .join(broadcast(totals), groupCols)
      .withColumn(s"${valueCol}_ecdf",
        round(col("__cum").cast("double") / col("__n").cast("double"), 6))
      .select(groupCols.map(col) :+ col("__vk") :+
        col(s"${valueCol}_ecdf"): _*)
    keyed.join(cdf, groupCols :+ "__vk", "left_outer").drop("__vk")
  }

  /** DuckDB twin of [[ecdf]] (exact mode) — identical DECIMAL(18,6)
    * axis key, null exclusion and left join-back. Emits the full
    * projection `SELECT <outCols>, <valueCol>_ecdf`. */
  def sqlEcdf(table: String, valueCol: String, groupCols: Seq[String],
              outCols: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    s"""
    WITH keyed AS (
      SELECT *, CAST($valueCol AS DECIMAL(18,6)) AS vk FROM $table
    ), axis AS (
      SELECT $g, vk, CAST(count(*) AS BIGINT) AS k
      FROM keyed WHERE vk IS NOT NULL GROUP BY $g, vk
    ), tot AS (SELECT $g, CAST(sum(k) AS BIGINT) AS n FROM axis GROUP BY $g
    ), cdf AS (
      SELECT axis.vk, ${groupCols.map(c => s"axis.$c").mkString(", ")},
        round(CAST(sum(k) OVER (PARTITION BY ${groupCols.map(c => s"axis.$c").mkString(", ")}
            ORDER BY axis.vk
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          / CAST(n AS DOUBLE), 6) AS ${valueCol}_ecdf
      FROM axis JOIN tot USING ($g)
    )
    SELECT ${outCols.mkString(", ")}, ${valueCol}_ecdf
    FROM keyed LEFT JOIN cdf USING ($g, vk)"""
  }

  /** DuckDB twin of [[ecdf]] with `exact = false` — the grid-quantized
    * scale mode is STILL oracle-able (min/max are order-insensitive
    * exact aggregates; the level arithmetic is a fixed double
    * sequence mirroring [[graft.functions.AxisGrid.rep]]). */
  def sqlEcdfScale(table: String, valueCol: String, groupCols: Seq[String],
                   outCols: Seq[String], gridLevels: Int = 10000): String = {
    val g = groupCols.mkString(", ")
    val lv = s"$gridLevels.0e0"
    val v = s"CAST($valueCol AS DOUBLE)"
    s"""
    WITH stats AS (
      SELECT $g, min($v) AS mn, max($v) AS mx
      FROM $table WHERE $valueCol IS NOT NULL GROUP BY $g
    ), keyed AS (
      SELECT t.*, CASE WHEN mx - mn = 0 THEN mn
        ELSE round(mn + least(floor(($v - mn) / (mx - mn) * $lv),
          $lv - 1.0e0) * (mx - mn) / $lv, 6) END AS vk
      FROM $table t LEFT JOIN stats USING ($g)
    ), axis AS (
      SELECT $g, vk, CAST(count(*) AS BIGINT) AS k
      FROM keyed WHERE vk IS NOT NULL GROUP BY $g, vk
    ), tot AS (SELECT $g, CAST(sum(k) AS BIGINT) AS n FROM axis GROUP BY $g
    ), cdf AS (
      SELECT axis.vk, ${groupCols.map(c => s"axis.$c").mkString(", ")},
        round(CAST(sum(k) OVER (PARTITION BY ${groupCols.map(c => s"axis.$c").mkString(", ")}
            ORDER BY axis.vk
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
          / CAST(n AS DOUBLE), 6) AS ${valueCol}_ecdf
      FROM axis JOIN tot USING ($g)
    )
    SELECT ${outCols.mkString(", ")}, ${valueCol}_ecdf
    FROM keyed LEFT JOIN cdf USING ($g, vk)"""
  }

  /** MAD OUTLIER FLAGS — the robust twin of the z-score anomaly gate
    * (d9): median/MAD stand in for mean/stddev, so one wild burst
    * cannot inflate the spread estimate and mask ITSELF (the classic
    * failure of σ-based monitors on spiky data). robust_z =
    * 0.6745·(x − median) / MAD (the consistency constant making it
    * comparable to a σ z-score under normality); MAD = median of
    * |x − median| per group. Degenerate groups (MAD = 0) get z = 0.
    *
    * Two grouped percentile aggregates over the value column (the
    * second over per-row deviations — same stats-attach shape as
    * winsorize, twice), tiny stats frames broadcast back. Output:
    * input columns + `med`, `robust_z`, `flagged` (1 when
    * |robust_z| ≥ `cutoff`). */
  def madOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  cutoff: Double = 3.5, exact: Boolean = true): DataFrame = {
    require(groupCols.nonEmpty && cutoff > 0)
    val meds = df.groupBy(groupCols.map(col): _*)
      .agg(round(pct(valueCol, 0.5, exact).cast("double"), 4).as("med"))
    val withMed = df.join(broadcast(meds), groupCols)
      .withColumn("__dev", abs(col(valueCol).cast("double") - col("med")))
    val mads = withMed.groupBy(groupCols.map(col): _*)
      .agg(round(pct("__dev", 0.5, exact).cast("double"), 4).as("__mad"))
    withMed.join(broadcast(mads), groupCols)
      // 6-dp via the FLOOR-PORTABLE round (×1e6, +0.5, floor, ÷1e6 —
      // pure exactly-rounded IEEE ops, bit-identical in both engines),
      // NOT round(x, 6): Spark's round goes through the double's
      // SHORTEST decimal repr (BigDecimal.valueOf) and half-ups exact
      // decimal ties, while DuckDB rounds the binary value — and this
      // statistic lands on exact ties STRUCTURALLY (0.6745·k.5/4.0 at
      // seasonal medians; 72 tie rows at sf0.1, 5 of them divergent)
      .withColumn("robust_z",
        when(col("__mad") === 0, lit(0.0))
          .otherwise(floor(lit(0.6745) *
            (col(valueCol).cast("double") - col("med")) / col("__mad")
            * lit(1e6) + lit(0.5)) / lit(1e6)))
      .withColumn("flagged",
        (abs(col("robust_z")) >= cutoff).cast("bigint"))
      .drop("__dev", "__mad")
  }
}
