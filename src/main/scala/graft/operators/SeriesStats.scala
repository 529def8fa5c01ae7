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
}
