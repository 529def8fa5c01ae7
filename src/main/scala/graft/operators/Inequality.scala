package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CONCENTRATION / INEQUALITY (Gini) — the corpus-balance diagnostic:
  * how concentrated is revenue across users, tokens across documents,
  * traffic across domains? A training-data pipeline reads this before
  * sampling (a 0.9-Gini source list means a handful of domains ARE the
  * corpus) and an experimentation stack reads it to know whether a
  * mean is driven by whales.
  *
  *   G = 2·Σᵢ i·x₍ᵢ₎ / (n·Σx) − (n+1)/n,  x₍ᵢ₎ sorted ascending, x ≥ 0
  *
  * Determinism & scale (the Mann–Whitney/ECDF recipe): sorting
  * collapses to the bounded DECIMAL value axis — for axis value v with
  * count k and c values strictly below, the rank-weighted sum over the
  * tie block is v·(k·c + k(k+1)/2), an EXACT decimal×integer product —
  * so Σᵢ i·x₍ᵢ₎ and Σx are exact decimal aggregates
  * (order-insensitive; only the running count c needs an ordered
  * window, over the bounded axis). One double expression at the end,
  * 6-dp grid. Ties contribute identically under any intra-tie order,
  * so the statistic is well-defined and bit-portable.
  *
  * Output one row per group: `n, total (double), gini (6dp ∈ [0,1))`.
  * Requires non-negative values (the standard Gini domain). */
object Inequality {

  /** `exact = false` bounds the value axis ABSOLUTELY for continuous
    * metrics: values first quantize to `gridLevels` per-group min–max
    * grid representatives ([[graft.functions.AxisGrid]]), so the fold
    * touches ≤ gridLevels rows per group at ANY corpus size. The
    * quantized Gini drifts by at most one grid cell's worth of mass
    * re-ranked (RobustModeSpec pins ≤ 0.001 on this data); still
    * deterministic — representatives land on the 6-dp grid and sums
    * stay DECIMAL-exact. */
  def gini(df: DataFrame, valueCol: String,
           groupCols: Seq[String] = Nil, exact: Boolean = true,
           gridLevels: Int = 10000): DataFrame = {
    val v =
      if (exact) col(valueCol).cast("decimal(18,2)")
      else col("__rep").cast("decimal(18,6)")
    val base =
      if (exact) df
      else {
        val stats = df.filter(col(valueCol).isNotNull)
          .groupBy(groupCols.map(col): _*)
          .agg(min(col(valueCol).cast("double")).as("__mn"),
            max(col(valueCol).cast("double")).as("__mx"))
        val joined =
          if (groupCols.isEmpty) df.crossJoin(broadcast(stats))
          else df.join(broadcast(stats), groupCols)
        joined.withColumn("__rep",
          graft.functions.AxisGrid.rep(col(valueCol).cast("double"),
            col("__mn"), col("__mx"), gridLevels))
      }
    val axis = base.groupBy((groupCols.map(col) :+ v.as("__v")): _*)
      .agg(count(lit(1)).as("__k"))
    val wPrev = (if (groupCols.isEmpty) Window.orderBy(col("__v"))
                 else Window.partitionBy(groupCols.map(col): _*)
                   .orderBy(col("__v")))
      .rowsBetween(Window.unboundedPreceding, -1)
    val terms = axis
      .withColumn("__c", coalesce(sum(col("__k")).over(wPrev), lit(0L)))
      // `div`, not `/`: both engines' `/` on integers yields DOUBLE,
      // which would demote the decimal product; k(k+1) is even so the
      // integer division is exact
      .withColumn("__t1", col("__v") *
        (col("__k") * col("__c") + expr("__k * (__k + 1) div 2")))
      .withColumn("__t0", col("__v") * col("__k"))
    val sums = terms.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__k")).as("n"), sum(col("__t0")).as("__s0"),
        sum(col("__t1")).as("__s1"))
    val n = col("n").cast("double")
    sums.select((groupCols.map(col) :+ col("n") :+
      col("__s0").cast("double").as("total") :+
      when(col("__s0") > 0,
        round(lit(2.0) * col("__s1").cast("double")
          / (n * col("__s0").cast("double"))
          - (n + lit(1.0)) / n, 6))
        .otherwise(lit(0.0)).as("gini")): _*)
  }

  /** DuckDB twin of [[gini]] — identical axis fold and final double
    * sequence. `perRowSql` must select `(v [castable to
    * DECIMAL(18,2)]` + the group columns). */
  def sqlGini(perRowSql: String, groupCols: Seq[String] = Nil): String = {
    val g = groupCols.mkString(", ")
    val gSel = if (groupCols.isEmpty) "" else s"$g, "
    val gBy = if (groupCols.isEmpty) "" else s"GROUP BY $g"
    val part = if (groupCols.isEmpty) "" else s"PARTITION BY $g "
    val axisBy = if (groupCols.isEmpty) "GROUP BY v"
      else s"GROUP BY $g, v"
    s"""
    WITH rows0 AS ($perRowSql), axis AS (
      SELECT ${gSel}CAST(v AS DECIMAL(18,2)) AS v,
        CAST(count(*) AS BIGINT) AS k
      FROM rows0 $axisBy
    ), terms AS (
      SELECT ${gSel}v, k,
        coalesce(sum(k) OVER (${part}ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS c
      FROM axis
    ), sums AS (
      SELECT ${gSel}CAST(sum(k) AS BIGINT) AS n,
        sum(v * k) AS s0,
        sum(v * (k * c + k * (k + 1) // 2)) AS s1
      FROM terms $gBy
    )
    SELECT ${gSel}n, CAST(s0 AS DOUBLE) AS total,
      CASE WHEN s0 > 0 THEN
        round(2.0e0 * CAST(s1 AS DOUBLE)
            / (CAST(n AS DOUBLE) * CAST(s0 AS DOUBLE))
          - (CAST(n AS DOUBLE) + 1.0e0) / CAST(n AS DOUBLE), 6)
      ELSE 0.0e0 END AS gini
    FROM sums"""
  }
}
