package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SPEARMAN RANK CORRELATION — the monotone-association read the
  * Pearson matrix (D62) gets wrong on heavy tails and nonlinear
  * relationships: correlate the RANKS, so one whale row contributes
  * its rank (bounded) instead of its magnitude (unbounded), and any
  * monotone relationship scores |ρ| = 1 whether or not it is linear.
  * The robust sibling the correlation surface needs next to Pearson,
  * exactly as Theil–Sen sits next to OLS and Mann–Whitney next to
  * Welch.
  *
  * Exactness trick — ranks on the HALF-INTEGER grid: with ties
  * sharing their average rank, every average rank is a multiple of
  * ½, so DOUBLED ranks are exact BIGINTs: r2(v) = 2·cumBelow(v) +
  * cnt(v) + 1. All five moment sums are then exact DECIMAL sums of
  * integer products — summation-order-free in both engines — and ρ
  * is one closed-form IEEE sequence off them, 6-dp rounded. No
  * corpus-sized rank window: ranks attach per DISTINCT value.
  *
  * Scale shape (the ECDF/Gini value-axis contract): one groupBy per
  * column collapses to the distinct-value axis, an ordered running
  * sum folds over THAT axis (bounded for grid data — `xCol`/`yCol`
  * must sit on an exact DECIMAL/integer grid, enforced like
  * [[graft.impute.Robust.ecdf]]), and two equi-joins attach ranks
  * back to rows. For a continuous double axis, quantize first
  * ([[graft.functions.AxisGrid]]), the family's documented
  * `exact = false` move. */
object RankCorrelation {

  /** Doubled average ranks per distinct value: `(groupCols…, value,
    * r2)` with r2 = 2·(# strictly below) + count + 1. */
  private def ranks2(rows: DataFrame, valCol: String,
                     groupCols: Seq[String]): DataFrame = {
    val g = groupCols.map(col)
    val byVal = rows.groupBy(g :+ col(valCol): _*)
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(g: _*).orderBy(col(valCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byVal.withColumn("__r2",
      lit(2L) * sum(col("__c")).over(w) - col("__c") + lit(1L))
      .select(g ++ Seq(col(valCol), col("__r2")): _*)
  }

  /** Per-group Spearman ρ of `yCol` against `xCol` (null pairs
    * dropped; both columns must be on an exact grid). Output:
    * `(groupCols…, n, rho (6 dp))`; groups with n < 2 or a constant
    * column are dropped. */
  def spearman(df: DataFrame, xCol: String, yCol: String,
               groupCols: Seq[String] = Nil): DataFrame = {
    val g = groupCols.map(col)
    val rows = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(g ++ Seq(col(xCol), col(yCol)): _*)
    val rx = ranks2(rows, xCol, groupCols)
      .withColumnRenamed("__r2", "__rx")
    val ry = ranks2(rows, yCol, groupCols)
      .withColumnRenamed("__r2", "__ry")
    val ranked = rows
      .join(rx, groupCols :+ xCol)
      .join(ry, groupCols :+ yCol)
    // cast BEFORE multiplying: Long×Long overflows past n ≈ 1.5e9 rows
    def dec(c: Column) = c.cast("decimal(19,0)")
    val aggs = Seq(count(lit(1)).as("__n"),
      sum(dec(col("__rx"))).as("__sx"),
      sum(dec(col("__ry"))).as("__sy"),
      sum(dec(col("__rx")) * dec(col("__rx"))).as("__sxx"),
      sum(dec(col("__ry")) * dec(col("__ry"))).as("__syy"),
      sum(dec(col("__rx")) * dec(col("__ry"))).as("__sxy"))
    val sums =
      if (groupCols.isEmpty) ranked.agg(aggs.head, aggs.tail: _*)
      else ranked.groupBy(g: _*).agg(aggs.head, aggs.tail: _*)
    def d(c: String) = col(c).cast("double")
    val n = d("__n")
    val num = n * d("__sxy") - d("__sx") * d("__sy")
    val denX = n * d("__sxx") - d("__sx") * d("__sx")
    val denY = n * d("__syy") - d("__sy") * d("__sy")
    sums.filter(col("__n") >= 2 && denX > 0 && denY > 0)
      .select(g ++ Seq(col("__n").as("n"),
        round(num / sqrt(denX * denY), 6).as("rho")): _*)
  }

  /** DuckDB twin of [[spearman]]: `rowsSql` must select
    * `(groupCols…, x, y)` on an exact grid, nulls pre-filtered or
    * not (they are dropped identically). */
  def sqlSpearman(rowsSql: String, groupCols: Seq[String] = Nil):
      String = {
    val ks = groupCols.mkString(", ")
    val gsel = if (groupCols.isEmpty) "" else s"$ks,"
    val gby = if (groupCols.isEmpty) ""
      else s"GROUP BY $ks"
    val pb = if (groupCols.isEmpty) "" else s"PARTITION BY $ks"
    val joinX = (groupCols :+ "x").map(c => s"r0.$c = rx.$c")
      .mkString(" AND ")
    val joinY = (groupCols :+ "y").map(c => s"r0.$c = ry.$c")
      .mkString(" AND ")
    val rsel = (groupCols.map(c => s"r0.$c") ++
      Seq("rx.r2 AS rxv", "ry.r2 AS ryv")).mkString(", ")
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val n = d("n0")
    val num = s"($n * ${d("sxy")} - ${d("sx")} * ${d("sy")})"
    val denX = s"($n * ${d("sxx")} - ${d("sx")} * ${d("sx")})"
    val denY = s"($n * ${d("syy")} - ${d("sy")} * ${d("sy")})"
    s"""
    WITH r0 AS (
      SELECT * FROM ($rowsSql) WHERE x IS NOT NULL AND y IS NOT NULL
    ), rx AS (
      SELECT $gsel x,
        2 * sum(c) OVER ($pb ORDER BY x
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c + 1 AS r2
      FROM (SELECT $gsel x, CAST(count(*) AS BIGINT) AS c
            FROM r0 GROUP BY $gsel x)
    ), ry AS (
      SELECT $gsel y,
        2 * sum(c) OVER ($pb ORDER BY y
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c + 1 AS r2
      FROM (SELECT $gsel y, CAST(count(*) AS BIGINT) AS c
            FROM r0 GROUP BY $gsel y)
    ), ranked AS (
      SELECT $rsel
      FROM r0 JOIN rx ON $joinX JOIN ry ON $joinY
    ), sums AS (
      SELECT $gsel CAST(count(*) AS BIGINT) AS n0,
        sum(CAST(rxv AS DECIMAL(19,0))) AS sx,
        sum(CAST(ryv AS DECIMAL(19,0))) AS sy,
        sum(CAST(rxv AS DECIMAL(19,0)) * CAST(rxv AS DECIMAL(19,0)))
          AS sxx,
        sum(CAST(ryv AS DECIMAL(19,0)) * CAST(ryv AS DECIMAL(19,0)))
          AS syy,
        sum(CAST(rxv AS DECIMAL(19,0)) * CAST(ryv AS DECIMAL(19,0)))
          AS sxy
      FROM ranked $gby)
    SELECT $gsel n0 AS n, round($num / sqrt($denX * $denY), 6) AS rho
    FROM sums WHERE n0 >= 2 AND $denX > 0 AND $denY > 0"""
  }
}
