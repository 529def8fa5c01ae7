package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RFM SEGMENTATION — the classic customer read (recency, frequency,
  * monetary) scored into quintiles and folded into named segments:
  * the lifecycle surface behind every retention program ("champions"
  * get the referral ask, "at-risk" the win-back offer, "hibernating"
  * nothing — mailing them is spend without return). The operator is
  * the full pipeline: per-unit facts → ensemble quintile cutoffs →
  * 1–5 scores (recency INVERTED — recent is good) → first-match
  * segment rules.
  *
  * Determinism/scale: one per-unit aggregate (exact decimal sums,
  * integer day arithmetic), ONE 1-row quintile aggregate (exact
  * type-7 percentiles, Spark `percentile` ≡ DuckDB `quantile_cont`,
  * 6-dp rounded — the [[graft.impute.Robust]] convention and its
  * documented exact-percentile buffer hazard; at corpus scale swap GK
  * sketches) broadcast back, then a codegen'd projection. Scores
  * count cutoffs strictly below the value, so ties resolve
  * identically in both engines.
  *
  * Output per unit: `(unitCol, recency_days, frequency, monetary,
  * r, f, m, segment)`. */
object Rfm {

  private val Quints = Seq(0.2, 0.4, 0.6, 0.8)

  /** Score 1–5: one point per cutoff strictly below the value. */
  private def scoreOf(v: Column, cuts: Seq[Column]): Column =
    cuts.foldLeft(lit(1)) { (acc, c) =>
      acc + when(v > c, 1).otherwise(0) }

  /** See object doc. `purchasePred` marks revenue rows for the
    * monetary sum (frequency counts ALL events). */
  def rfm(events: DataFrame, unitCol: String, tsCol: String,
          valueCol: String, purchasePred: Column): DataFrame = {
    val cutTs = events.agg(max(unix_micros(col(tsCol))).as("__cut"))
    val perUnit = events.crossJoin(broadcast(cutTs))
      .groupBy(col(unitCol))
      .agg(
        floor((max(col("__cut")) - max(unix_micros(col(tsCol))))
          .cast("double") / lit(86400000000.0)).cast("bigint")
          .as("recency_days"),
        count(lit(1)).as("frequency"),
        coalesce(sum(when(purchasePred,
            col(valueCol).cast("decimal(18,2)"))), lit(0))
          .cast("decimal(18,2)").as("monetary"))
    def cutsFor(c: String): Seq[Column] =
      Quints.map(q => round(expr(
        s"percentile(CAST($c AS DOUBLE), ${q}e0)"), 6))
    val cutCols = (cutsFor("recency_days") ++ cutsFor("frequency") ++
      cutsFor("monetary")).zipWithIndex
      .map { case (c, i) => c.as(s"__q$i") }
    val cuts = perUnit.agg(cutCols.head, cutCols.tail: _*)
    def qs(from: Int) = (0 until 4).map(i => col(s"__q${from + i}"))
    val scored = perUnit.crossJoin(broadcast(cuts))
      .withColumn("r", lit(6) -
        scoreOf(col("recency_days").cast("double"), qs(0)))
      .withColumn("f", scoreOf(col("frequency").cast("double"), qs(4)))
      .withColumn("m", scoreOf(col("monetary").cast("double"), qs(8)))
    scored.select(col(unitCol), col("recency_days"), col("frequency"),
      col("monetary").cast("double").as("monetary"),
      col("r"), col("f"), col("m"),
      when(col("r") >= 4 && col("f") >= 4 && col("m") >= 4, "champion")
        .when(col("f") >= 4, "loyal")
        .when(col("m") >= 4, "big_spender")
        .when(col("r") <= 2 && col("f") >= 3, "at_risk")
        .when(col("r") <= 2, "hibernating")
        .otherwise("casual").as("segment"))
  }

  /** DuckDB twin of [[rfm]]: `eventsSql` must select
    * `(unit, ts, value, is_purchase)` one row per event. */
  def sqlRfm(eventsSql: String, unitOut: String): String = {
    def score(v: String, from: Int): String =
      (0 until 4).map(i => s"CASE WHEN $v > q${from + i} THEN 1 ELSE 0 END")
        .mkString("(1 + ", " + ", ")")
    val r = s"(6 - ${score("CAST(recency_days AS DOUBLE)", 0)})"
    val f = score("CAST(frequency AS DOUBLE)", 4)
    val m = score("CAST(monetary AS DOUBLE)", 8)
    val quints = Seq("recency_days", "frequency", "monetary")
      .zipWithIndex.flatMap { case (c, ci) =>
        Quints.zipWithIndex.map { case (q, qi) =>
          s"round(quantile_cont(CAST($c AS DOUBLE), ${q}e0), 6) AS q${ci * 4 + qi}"
        }
      }.mkString(",\n        ")
    s"""
    WITH ev AS (SELECT unit, ts, value, is_purchase FROM ($eventsSql)),
    cut AS (SELECT max(epoch_us(ts)) AS c FROM ev),
    pu AS (
      SELECT unit,
        CAST((cut.c - max(epoch_us(ts))) // 86400000000 AS BIGINT)
          AS recency_days,
        CAST(count(*) AS BIGINT) AS frequency,
        CAST(coalesce(sum(CASE WHEN is_purchase
          THEN CAST(value AS DECIMAL(18,2)) END), 0)
          AS DECIMAL(18,2)) AS monetary
      FROM ev, cut GROUP BY unit, cut.c
    ), qt AS (
      SELECT $quints
      FROM pu)
    SELECT unit AS $unitOut, recency_days, frequency,
      CAST(monetary AS DOUBLE) AS monetary,
      $r AS r, $f AS f, $m AS m,
      CASE WHEN $r >= 4 AND $f >= 4 AND $m >= 4 THEN 'champion'
        WHEN $f >= 4 THEN 'loyal'
        WHEN $m >= 4 THEN 'big_spender'
        WHEN $r <= 2 AND $f >= 3 THEN 'at_risk'
        WHEN $r <= 2 THEN 'hibernating'
        ELSE 'casual' END AS segment
    FROM pu, qt"""
  }
}
