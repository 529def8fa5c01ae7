package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HOLT LINEAR-TREND FORECASTING — the series family's missing leg:
  * EWMA smooths (D85), the decomposition explains (D137), Theil–Sen
  * fits a global trend (D136), the anomaly ops look BACKWARD — this
  * one projects forward. Holt's method carries a level and a trend,
  *
  *   l_t = α·y_t + (1−α)(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  *   ŷ_{T+h} = l_T + h·b_T
  *
  * initialized at l₁ = y₁, b₁ = y₂ − y₁ (the textbook start).
  *
  * Two-tier shape (the [[graft.operators.Calibration.isotonic]] /
  * BPE decomposition): the CORPUS collapses to the bounded series
  * axis upstream (the caller's per-bucket aggregate); the recursion
  * is inherently sequential, runs driver-side over that bounded
  * series (`maxPoints` fails fast), and is mirrored BIT-FOR-BIT by a
  * DuckDB RECURSIVE CTE — both engines execute the identical IEEE
  * sequence in the identical order, so even this stateful op sits
  * under the exact oracle. A cluster buys nothing in a T-step
  * recursion; it buys the aggregation that produced the series.
  *
  * Output: per (group, h ∈ 1..horizon): `(groupCols…, h, level (6dp),
  * trend, forecast)` — level/trend are the fitted state at T. Groups
  * with < 2 points are dropped (no trend to initialize). */
object Forecast {

  def holt(series: DataFrame, groupCols: Seq[String], tCol: String,
           yCol: String, alpha: Double = 0.3, beta: Double = 0.1,
           horizon: Int = 7, maxPoints: Int = 1000000): DataFrame = {
    require(alpha > 0 && alpha < 1 && beta > 0 && beta < 1)
    require(horizon >= 1)
    val spark = series.sparkSession
    val g = groupCols.map(col)
    // ORDER IN THE ENGINE, not by stringified keys (a string sort on
    // integer t would misorder 10 before 2); groupBy below preserves
    // the collected order within each group
    val rows = series
      .select(g :+ col(tCol).as("__t") :+
        col(yCol).cast("double").as("__y"): _*)
      .orderBy(g :+ col("__t"): _*)
      .limit(maxPoints + 1).collect()
    require(rows.length <= maxPoints,
      s"series exceeds maxPoints=$maxPoints — aggregate the axis first")
    val byGroup = rows.groupBy(r =>
        groupCols.indices.map(r.get).toSeq)
      .view.mapValues(_.map(_.getDouble(groupCols.length + 1)).toSeq)
    val out = byGroup.toSeq.flatMap { case (key, ys) =>
      if (ys.length < 2) Nil
      else {
        var l = ys(0)
        var b = ys(1) - ys(0)
        var i = 1
        while (i < ys.length) {
          val lPrev = l
          l = alpha * ys(i) + (1.0 - alpha) * (l + b)
          b = beta * (l - lPrev) + (1.0 - beta) * b
          i += 1
        }
        (1 to horizon).map { h =>
          (key, h.toLong, math.floor(l * 1e6 + 0.5) / 1e6,
            math.floor(b * 1e6 + 0.5) / 1e6,
            math.floor((l + h * b) * 1e6 + 0.5) / 1e6)
        }
      }
    }
    // Re-attach the TYPED key values directly (no stringified-key
    // join: String.valueOf on a raw Row value and cast('string') in
    // the engine disagree on nulls and on types like Timestamp whose
    // JVM toString differs from Spark's cast -- groups would silently
    // vanish). The collected key values ARE the external types
    // createDataFrame expects, so the result key schema is the input
    // key schema verbatim.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val keySchema = series.select(g: _*).schema
    val outSchema = StructType(keySchema.fields ++ Seq(
      StructField("h", LongType, nullable = false),
      StructField("level", DoubleType, nullable = false),
      StructField("trend", DoubleType, nullable = false),
      StructField("forecast", DoubleType, nullable = false)))
    val outRows: java.util.List[Row] =
      scala.jdk.CollectionConverters.SeqHasAsJava(
        out.map { case (key, h, lv, tr, fc) =>
          // Seq[Any] is load-bearing: an unannotated Seq(h, lv, …)
          // numerically WIDENS the Long h to Double and the schema's
          // LongType field then holds a Double
          Row.fromSeq(key ++ Seq[Any](h, lv, tr, fc))
        }).asJava
    spark.createDataFrame(outRows, outSchema)
  }

  /** DuckDB twin of [[holt]]: `seriesSql` must select `(g, t, y)` —
    * one group column (the recursive twin keeps the key simple), y
    * castable to DOUBLE, t ordering the series. The CTE executes the
    * same recursion in the same order, so outputs are bit-exact. */
  def sqlHolt(seriesSql: String, groupOut: String, alpha: Double = 0.3,
              beta: Double = 0.1, horizon: Int = 7): String = {
    import graft.functions.Noise.sqlDouble
    val a = sqlDouble(alpha); val bq = sqlDouble(beta)
    s"""
    WITH RECURSIVE ser AS (
      SELECT g, CAST(y AS DOUBLE) AS y,
        CAST(row_number() OVER (PARTITION BY g ORDER BY t) AS BIGINT)
          AS i,
        CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS tn
      FROM ($seriesSql)
    ), rec AS (
      SELECT s1.g, CAST(2 AS BIGINT) AS i, s1.tn,
        $a * s2.y + (1e0 - $a) * (s1.y + (s2.y - s1.y)) AS l,
        $bq * (($a * s2.y + (1e0 - $a) * (s1.y + (s2.y - s1.y)))
          - s1.y) + (1e0 - $bq) * (s2.y - s1.y) AS b,
        s1.y AS lprev
      FROM ser s1 JOIN ser s2 ON s1.g = s2.g AND s1.i = 1 AND s2.i = 2
      UNION ALL
      SELECT r.g, r.i + 1, r.tn,
        $a * s.y + (1e0 - $a) * (r.l + r.b) AS l,
        $bq * (($a * s.y + (1e0 - $a) * (r.l + r.b)) - r.l)
          + (1e0 - $bq) * r.b AS b,
        r.l AS lprev
      FROM rec r JOIN ser s ON s.g = r.g AND s.i = r.i + 1
    ), fin AS (
      SELECT g, l, b FROM rec WHERE i = tn
    )
    SELECT g AS $groupOut, CAST(h.h AS BIGINT) AS h,
      floor(l * 1e6 + 0.5e0) / 1e6 AS level,
      floor(b * 1e6 + 0.5e0) / 1e6 AS trend,
      floor((l + h.h * b) * 1e6 + 0.5e0) / 1e6 AS forecast
    FROM fin, LATERAL unnest(range(1, $horizon + 1)) AS h(h)"""
  }
}
