package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LEAKAGE-SAFE LABEL CONSTRUCTION — the supervised-dataset step every
  * churn/conversion model starts with and most get subtly wrong: pick
  * a CUTOFF instant, build features ONLY from events ≤ cutoff, build
  * the label ONLY from the (cutoff, cutoff + horizon] window, and
  * keep the two from ever seeing the same row. A feature computed
  * "as of now" instead of "as of the cutoff" leaks the label into the
  * features and produces a model that aces backtests and dies in
  * production — the discipline is the operator.
  *
  * Output: one row per unit ACTIVE on or before the cutoff —
  * `(unitCol, n_events, value_sum (6dp), active_days, recency_days,
  * churned)` — feature columns from the observation window, `churned`
  * = 1 when the unit has NO event inside the label horizon. Units
  * first seen AFTER the cutoff are excluded (they have no features to
  * predict with, and including them as "churned" poisons the base
  * rate).
  *
  * Determinism/scale: two conditional aggregates over one scan keyed
  * on the unit (exact decimal sums, integer day arithmetic on
  * epoch-micros), no window, no join beyond the implicit agg. */
object Labels {

  /** @param cutoffTs   ISO timestamp literal, e.g. "2024-02-15 00:00:00"
    * @param horizonDays label window length after the cutoff */
  def churnLabels(events: DataFrame, unitCol: String, tsCol: String,
                  valueCol: String, cutoffTs: String,
                  horizonDays: Int): DataFrame = {
    require(horizonDays >= 1)
    val cut = to_timestamp(lit(cutoffTs))
    val horizonEnd = cut + expr(s"INTERVAL $horizonDays DAYS")
    val ts = col(tsCol)
    val obs = ts <= cut
    val inHorizon = ts > cut && ts <= horizonEnd
    events.groupBy(col(unitCol))
      .agg(
        count(when(obs, lit(1))).as("n_events"),
        round(sum(when(obs, col(valueCol).cast("decimal(18,2)")))
          .cast("double"), 6).as("value_sum"),
        countDistinct(when(obs, date_trunc("day", ts)))
          .as("active_days"),
        // floor-div on a non-negative micros gap ≡ SQL's `//`; the gap
        // (≤ months) is far inside double's exact-integer range
        floor((unix_micros(cut) - max(when(obs, unix_micros(ts))))
          .cast("double") / lit(86400000000.0)).cast("bigint")
          .as("recency_days"),
        max(when(inHorizon, lit(1)).otherwise(lit(0))).as("__seen"))
      .filter(col("n_events") >= 1)
      .withColumn("churned", (lit(1) - col("__seen")).cast("int"))
      .drop("__seen")
  }

  /** DuckDB twin of [[churnLabels]]: `table` must carry the same
    * unit/ts/value columns. */
  def sqlChurnLabels(table: String, unitCol: String, tsCol: String,
                     valueCol: String, cutoffTs: String,
                     horizonDays: Int): String = s"""
    SELECT $unitCol,
      CAST(count(CASE WHEN $tsCol <= TIMESTAMP '$cutoffTs' THEN 1 END)
        AS BIGINT) AS n_events,
      round(CAST(sum(CASE WHEN $tsCol <= TIMESTAMP '$cutoffTs'
        THEN CAST($valueCol AS DECIMAL(18,2)) END) AS DOUBLE), 6)
        AS value_sum,
      CAST(count(DISTINCT CASE WHEN $tsCol <= TIMESTAMP '$cutoffTs'
        THEN date_trunc('day', $tsCol) END) AS BIGINT) AS active_days,
      CAST((epoch_us(TIMESTAMP '$cutoffTs')
        - max(CASE WHEN $tsCol <= TIMESTAMP '$cutoffTs'
            THEN epoch_us($tsCol) END)) // 86400000000 AS BIGINT)
        AS recency_days,
      CAST(1 - max(CASE WHEN $tsCol > TIMESTAMP '$cutoffTs'
          AND $tsCol <= TIMESTAMP '$cutoffTs' + INTERVAL $horizonDays DAY
        THEN 1 ELSE 0 END) AS INT) AS churned
    FROM $table
    GROUP BY $unitCol
    HAVING count(CASE WHEN $tsCol <= TIMESTAMP '$cutoffTs' THEN 1 END)
      >= 1"""
}
