package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TIME-DECAYED ENGAGEMENT FEATURES — the recency-weighted aggregates
  * feature stores ship next to plain counts: an event h half-lives
  * before the cutoff contributes 2^−h, so "decayed count" reads as
  * CURRENT engagement mass (a user with 50 events last year and one
  * yesterday scores like a newcomer, not a regular) and decayed value
  * as current monetary pull. The natural companions to
  * [[Labels.churnLabels]]' hard counts on the feature side of the
  * same cutoff — and like them, the cutoff discipline makes the
  * features leakage-safe by construction.
  *
  * Determinism: each row's weight 2^{−Δt/halflife} is ONE fixed IEEE
  * sequence from integer micros, quantized to the 1e-9 grid
  * (floor-portable) before aggregation — so per-unit sums are exact
  * BIGINTs, immune to summation order in both engines. Events after
  * the cutoff are excluded (not weighted — excluded; future mass is
  * leakage).
  *
  * Scale: one conditional hash aggregate over the scan. Output per
  * unit with ≥1 in-window event: `(unitCol, n_events,
  * decayed_count (6dp), decayed_value (6dp))`. */
object Decay {

  def decayedFeatures(events: DataFrame, unitCol: String, tsCol: String,
                      valueCol: String, cutoffTs: String,
                      halfLifeDays: Double): DataFrame = {
    require(halfLifeDays > 0)
    val cut = to_timestamp(lit(cutoffTs))
    val obs = col(tsCol) <= cut
    val dtDays = (unix_micros(cut) - unix_micros(col(tsCol)))
      .cast("double") / lit(86400000000.0)
    val w = pow(lit(2.0), -dtDays / lit(halfLifeDays))
    def micro(c: Column) =
      floor(c * lit(1e9) + lit(0.5)).cast("bigint")
    events.groupBy(col(unitCol))
      .agg(count(when(obs, lit(1))).as("n_events"),
        sum(when(obs, micro(w))).as("__dc"),
        sum(when(obs, micro(w * col(valueCol).cast("double"))))
          .as("__dv"))
      .filter(col("n_events") >= 1)
      .select(col(unitCol), col("n_events"),
        round(col("__dc").cast("double") / lit(1e9), 6)
          .as("decayed_count"),
        round(col("__dv").cast("double") / lit(1e9), 6)
          .as("decayed_value"))
  }

  /** DuckDB twin of [[decayedFeatures]]. */
  def sqlDecayedFeatures(table: String, unitCol: String, tsCol: String,
                         valueCol: String, cutoffTs: String,
                         halfLifeDays: Double): String = {
    import graft.functions.Noise.sqlDouble
    val dt = s"""(CAST(epoch_us(TIMESTAMP '$cutoffTs')
      - epoch_us($tsCol) AS DOUBLE) / 86400000000.0e0)"""
    val w = s"pow(2.0e0, -$dt / ${sqlDouble(halfLifeDays)})"
    def micro(x: String) =
      s"CAST(floor(($x) * 1e9 + 0.5e0) AS BIGINT)"
    val obs = s"$tsCol <= TIMESTAMP '$cutoffTs'"
    s"""
    SELECT $unitCol,
      CAST(count(CASE WHEN $obs THEN 1 END) AS BIGINT) AS n_events,
      round(CAST(sum(CASE WHEN $obs THEN ${micro(w)} END) AS DOUBLE)
        / 1e9, 6) AS decayed_count,
      round(CAST(sum(CASE WHEN $obs
        THEN ${micro(s"$w * CAST($valueCol AS DOUBLE)")} END) AS DOUBLE)
        / 1e9, 6) AS decayed_value
    FROM $table
    GROUP BY $unitCol
    HAVING count(CASE WHEN $obs THEN 1 END) >= 1"""
  }
}
