package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TIME-SERIES RESAMPLE + FORWARD FILL — turn an irregular event log
  * into a dense per-key time grid (the feature-engineering staple:
  * model features want one row per user-hour, not one per event, and
  * "no events this hour" must be an explicit zero row with the last
  * known value carried forward).
  *
  * Semantics: per key, the grid spans that key's [min, max] bucket at
  * `step` granularity (truncated event time). Each grid row carries
  * `n_events` (0 on gap rows) and `v_ffill` — the bucket's exact
  * decimal value sum, forward-filled from the most recent non-empty
  * bucket. Leading rows before the first value stay null (nothing to
  * carry), which can't happen here since each key's grid starts at its
  * first event.
  *
  * Scale shape: the raw log collapses to per-(key, bucket) aggregates
  * FIRST (one hash agg, partial map-side — the only pass over the big
  * table), and everything after runs on the reduced frame: a per-key
  * min/max agg, a `sequence` explode to the dense grid (rows =
  * Σ per-key span/step — the output size, unavoidable), one equi-join
  * back, and a per-key ordered window for the fill. Grid explosion is
  * bounded per key; a key spanning years at minute granularity is the
  * caller's retention-policy problem, not a skew surprise.
  */
object GapFill {

  /** Dense `step` grid per key with event counts and a forward-filled
    * exact value sum. Output: `(key, bucket, n_events, v_ffill)`.
    * `truncUnit` must agree with `step` (e.g. "hour" + "interval 1
    * hour"). */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, truncUnit: String = "hour",
                    step: String = "interval 1 hour"): DataFrame = {
    val bucketed = df
      .groupBy(col(keyCol), date_trunc(truncUnit, col(tsCol)).as("bucket"))
      .agg(count(lit(1)).as("n_events"),
        sum(col(valueCol).cast("decimal(18,2)")).cast("double").as("__v"))
    val grid = bucketed
      .groupBy(col(keyCol))
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(col(keyCol),
        explode(expr(s"sequence(__lo, __hi, $step)")).as("bucket"))
    val w = Window.partitionBy(col(keyCol)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bucketed, Seq(keyCol, "bucket"), "left")
      .select(col(keyCol), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        last(col("__v"), ignoreNulls = true).over(w).as("v_ffill"))
  }
}
