package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** FUNNEL ANALYSIS — ordered multi-step conversion over an event log:
  * how many users completed step 1, then step 2 AFTER step 1, … (the
  * product-analytics staple, and in a training-data pipeline the same
  * shape measures multi-stage document lifecycle: crawled → cleaned →
  * deduped → selected).
  *
  * Semantics: a user completes step i at time t_i = the EARLIEST event
  * of type steps(i) with ts strictly greater than t_{i−1} (first-touch
  * attribution, strict ordering). A user counts toward step i iff
  * t_1 … t_i all exist.
  *
  * Scale shape: ONE shuffle. Events are filtered to the step types
  * (predicate pushes to the scan), hashed once by user, and the
  * chained t_i are whole-partition window aggregates over that single
  * Exchange — k window stages reuse the same partitioning, so adding a
  * funnel step adds zero shuffles. The per-user collapse is a
  * groupBy(user) that Catalyst places on the window's existing
  * HashPartitioning (no new Exchange — plan-asserted in FunnelSpec),
  * and the final completion counts are one partial-aggregated
  * single-row reduce, exploded to a row per step. No collect, no
  * driver loop; 100 TB of events with 10^9 users flows through as one
  * hash partition pass.
  */
object Funnel {

  /** One row per funnel step: `step_idx` (1-based), `step` (the event
    * type), `n_users` completing that step in order. */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", tsCol: String = "ts",
             typeCol: String = "event_type"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val w = Window.partitionBy(col(userCol))
    val filtered = events
      .where(col(typeCol).isin(steps: _*))
      .select(col(userCol), col(tsCol), col(typeCol))
    // t_i columns chained: each references t_{i-1}, same window spec →
    // Catalyst stacks the Window operators over one Exchange
    val withTimes = steps.zipWithIndex.foldLeft(filtered) {
      case (df, (step, 0)) =>
        df.withColumn("__t_0",
          min(when(col(typeCol) === step, col(tsCol))).over(w))
      case (df, (step, i)) =>
        df.withColumn(s"__t_$i",
          min(when(col(typeCol) === step &&
            col(tsCol) > col(s"__t_${i - 1}"), col(tsCol))).over(w))
    }
    // collapse to one row per user: max over per-user-constant columns;
    // groupBy(user) sits on the window's HashPartitioning(user), so
    // Catalyst plans it WITHOUT a new Exchange (plan-asserted in spec)
    val firstAgg = max(col("__t_0")).as("__t_0")
    val restAggs = steps.indices.drop(1).map(i =>
      max(col(s"__t_$i")).as(s"__t_$i"))
    val perUser = withTimes.groupBy(col(userCol)).agg(firstAgg, restAggs: _*)
    val counts = steps.indices.map(i =>
      sum(when(col(s"__t_$i").isNotNull, 1L).otherwise(0L))
        .cast("long").as(s"__n_$i"))
    val one = perUser.agg(counts.head, counts.tail: _*)
    val rows = steps.zipWithIndex.map { case (step, i) =>
      struct(lit(i + 1L).as("step_idx"), lit(step).as("step"),
        coalesce(col(s"__n_$i"), lit(0L)).as("n_users"))
    }
    one.select(explode(array(rows: _*)).as("__s")).select(col("__s.*"))
  }
}
