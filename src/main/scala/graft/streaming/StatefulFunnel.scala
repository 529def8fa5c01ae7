package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** One step-typed event of the funnel machine. `step_idx` is the
  * 0-based position of the event's type in the configured step list
  * (precomputed as a Column so only funnel-relevant events reach the
  * state store, and the scan filter pushes down). */
case class FunnelEvent(event_id: Long, user_id: Long, ts: Timestamp,
                       ts_us: Long, step_idx: Int)

/** State-store record: completion times (epoch micros) of the steps a
  * user has passed so far, in order — length = funnel frontier. */
case class FunnelProgress(times: Seq[Long])

/** Emitted when a user first completes a step: the funnel's live
  * output (1-based step_idx to match the batch report). */
case class StepCompletion(user_id: Long, step_idx: Long, ts_us: Long)

/** STREAMING FUNNEL (C10 companion): live ordered-conversion tracking
  * via `flatMapGroupsWithState` — each user's funnel frontier lives in
  * the state store, and a completion row is emitted the moment a user
  * first reaches a step. The per-user fold is a pure function shared
  * verbatim with the batch twin, and the batch twin's per-step counts
  * equal [[graft.operators.Funnel.funnel]]'s (the oracle-backed batch
  * report) — asserted in StatefulFunnelSpec, so the streaming path is
  * transitively pinned to the DuckDB oracle.
  *
  * Semantics = Funnel.funnel's first-touch strict ordering: step i
  * completes at the FIRST step-i event with ts strictly after step
  * i−1's completion (processing events in event-time order makes
  * "first seen past the frontier" and "min qualifying ts" the same
  * thing). Same cross-trigger contract as the other custom-state
  * operators: per-user event-time order within the watermark horizon.
  *
  * State is bounded by the attribution window: every funnel —
  * complete or not — evicts by event-time timeout `expiryMinutes`
  * after its last progress (a signup with no purchase for 30 days
  * stops occupying the store). Completed funnels stay as tombstones
  * until then so a returning user cannot re-emit completions the
  * batch twin never produces. Eviction emits nothing; completions
  * already streamed out as they happened.
  */
object StatefulFunnel {

  /** Pure funnel fold: walk ts-ordered events, advance the frontier on
    * qualifying steps. Returns completions emitted by this walk plus
    * the updated progress. */
  def foldEvents(userId: Long, events: Iterator[FunnelEvent],
                 carried: Seq[Long], nSteps: Int)
      : (Seq[StepCompletion], Seq[Long]) = {
    var times = carried.toVector
    val out = Seq.newBuilder[StepCompletion]
    events.foreach { e =>
      val frontier = times.length
      if (frontier < nSteps && e.step_idx == frontier &&
          (frontier == 0 || e.ts_us > times(frontier - 1))) {
        times = times :+ e.ts_us
        out += StepCompletion(userId, frontier + 1L, e.ts_us)
      }
    }
    (out.result(), times)
  }

  private def stepIdxExpr(typeCol: Column, steps: Seq[String]): Column =
    steps.zipWithIndex.foldLeft(lit(-1)) { case (acc, (s, i)) =>
      when(typeCol === s, lit(i)).otherwise(acc)
    }

  /** Step completions over `events` (needs event_id, user_id, ts,
    * event_type). Streaming input → `flatMapGroupsWithState` with
    * event-time timeout; batch input → `flatMapGroups` over the same
    * fold. Output: `(user_id, step_idx [1-based], step, completed_at)`.
    */
  def stepCompletions(events: DataFrame, steps: Seq[String],
                      watermark: String = "1 hour",
                      expiryMinutes: Int = 7 * 1440): DataFrame = {
    require(steps.nonEmpty && steps.distinct == steps,
      "funnel steps must be non-empty and distinct")
    val session = events.sparkSession
    import session.implicits._
    val n = steps.length
    val expiryUs = expiryMinutes * 60000000L
    val ds = events
      .where(col("event_type").isin(steps: _*))
      .select(col("event_id"), col("user_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"),
        stepIdxExpr(col("event_type"), steps).as("step_idx"))
      .as[FunnelEvent]
    val out =
      if (events.isStreaming)
        ds.withWatermark("ts", watermark)
          .groupByKey(_.user_id)
          .flatMapGroupsWithState(OutputMode.Append(),
            GroupStateTimeout.EventTimeTimeout()) {
            (uid: Long, it: Iterator[FunnelEvent],
             state: GroupState[FunnelProgress]) =>
              if (state.hasTimedOut) {
                // attribution window elapsed: evict silently —
                // completions were already emitted as they happened
                state.remove()
                Iterator.empty
              } else {
                val sorted = it.toIndexedSeq
                  .sortBy(e => (e.ts_us, e.event_id)).iterator
                val carried = state.getOption.map(_.times).getOrElse(Nil)
                val (completions, times) =
                  foldEvents(uid, sorted, carried, n)
                if (times.isEmpty) {
                  // zero progress — nothing worth a state-store slot
                  state.remove()
                } else {
                  // keep COMPLETED funnels too (tombstone): dropping
                  // them would let a returning user re-run the funnel
                  // and re-emit completions the batch twin never
                  // produces. The tombstone evicts at expiry like any
                  // other progress; +1ms rounds the micros boundary up
                  // (never-early timeout).
                  state.update(FunnelProgress(times))
                  state.setTimeoutTimestamp((times.last + expiryUs) / 1000 + 1)
                }
                completions.iterator
              }
          }
      else
        ds.groupByKey(_.user_id).flatMapGroups {
          (uid: Long, it: Iterator[FunnelEvent]) =>
            val sorted = it.toIndexedSeq
              .sortBy(e => (e.ts_us, e.event_id)).iterator
            foldEvents(uid, sorted, Nil, n)._1.iterator
        }
    val stepName = steps.zipWithIndex.foldLeft(lit(null).cast("string")) {
      case (acc, (s, i)) =>
        when(col("step_idx") === (i + 1L), lit(s)).otherwise(acc)
    }
    out.toDF()
      .withColumn("completed_at", timestamp_micros(col("ts_us")))
      .select(col("user_id"), col("step_idx"), stepName.as("step"),
        col("completed_at"))
  }
}
