package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** One event of the capped-session machine (projected from `events`).
  * `ts` carries the event time for the watermark; `ts_us` is the same
  * instant as integer microseconds — the fold compares microseconds so
  * gap cuts land exactly where a `unix_micros`-based SQL twin cuts them
  * (events ship with sub-millisecond timestamps; `Timestamp.getTime`
  * millis would disagree at the boundary). `cents` is the value column
  * pre-rounded to the 2-decimal grid and scaled to integer cents, so
  * session sums are exact long adds, order-insensitive, and equal to
  * the oracle's `CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE)`. */
case class SessionEvent(event_id: Long, user_id: Long, ts: Timestamp,
                        ts_us: Long, cents: Long)

/** State-store record: the currently-open session of one user
  * (timestamps as epoch micros, value as integer cents). */
case class OpenSession(start: Long, last: Long, n: Long, cents: Long)

/** Emitted session. `closed_by`: "cap" = the next within-gap event hit
  * the event-count cap; "gap" = the inactivity gap elapsed — whether
  * observed by a following event (batch and streaming), by event-time
  * timeout (streaming), or at end-of-data (batch tail flush: no more
  * events means the gap elapsed too). There is deliberately NO separate
  * "end" label: a streaming timeout cannot know whether a later event
  * exists, so an end/gap distinction would make the same input rows
  * label differently across trigger boundaries — with the unified
  * label, batch equivalence holds per session regardless of how events
  * split across triggers. */
case class CappedSession(user_id: Long, start_us: Long, end_us: Long,
                         n_events: Long, session_value: Double,
                         closed_by: String)

/** Custom-state sessionization via `flatMapGroupsWithState` (C9/C10 —
  * the `KeyValueGroupedDataset` custom-state API the north star names):
  * sessions close on an inactivity gap OR when they reach `maxEvents`.
  * The cap split is the part `session_window` cannot express — it needs
  * an event-by-event state machine, which is exactly what the state
  * store holds (one `OpenSession` per user, evicted by event-time
  * timeout at `last + gap`, so state is bounded by active users within
  * the watermark horizon — never unbounded).
  *
  * The session fold itself ([[StatefulSessions.foldEvents]]) is a pure
  * function shared verbatim by the streaming wrapper and the batch twin
  * (`flatMapGroups`), so batch equivalence — the correctness oracle for
  * the streaming path — holds by construction; the spec feeds both
  * engines the same rows and asserts identical output, and the batch
  * twin is additionally oracle-backed in DuckDB (`b12_capped_sessions`:
  * gap-split via lag/cumsum, cap-split via `(row_number-1) / maxEvents`
  * chunking inside each gap session).
  */
object StatefulSessions {

  /** Pure session fold: walks ts-ordered events with an optional open
    * session carried in, returns closed sessions + the still-open tail.
    * Gap is checked before cap, so a session that sits at the cap when
    * a beyond-gap event arrives is labeled "gap" deterministically —
    * matching the SQL twin, where chunks that end a gap session are
    * never labeled "cap". */
  def foldEvents(events: Iterator[SessionEvent], carried: Option[OpenSession],
                 gapUs: Long, maxEvents: Int):
      (Seq[CappedSession], Option[OpenSession]) = {
    var open = carried
    val closed = Seq.newBuilder[CappedSession]
    events.foreach { e =>
      open match {
        case Some(o) if e.ts_us - o.last > gapUs =>
          closed += emit(e.user_id, o, "gap")
          open = Some(OpenSession(e.ts_us, e.ts_us, 1L, e.cents))
        case Some(o) if o.n >= maxEvents =>
          closed += emit(e.user_id, o, "cap")
          open = Some(OpenSession(e.ts_us, e.ts_us, 1L, e.cents))
        case Some(o) =>
          open = Some(OpenSession(o.start, e.ts_us, o.n + 1, o.cents + e.cents))
        case None =>
          open = Some(OpenSession(e.ts_us, e.ts_us, 1L, e.cents))
      }
    }
    (closed.result(), open)
  }

  private[streaming] def emit(userId: Long, o: OpenSession,
                              by: String): CappedSession =
    CappedSession(userId, o.start, o.last, o.n, o.cents / 100.0, by)

  /** Capped sessions over `events` (needs event_id, user_id, ts, value).
    * Streaming input → `flatMapGroupsWithState` with event-time timeout;
    * batch input → `flatMapGroups` over the same fold (open tails are
    * flushed as "gap", the same label the streaming side emits on
    * timeout — see [[CappedSession]] for why the labels unify).
    * Events are ordered by (ts_us, event_id) inside each group, so
    * output is deterministic; streaming equivalence assumes per-user
    * event-time order across triggers within the watermark horizon (the
    * standard contract for custom-state operators). */
  def cappedSessions(events: DataFrame, gapMinutes: Int = 10,
                     maxEvents: Int = 20,
                     watermark: String = "1 hour"): DataFrame = {
    val session = events.sparkSession
    import session.implicits._
    val gapUs = gapMinutes * 60000000L
    val ds = events
      .select(col("event_id"), col("user_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"),
        (col("value").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .as[SessionEvent]
    val out =
      if (events.isStreaming)
        ds.withWatermark("ts", watermark)
          .groupByKey(_.user_id)
          .flatMapGroupsWithState(OutputMode.Append(),
            GroupStateTimeout.EventTimeTimeout()) {
            (uid: Long, it: Iterator[SessionEvent],
             state: GroupState[OpenSession]) =>
              if (state.hasTimedOut) {
                // timeout == the gap elapsed: same label a following
                // beyond-gap event would have produced
                val tail = state.getOption.map(emit(uid, _, "gap"))
                state.remove()
                tail.iterator
              } else {
                val sorted = it.toIndexedSeq
                  .sortBy(e => (e.ts_us, e.event_id)).iterator
                val (closed, open) =
                  foldEvents(sorted, state.getOption, gapUs, maxEvents)
                open match {
                  case Some(o) =>
                    state.update(o)
                    // timeout fires once the watermark passes the gap
                    // horizon; +1ms rounds the micros boundary up so the
                    // timeout is never early.
                    state.setTimeoutTimestamp((o.last + gapUs) / 1000 + 1)
                  case None => state.remove()
                }
                closed.iterator
              }
          }
      else
        ds.groupByKey(_.user_id).flatMapGroups {
          (uid: Long, it: Iterator[SessionEvent]) =>
            val sorted = it.toIndexedSeq
              .sortBy(e => (e.ts_us, e.event_id)).iterator
            val (closed, open) = foldEvents(sorted, None, gapUs, maxEvents)
            // tail flush: no further events, so the gap elapsed
            (closed ++ open.map(emit(uid, _, "gap"))).iterator
        }
    out.toDF()
      .withColumn("session_start", timestamp_micros(col("start_us")))
      .withColumn("session_end", timestamp_micros(col("end_us")))
      .select("user_id", "session_start", "session_end", "n_events",
        "session_value", "closed_by")
  }
}
