package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig}

/** One event entering the quota machine. */
case class QuotaEvent(event_id: Long, user_id: Long, ts: Timestamp,
                      ts_us: Long, event_type: String)

/** State-store record: the key's current hour bucket and its arrival
  * count so far. */
case class QuotaState(hour_us: Long, n: Long)

/** Emitted decision: every event annotated with its within-hour arrival
  * rank and whether the cap admitted it (1/0 int — oracle-friendly). */
case class QuotaDecision(event_id: Long, user_id: Long, ts: Timestamp,
                         event_type: String, n_in_hour: Long, admitted: Int)

/** PER-KEY RATE LIMITING — "at most N events per user per hour" (or
  * any epoch-aligned bucket width — hour and day both align with
  * date_trunc):
  * the ingestion-quota / spam-cap / crawler-throttle primitive every
  * event pipeline ends up needing. Each event is annotated (not
  * silently dropped — audit first, filter downstream) with its arrival
  * rank inside its user-hour and an admitted flag for the first
  * `capPerHour` arrivals.
  *
  * The decision is a pure fold ([[RateLimit.foldQuota]]) shared
  * verbatim by the streaming `StatefulProcessor` and the batch twin,
  * and the batch twin is a `row_number` window under the DuckDB oracle
  * (d29_rate_limit) — streaming == batch == oracle by construction,
  * the same triangle as [[StatefulRunning]].
  *
  * Scale shape: batch is one hash shuffle on (user, hour-bucket) with
  * bounded partitions (a user-hour holds at most one hour of one
  * user's events); streaming keeps ONE tiny `ValueState` per user
  * (hour bucket + count — two longs), evicted by TTL. Late events
  * (arriving after their hour's bucket was superseded) are counted
  * against the CURRENT state bucket only if they fall in it; events
  * from an already-passed bucket are re-opened deterministically by
  * the fold (the bucket value is derived from the event, not the
  * clock), so a replay produces identical decisions — but ordering
  * guarantees only hold within the watermark, as for every
  * event-time-stateful operator here.
  */
object RateLimit {

  val HourUs = 3600000000L
  val DayUs = 24L * HourUs

  /** Pure fold: (ts_us, event_id)-ordered events + carried state →
    * decisions + updated state. `bucketUs` is the quota window width
    * (epoch-aligned — matching date_trunc for hour/day). */
  def foldQuota(events: Seq[QuotaEvent], carried: QuotaState, cap: Int,
                bucketUs: Long = HourUs): (Seq[QuotaDecision], QuotaState) = {
    var hour = carried.hour_us
    var n = carried.n
    val out = events.map { e =>
      val bucket = e.ts_us - java.lang.Math.floorMod(e.ts_us, bucketUs)
      if (bucket != hour) { hour = bucket; n = 0L }
      n += 1
      QuotaDecision(e.event_id, e.user_id, e.ts, e.event_type, n,
        if (n <= cap) 1 else 0)
    }
    (out, QuotaState(hour, n))
  }

  /** Projection shared by both engines. */
  def toQuotaEvents(events: DataFrame): Dataset[QuotaEvent] = {
    import events.sparkSession.implicits._
    events.select(col("event_id"), col("user_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[QuotaEvent]
  }

  /** Batch twin: the window form Catalyst optimizes best — ONE hash
    * shuffle on (user, hour), per-partition sort, bounded frames. The
    * fold and this window provably agree (RateLimitSpec). */
  def capBatch(events: DataFrame, cap: Int,
               truncUnit: String = "hour"): DataFrame = {
    val w = Window
      .partitionBy(col("user_id"), col("hour_bucket"))
      .orderBy(col("ts"), col("event_id"))
    events
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
      .withColumn("hour_bucket", date_trunc(truncUnit, col("ts")))
      .withColumn("n_in_hour", row_number().over(w).cast("long"))
      .withColumn("admitted",
        (col("n_in_hour") <= cap).cast("int"))
      .drop("hour_bucket")
  }

  /** The state-v2 processor: one two-long `ValueState` per user. */
  class QuotaProcessor(cap: Int, bucketUs: Long = HourUs,
                       ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, QuotaEvent, QuotaDecision] {
    @transient private var state
        : org.apache.spark.sql.streaming.ValueState[QuotaState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[QuotaState]("quota",
        Encoders.product[QuotaState], ttl)

    override def handleInputRows(key: Long, rows: Iterator[QuotaEvent],
                                 timerValues: TimerValues)
        : Iterator[QuotaDecision] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val carried = Option(state.get()).getOrElse(QuotaState(Long.MinValue, 0L))
      val (out, updated) = foldQuota(sorted, carried, cap, bucketUs)
      state.update(updated)
      out.iterator
    }
  }

  /** Streaming form (requires the RocksDB state store provider, as all
    * state-v2 operators here do). */
  def capStream(events: DataFrame, cap: Int, bucketUs: Long = HourUs,
                ttl: TTLConfig = TTLConfig.NONE): DataFrame = {
    val ds = toQuotaEvents(events)
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(new QuotaProcessor(cap, bucketUs, ttl),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }
}
