package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig}

/** One event of the running-stats machine. `cents` carries the value
  * pre-scaled to integer cents (the 2-decimal grid the data sits on),
  * so running sums are exact long adds — equal to the SQL twin's
  * `CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)` in any
  * engine, independent of accumulation order. */
case class RunningEvent(event_id: Long, user_id: Long, ts: Timestamp,
                        ts_us: Long, cents: Long)

/** State-store record: one user's running totals. */
case class RunningAgg(n: Long, cents: Long)

/** Emitted row: the user's totals AFTER this event. */
case class RunningStat(event_id: Long, user_id: Long, n_so_far: Long,
                       value_so_far: Double)

/** Per-user lifetime running totals via `transformWithState` — the
  * state-v2 `StatefulProcessor` API (Spark 4.x, RocksDB-backed): typed
  * state handles with per-state TTL, replacing the single opaque
  * `GroupState` blob of `(flat)MapGroupsWithState`. This operator is
  * the enrichment-side complement of [[StatefulSessions]]: instead of
  * closing sessions it annotates every event with its user's running
  * event count and value total — the "how much has this key consumed"
  * feature a training-data pipeline computes for budget caps and
  * per-source quotas.
  *
  * Determinism: arrival order within a micro-batch is shuffle order,
  * not event order, so the processor SORTS each batch's rows per key
  * by (ts_us, event_id) before folding. Rows of one key in one batch
  * fit memory by the same argument as `flatMapGroups` batching; across
  * batches the state store carries the totals, so the emitted rows are
  * identical however the input splits into triggers (asserted in
  * StatefulRunningSpec: one batch == many batches == batch twin).
  *
  * The fold is [[StatefulRunning.foldRunning]], shared verbatim by the
  * streaming processor and the batch twin ([[StatefulRunning.runningStatsBatch]]),
  * and the batch twin is oracle-backed in DuckDB (d8_running_totals:
  * row_number + decimal running sum over the same (ts, event_id)
  * order) — streaming == batch == oracle, by construction.
  */
object StatefulRunning {

  /** Pure fold: ts-ordered events + carried totals → emitted rows +
    * updated totals. */
  def foldRunning(events: Seq[RunningEvent], carried: RunningAgg)
      : (Seq[RunningStat], RunningAgg) = {
    var n = carried.n
    var cents = carried.cents
    val out = events.map { e =>
      n += 1
      cents += e.cents
      RunningStat(e.event_id, e.user_id, n, cents / 100.0)
    }
    (out, RunningAgg(n, cents))
  }

  /** The state-v2 processor: one `ValueState[RunningAgg]` per user. */
  class RunningProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, RunningEvent, RunningStat] {
    @transient private var agg: org.apache.spark.sql.streaming.ValueState[RunningAgg] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      agg = getHandle.getValueState[RunningAgg]("agg",
        Encoders.product[RunningAgg], ttl)

    override def handleInputRows(key: Long, rows: Iterator[RunningEvent],
                                 timerValues: TimerValues)
        : Iterator[RunningStat] = {
      val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
      val carried = Option(agg.get()).getOrElse(RunningAgg(0L, 0L))
      val (out, updated) = foldRunning(sorted, carried)
      agg.update(updated)
      out.iterator
    }
  }

  /** Projection shared by both engines. */
  def toRunningEvents(events: DataFrame): Dataset[RunningEvent] = {
    import events.sparkSession.implicits._
    events.select(
        col("event_id"), col("user_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[RunningEvent]
  }

  /** Streaming form: requires the RocksDB state store provider
    * (`spark.sql.streaming.stateStore.providerClass`); state v2 does
    * not run on the HDFS-backed default. */
  def runningStats(events: DataFrame, ttl: TTLConfig = TTLConfig.NONE)
      : DataFrame = {
    val ds = toRunningEvents(events)
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(new RunningProcessor(ttl),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  /** Batch twin: the same fold per key over globally ts-sorted rows. */
  def runningStatsBatch(events: DataFrame): DataFrame = {
    val ds = toRunningEvents(events)
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroups { (_: Long, rows: Iterator[RunningEvent]) =>
        val sorted = rows.toSeq.sortBy(e => (e.ts_us, e.event_id))
        foldRunning(sorted, RunningAgg(0L, 0L))._1.iterator
      }
      .toDF()
  }
}
