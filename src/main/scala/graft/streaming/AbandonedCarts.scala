package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode,
  StatefulProcessor, TimeMode, TimerValues}

/** One event entering the cart machine. */
case class CartEvent(event_id: Long, user_id: Long, ts: Timestamp,
                     ts_us: Long, event_type: String)

/** A click the user never followed with a purchase inside the window. */
case class CartAlert(user_id: Long, click_id: Long, click_ts: Timestamp)

/** Pending state: one unresolved click. */
case class PendingClick(click_id: Long, ts_us: Long, ts: Timestamp)

/** ABANDONED-CART DETECTION — the canonical EVENT-TIME TIMER pattern
  * (CEP "A not followed by B within T"): alert on every click with no
  * purchase by the same user inside `[click.ts, click.ts + window]`.
  * Unlike every other stateful operator here, the OUTPUT is triggered
  * by the ABSENCE of an event — nothing arrives to prompt emission, so
  * the processor must register an event-time TIMER per pending click
  * and emit when the watermark passes the deadline with the click
  * still unresolved. This is the state-v2 timer API
  * (`registerTimer` / `handleExpiredTimer`) exercised for real.
  *
  * Semantics (shared with the batch twin, which is a user-keyed ANTI
  * interval join under the exact DuckDB oracle, d38_abandoned_carts):
  * a purchase at `p` resolves exactly the clicks with
  * `c.ts ≤ p.ts ≤ c.ts + window` (boundary inclusive both sides).
  * Within a micro-batch rows fold in (ts, event_id) order, so a
  * purchase resolves same-batch earlier clicks; correctness across
  * batches holds for data inside the watermark, as for every
  * event-time operator here. Emission trails the watermark by design
  * (an alert can only be safe once no resolving purchase can arrive).
  *
  * Scale shape: state is O(unresolved clicks per user within one
  * window) — bounded by per-user click rate × window, evicted by its
  * own timers; each timer is one state-store entry. The batch twin is
  * one user-keyed SMJ anti join with the range condition as the join
  * residual — no cartesian, no window function.
  */
object AbandonedCarts {

  val DefaultWindowUs: Long = 30L * 60 * 1000000

  /** Batch twin: clicks with no resolving purchase. Output:
    * `(user_id, click_id, click_ts)`. */
  def abandonedBatch(events: DataFrame,
                     windowUs: Long = DefaultWindowUs): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
        col("ts").as("click_ts"), unix_micros(col("ts")).as("__c_us"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("__pu"), unix_micros(col("ts")).as("__p_us"))
    clicks.join(purchases,
        col("user_id") === col("__pu") &&
          col("__p_us") >= col("__c_us") &&
          col("__p_us") <= col("__c_us") + lit(windowUs),
        "left_anti")
      .select("user_id", "click_id", "click_ts")
  }

  /** Projection shared by both engines. */
  def toCartEvents(events: DataFrame): Dataset[CartEvent] = {
    import events.sparkSession.implicits._
    events.select(col("event_id"), col("user_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      .as[CartEvent]
  }

  /** The timer processor: ListState of pending clicks + one event-time
    * timer per click deadline. */
  class CartProcessor(windowUs: Long)
      extends StatefulProcessor[Long, CartEvent, CartAlert] {
    @transient private var pending
        : org.apache.spark.sql.streaming.ListState[PendingClick] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      pending = getHandle.getListState[PendingClick]("pending",
        Encoders.product[PendingClick],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    private def deadlineMs(clickUs: Long): Long =
      (clickUs + windowUs) / 1000 + 1 // strictly after the inclusive bound

    override def handleInputRows(key: Long, rows: Iterator[CartEvent],
                                 timerValues: TimerValues)
        : Iterator[CartAlert] = {
      var cur = pending.get().toVector
      // register each distinct deadline once per batch — two clicks in
      // the same microsecond share a deadline, and double-registration
      // is at best wasted state-store writes
      val registered = new scala.collection.mutable.HashSet[Long]
      rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
        if (e.event_type == "click") {
          cur = cur :+ PendingClick(e.event_id, e.ts_us, e.ts)
          val dl = deadlineMs(e.ts_us)
          if (registered.add(dl)) getHandle.registerTimer(dl)
        } else if (e.event_type == "purchase") {
          cur = cur.filterNot(c =>
            c.ts_us <= e.ts_us && e.ts_us <= c.ts_us + windowUs)
        }
      }
      pending.clear()
      if (cur.nonEmpty) pending.put(cur.toArray)
      Iterator.empty
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo)
        : Iterator[CartAlert] = {
      // safe-to-alert: the watermark has passed this timer's deadline,
      // so no purchase that could resolve these clicks can still come
      val cur = pending.get().toVector
      val (expired, alive) = cur.partition(c =>
        deadlineMs(c.ts_us) <= expiredTimerInfo.getExpiryTimeInMs)
      pending.clear()
      if (alive.nonEmpty) pending.put(alive.toArray)
      expired.sortBy(_.click_id)
        .iterator.map(c => CartAlert(key, c.click_id, c.ts))
    }
  }

  /** Streaming form. `events` must already carry a watermark on `ts`
    * (timers fire off the event-time watermark). */
  def abandonedStream(events: DataFrame,
                      windowUs: Long = DefaultWindowUs): DataFrame = {
    val ds = toCartEvents(events)
    import ds.sparkSession.implicits._
    ds.groupByKey(_.user_id)
      .transformWithState(new CartProcessor(windowUs),
        TimeMode.EventTime(), OutputMode.Append())
      .toDF()
  }
}
