package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TTLConfig}

/** One series observation: group, event-time micros (ordering key),
  * value. */
case class HoltEvent(g: String, tUs: Long, y: Double)

/** State-store record: points seen, previous level/trend, and the
  * FIRST value (needed to initialize the trend at the second point —
  * Holt's l₁ = y₁, b₁ = y₂ − y₁ start). */
case class HoltState(n: Long, l: Double, b: Double, y1: Double)

/** Emitted after each micro-batch per group: fitted state and the
  * one-step-ahead forecast. */
case class HoltReading(g: String, n: Long, level: Double, trend: Double,
                       forecast1: Double)

/** ONLINE Holt monitor — the streaming twin of
  * [[graft.operators.Forecast.holt]]: the level/trend recursion is
  * inherently sequential, which makes it a PERFECT streaming-state
  * fit — each arriving bucket value advances (l, b) by one step in a
  * `transformWithState` ValueState, and every trigger emits the
  * current fit plus the one-step forecast ("what should the next
  * bucket look like" — the expected-load / anomaly-baseline readout,
  * maintained continuously instead of refit nightly).
  *
  * Stream ≡ batch by construction: rows are folded in (tUs, y) order
  * within each batch (the [[StreamingCusum]] convention) and the
  * update is the batch operator's exact double sequence, so after the
  * last trigger the reading equals `Forecast.holt`'s fitted state on
  * the same series bit-exactly — StreamingHoltSpec asserts one
  * trigger ≡ many triggers ≡ batch, which transitively puts the
  * monitor under d96's recursive-CTE oracle.
  *
  * Scale shape: state is FOUR numbers per group; each batch shuffles
  * once on the group key; nothing rescans history. */
object StreamingHolt {

  /** One recursion step — the batch operator's exact arithmetic. */
  def step(l: Double, b: Double, y: Double, alpha: Double,
           beta: Double): (Double, Double) = {
    val l2 = alpha * y + (1.0 - alpha) * (l + b)
    val b2 = beta * (l2 - l) + (1.0 - beta) * b
    (l2, b2)
  }

  class HoltProcessor(alpha: Double, beta: Double)
      extends StatefulProcessor[String, HoltEvent, HoltReading] {
    @transient private var state:
        org.apache.spark.sql.streaming.ValueState[HoltState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[HoltState]("holt",
        Encoders.product[HoltState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[HoltEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[HoltReading] = {
      val sorted = rows.toSeq.sortBy(e => (e.tUs, e.y))
      var st = Option(state.get()).getOrElse(
        HoltState(0L, 0.0, 0.0, 0.0))
      sorted.foreach { e =>
        st = st.n match {
          case 0L => HoltState(1L, e.y, 0.0, e.y)
          case 1L => // second point initializes the trend, then steps
            val b1 = e.y - st.y1
            val (l2, b2) = step(st.y1, b1, e.y, alpha, beta)
            HoltState(2L, l2, b2, st.y1)
          case n => val (l2, b2) = step(st.l, st.b, e.y, alpha, beta)
            HoltState(n + 1L, l2, b2, st.y1)
        }
      }
      state.update(st)
      if (st.n < 2) Iterator.empty
      else Iterator.single(HoltReading(key, st.n,
        math.floor(st.l * 1e6 + 0.5) / 1e6,
        math.floor(st.b * 1e6 + 0.5) / 1e6,
        math.floor((st.l + st.b) * 1e6 + 0.5) / 1e6))
    }
  }

  /** Streaming form over `(g, tUs, y)` rows; requires the RocksDB
    * state store provider (state v2). Emits one reading per seen
    * group per trigger once ≥ 2 points exist. */
  def monitor(current: DataFrame, alpha: Double = 0.3,
              beta: Double = 0.1): DataFrame = {
    import current.sparkSession.implicits._
    current.select(col("g"), col("tUs").cast("long").as("tUs"),
        col("y").cast("double").as("y"))
      .as[HoltEvent]
      .groupByKey(_.g)
      .transformWithState(new HoltProcessor(alpha, beta),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }
}
