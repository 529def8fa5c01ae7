package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TTLConfig}

/** One raw bucketed observation `(group, bucket time, metric on the
  * decimal grid)` — the stream's wire type. */
case class CusumRaw(g: String, t: Timestamp, x: java.math.BigDecimal)

/** One bucketed observation of the online CUSUM: `xMicro` = the
  * metric pre-scaled to exact integer micro-units (the decimal grid
  * ×10⁶ — the same convention as the batch operator). */
case class CusumEvent(g: String, t: Timestamp, tUs: Long, xMicro: Long)

/** State-store record: one group's CUSUM accumulators. */
case class CusumState(sUp: Long, sDn: Long)

/** Emitted per observation: the accumulators AFTER folding it. */
case class CusumReading(g: String, t: Timestamp, s_plus: Double,
                        s_minus: Double, alarm_up: Long, alarm_down: Long)

/** ONLINE CUSUM — the streaming twin of
  * [[graft.operators.Drift.cusum]]: CUSUM is inherently sequential
  * (S_t = max(0, S_{t−1} + d_t)), so the online form is just the
  * recursion itself carried in a `transformWithState` ValueState,
  * against a target μ FROZEN at deploy time (like the PSI monitor's
  * baseline — the batch operator derives μ from the full series; the
  * deployed detector must not let the drift it is hunting move its
  * own reference).
  *
  * Stream ≡ batch: all arithmetic is exact integer micro-units, rows
  * fold in (t, tUs) order within each batch, and the state carries
  * the accumulators across triggers — so with targets frozen at the
  * batch-derived means the emitted rows equal the batch operator's
  * closed-form output bit-exactly, however the feed is split
  * (StreamingCusumSpec: 1 trigger == 3 triggers == batch, which puts
  * the online detector transitively under d64_cusum's oracle).
  *
  * Scale shape: O(groups) longs of state, one shuffle per batch on
  * the group key, nothing rescans history. */
object StreamingCusum {

  /** Freeze per-group targets from a batch series `(g, x decimal)` —
    * the same truncating integer-division mean the batch operator
    * computes (model-sized: one row per group). */
  def fitTargets(series: DataFrame): Map[String, Long] = {
    series
      .groupBy(col("g"))
      .agg((sum((col("x").cast("decimal(18,2)") * lit(1000000L))
        .cast("long")).cast("long")).as("sm"), count(lit(1)).as("n"))
      .withColumn("mu", expr("sm div n"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("mu")).toMap
  }

  class CusumProcessor(targets: Map[String, Long], allowanceMicro: Long,
                       thresholdMicro: Long)
      extends StatefulProcessor[String, CusumEvent, CusumReading] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[CusumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[CusumState]("cusum",
        Encoders.product[CusumState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[CusumEvent],
                                 timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[CusumReading] = {
      targets.get(key) match {
        case None => Iterator.empty // no frozen target -> not monitored
        case Some(mu) =>
          val sorted = rows.toSeq.sortBy(e => (e.tUs, e.xMicro))
          var st = Option(state.get()).getOrElse(CusumState(0L, 0L))
          val out = sorted.map { e =>
            val sUp = math.max(0L, st.sUp + e.xMicro - mu - allowanceMicro)
            val sDn = math.max(0L, st.sDn + mu - e.xMicro - allowanceMicro)
            st = CusumState(sUp, sDn)
            CusumReading(key, e.t, sUp / 1e6, sDn / 1e6,
              if (sUp > thresholdMicro) 1L else 0L,
              if (sDn > thresholdMicro) 1L else 0L)
          }
          state.update(st)
          out.iterator
      }
    }
  }

  /** Streaming form over `(g, t, x)` rows (x on the decimal grid);
    * requires the RocksDB state store provider (state v2). */
  def monitor(series: DataFrame, targets: Map[String, Long],
              allowanceMicro: Long, thresholdMicro: Long): DataFrame = {
    import series.sparkSession.implicits._
    series.select(col("g"), col("t"), unix_micros(col("t")).as("tUs"),
        (col("x").cast("decimal(18,2)") * lit(1000000L)).cast("long")
          .as("xMicro"))
      .as[CusumEvent]
      .groupByKey(_.g)
      .transformWithState(
        new CusumProcessor(targets, allowanceMicro, thresholdMicro),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }
}
