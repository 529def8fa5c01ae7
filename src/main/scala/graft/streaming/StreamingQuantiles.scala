package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** One metric observation for the quantile monitor (value pre-folded
  * to the exact cent grid). */
case class QuantEvent(g: String, cents: Long)

/** Emitted per group per micro-batch: exact quantiles so far, in cent
  * units (callers divide by 100 for metric units). */
case class QuantReading(g: String, n: Long, qs: Seq[Double])

/** ONLINE EXACT QUANTILES — the streaming twin of the percentile
  * family (d77's per-arm quantiles, the fence operators): per group,
  * the state is the EXACT per-value counter table over the bounded
  * cent grid ([[graft.impute.Robust]]'s value-grid contract — the
  * same reason the batch family is oracle-able), so every trigger can
  * emit exact type-7 quantiles of everything seen so far. No sketch,
  * no error bound to explain: on grid-valued metrics the stream IS
  * the batch answer (StreamingQuantilesSpec pins stream ≡ Spark
  * `percentile` bit-exactly across triggers).
  *
  * Scale shape: state per group is O(distinct grid values) longs —
  * the ecdf axis bound; a continuous metric must be quantized first
  * (functions.AxisGrid), exactly as the batch contract requires. Each
  * trigger shuffles once on the group key and folds its rows into the
  * counter map; the quantile walk is over the bounded axis. For
  * p50/p95/p99 latency dashboards over money/duration grids this is
  * the exact-answer alternative to an approximate-sketch monitor.
  *
  * Interpolation mirrors Spark's `Percentile.getPercentile` double
  * sequence — position = p·(n−1), result = lo·(⌈pos⌉−pos) +
  * hi·(pos−⌊pos⌋) — so the reading equals the batch aggregate to the
  * bit, not within an epsilon. */
object StreamingQuantiles {

  /** Spark Percentile's interpolation over a sorted (value, cum)
    * axis: exposed for the spec's driver-side reference. */
  def interpolate(sorted: Array[(Long, Long)], n: Long,
                  p: Double): Double = {
    val position = p * (n - 1).toDouble
    val lower = math.floor(position).toLong
    val higher = math.ceil(position).toLong
    def valueAt(rank0: Long): Double = {
      // rank0 is 0-based; cum counts are 1-based inclusive
      var i = 0
      while (i < sorted.length && sorted(i)._2 < rank0 + 1) i += 1
      sorted(i)._1.toDouble
    }
    val lo = valueAt(lower)
    if (higher == lower) lo
    else lo * (higher - position) + valueAt(higher) * (position - lower)
  }

  class QuantProcessor(ps: Seq[Double])
      extends StatefulProcessor[String, QuantEvent, QuantReading] {
    @transient private var counts: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[Long, Long]("counts",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[QuantEvent],
                                 timerValues: TimerValues)
        : Iterator[QuantReading] = {
      val delta = scala.collection.mutable.HashMap.empty[Long, Long]
      rows.foreach(e => delta(e.cents) = delta.getOrElse(e.cents, 0L) + 1L)
      delta.foreach { case (v, d) =>
        val cur = if (counts.containsKey(v)) counts.getValue(v) else 0L
        counts.updateValue(v, cur + d)
      }
      val axis = counts.iterator().map(p => (p._1, p._2)).toArray
        .sortBy(_._1)
      var cum = 0L
      val withCum = axis.map { case (v, c) => cum += c; (v, cum) }
      val n = cum
      if (n == 0L) Iterator.empty
      else Iterator.single(QuantReading(key, n,
        ps.map(p => interpolate(withCum, n, p))))
    }
  }

  /** Streaming form over `(g, v)` rows (v on the 2-dp grid; folded to
    * cents here). RocksDB state store, as all state-v2 ops. */
  def monitor(current: DataFrame, ps: Seq[Double]): DataFrame = {
    import current.sparkSession.implicits._
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    current.select(col("g"),
        (col("v").cast("decimal(18,2)") * lit(100L)).cast("long")
          .as("cents"))
      .as[QuantEvent]
      .groupByKey(_.g)
      .transformWithState(new QuantProcessor(ps),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  /** Batch twin — Spark's own `percentile` over the same cent grid,
    * the reference the stream must equal bit-for-bit. */
  def batch(df: DataFrame, ps: Seq[Double]): DataFrame =
    df.select(col("g"),
        (col("v").cast("decimal(18,2)") * lit(100L)).cast("long")
          .as("cents"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n"),
        expr(s"percentile(cents, array(${ps.mkString(", ")}))").as("qs"))
}
