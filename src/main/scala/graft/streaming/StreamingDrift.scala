package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TTLConfig}

/** One metric observation of the drift monitor. */
case class DriftEvent(g: String, v: Double)

/** State-store record: one group's current-snapshot bin counts. */
case class DriftCounts(counts: Array[Long])

/** Emitted after each micro-batch: the group's PSI and JSD so far. */
case class DriftReading(g: String, n_curr: Long, psi: Double, js: Double)

/** Per-group baseline: fixed bin edges + frozen bin counts. */
case class DriftBaseline(mn: Double, mx: Double, counts: Array[Long])

/** ONLINE drift monitor — the streaming twin of
  * [[graft.operators.Drift.psi]]: the baseline histogram is FROZEN at
  * deploy time (bin edges + counts, model-sized: groups × bins), the
  * stream folds each micro-batch's values into per-group bin counts in
  * a `transformWithState` ValueState, and every trigger emits the PSI
  * of current-so-far vs baseline — the retraining tripwire evaluated
  * continuously instead of nightly.
  *
  * Stream ≡ batch by construction: binning uses the identical clamp
  * arithmetic, and the PSI fold walks bins in ascending order with the
  * same smoothing, skip-both-empty convention and HALF_UP 6-dp round
  * as the batch operator's ordered window fold — so after the last
  * trigger the reading equals `Drift.psi` on the same rows bit-exactly
  * (StreamingDriftSpec asserts one trigger == many triggers == batch,
  * which transitively puts the monitor under d61_psi's DuckDB oracle).
  *
  * Scale shape: state is O(groups × bins) longs; each batch shuffles
  * once on the group key; nothing rescans history. */
object StreamingDrift {

  /** Binning twin of the batch operator's clamp arithmetic. */
  def binOf(v: Double, mn: Double, mx: Double, bins: Int): Int = {
    if (mx - mn == 0) 0
    else math.max(0L, math.min(
      math.floor((v - mn) / (mx - mn) * bins).toLong, bins - 1L)).toInt
  }

  /** PSI of `curr` vs `base` — the batch fold's exact double sequence:
    * ascending-bin order, +0.5 Laplace smoothing over the configured
    * bin count, bins empty on BOTH sides skipped, HALF_UP 6-dp. */
  def psiOf(base: Array[Long], curr: Array[Long]): Double = {
    val b = base.length
    val nb = base.sum.toDouble
    val nc = curr.sum.toDouble
    val smooth = 0.5 * b
    var s = 0.0
    var i = 0
    while (i < b) {
      if (base(i) != 0L || curr(i) != 0L) {
        val pb = (base(i).toDouble + 0.5) / (nb + smooth)
        val pc = (curr(i).toDouble + 0.5) / (nc + smooth)
        s += (pc - pb) * math.log(pc / pb)
      }
      i += 1
    }
    java.math.BigDecimal.valueOf(s)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  private val Ln2 = 0.6931471805599453

  /** Jensen–Shannon divergence (bits) of `curr` vs `base` — the batch
    * [[graft.operators.Drift.jsDivergence]] fold's exact double
    * sequence: ascending bins, same smoothing and skip-both-empty
    * convention, ÷ ln 2 then HALF_UP 6-dp. One monitor read gives both
    * drift numbers: PSI to compare with historic dashboards, JSD as
    * the [0, 1]-bounded thresholdable index. */
  def jsOf(base: Array[Long], curr: Array[Long]): Double = {
    val b = base.length
    val nb = base.sum.toDouble
    val nc = curr.sum.toDouble
    val smooth = 0.5 * b
    var s = 0.0
    var i = 0
    while (i < b) {
      if (base(i) != 0L || curr(i) != 0L) {
        val pb = (base(i).toDouble + 0.5) / (nb + smooth)
        val pc = (curr(i).toDouble + 0.5) / (nc + smooth)
        val m = (pb + pc) * 0.5
        s += 0.5 * (pb * math.log(pb / m) + pc * math.log(pc / m))
      }
      i += 1
    }
    java.math.BigDecimal.valueOf(s / Ln2)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }

  /** Freeze a baseline from a batch DataFrame `(g, v)` — the deploy-
    * time artifact the monitor compares against (model-sized:
    * collected to the driver like centroids/codebooks). */
  def fitBaseline(base: DataFrame, bins: Int): Map[String, DriftBaseline] = {
    import base.sparkSession.implicits._
    val edges = base.groupBy(col("g"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    base.as[DriftEvent].collect()
      .groupBy(_.g)
      .map { case (g, evs) =>
        val (mn, mx) = edges(g)
        val counts = new Array[Long](bins)
        evs.foreach(e => counts(binOf(e.v, mn, mx, bins)) += 1L)
        g -> DriftBaseline(mn, mx, counts)
      }
  }

  class DriftProcessor(baseline: Map[String, DriftBaseline], bins: Int)
      extends StatefulProcessor[String, DriftEvent, DriftReading] {
    @transient private var state: org.apache.spark.sql.streaming.ValueState[DriftCounts] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[DriftCounts]("counts",
        Encoders.product[DriftCounts], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DriftEvent],
                                 timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[DriftReading] = {
      baseline.get(key) match {
        case None => Iterator.empty // no baseline -> not monitored
        case Some(b) =>
          val counts = Option(state.get()).map(_.counts)
            .getOrElse(new Array[Long](bins))
          rows.foreach { e =>
            if (!e.v.isNaN)
              counts(binOf(e.v, b.mn, b.mx, bins)) += 1L
          }
          state.update(DriftCounts(counts))
          Iterator.single(DriftReading(key, counts.sum,
            psiOf(b.counts, counts), jsOf(b.counts, counts)))
      }
    }
  }

  /** Streaming form over `(g, v)` rows; requires the RocksDB state
    * store provider (state v2). Emits one reading per seen group per
    * trigger. */
  def monitor(current: DataFrame, baseline: Map[String, DriftBaseline],
              bins: Int): DataFrame = {
    import current.sparkSession.implicits._
    current.select(col("g"), col("v").cast("double").as("v"))
      .as[DriftEvent]
      .groupByKey(_.g)
      .transformWithState(new DriftProcessor(baseline, bins),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }
}
