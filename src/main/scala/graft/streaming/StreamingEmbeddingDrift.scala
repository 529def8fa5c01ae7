package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** One streamed embedding coordinate, pre-quantized to the 6-dp grid
  * (micro-units — the [[graft.similarity.EmbeddingDrift]] axis
  * contract). */
case class EmbDimEvent(i: Long, qMicro: Long)

/** State-store record: one dimension's running (count, exact
  * micro-unit sum). */
case class EmbDimState(n: Long, sumMicro: Long)

/** Emitted per dimension per micro-batch: current-snapshot mean and
  * the shift vs the frozen baseline, both on the batch operator's
  * exact double sequence. */
case class EmbDriftReading(i: Long, n_b: Long, mean_b: Double,
                           mean_shift: Double)

/** ONLINE embedding-drift monitor — the streaming twin of
  * [[graft.similarity.EmbeddingDrift.perDim]]'s mean/shift columns:
  * the baseline snapshot's per-dim RAW means are frozen at deploy
  * time (d doubles — model-sized, like centroids), the stream folds
  * each micro-batch's quantized coordinates into a per-dim
  * `(n, Σ micro-units)` ValueState (exact BIGINT arithmetic — the
  * 6-dp grid makes every sum an integer), and every trigger emits
  * each seen dimension's current mean and shift.
  *
  * Stream ≡ batch by construction: `sumMicro.toDouble / 1e6` is the
  * correctly-rounded double of the same rational the batch's
  * DECIMAL(18,6)-sum → double cast produces (both operands exact), and
  * the mean/shift finish with the identical floor-portable 6-dp
  * round — StreamingEmbeddingDriftSpec asserts one trigger ≡ many
  * triggers ≡ `EmbeddingDrift.perDim` bit-exactly, which transitively
  * puts the monitor under d110's DuckDB oracle. Variance stays
  * batch-side: its Σq² fold needs DECIMAL(38,12) headroom that a
  * bigint state cannot carry without overflow.
  *
  * Scale shape: state is d rows of two longs; each batch explodes
  * vectors into (dim, qMicro) rows and shuffles once on the dim key;
  * nothing rescans history. */
object StreamingEmbeddingDrift {

  /** Freeze per-dim raw means from the baseline snapshot — the SAME
    * arithmetic path as the batch operator (decimal micro sums cast
    * to double ÷ count). */
  def fitBaseline(base: DataFrame, vecCol: String): Map[Long, Double] =
    base.filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("__i", "__x")))
      .select(col("__i").cast("bigint").as("i"),
        floor(col("__x").cast("double") * lit(1e6) + lit(0.5))
          .cast("bigint").as("q"))
      .groupBy(col("i"))
      .agg(count(lit(1)).as("n"), sum(col("q")).as("s"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getLong(2).toDouble / 1e6) / r.getLong(1).toDouble)
      .toMap

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  class EmbDriftProcessor(baseline: Map[Long, Double])
      extends StatefulProcessor[Long, EmbDimEvent, EmbDriftReading] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[EmbDimState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[EmbDimState]("dimstate",
        Encoders.product[EmbDimState], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EmbDimEvent],
                                 timerValues: TimerValues)
        : Iterator[EmbDriftReading] = {
      baseline.get(key) match {
        case None => Iterator.empty // dim absent from the baseline
        case Some(meanA) =>
          var st = Option(state.get()).getOrElse(EmbDimState(0L, 0L))
          rows.foreach(e =>
            st = EmbDimState(st.n + 1L, st.sumMicro + e.qMicro))
          state.update(st)
          val rawMean = (st.sumMicro.toDouble / 1e6) / st.n.toDouble
          Iterator.single(EmbDriftReading(key, st.n,
            r6(rawMean), r6(rawMean - meanA)))
      }
    }
  }

  /** Streaming form over rows with an embedding column; RocksDB state
    * store (state v2). Emits one reading per seen dim per trigger. */
  def monitor(current: DataFrame, vecCol: String,
              baseline: Map[Long, Double]): DataFrame = {
    import current.sparkSession.implicits._
    current.filter(col(vecCol).isNotNull)
      .select(posexplode(col(vecCol)).as(Seq("__i", "__x")))
      .select(col("__i").cast("bigint").as("i"),
        floor(col("__x").cast("double") * lit(1e6) + lit(0.5))
          .cast("bigint").as("qMicro"))
      .as[EmbDimEvent]
      .groupByKey(_.i)
      .transformWithState(new EmbDriftProcessor(baseline),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }
}
