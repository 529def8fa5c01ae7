package graft.streaming

import graft.expressions.FreqSummary
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig}

/** One item arriving at the frequency monitor: `key` partitions the
  * sketch (language, source, tenant), `item` is what's counted. */
case class FreqItem(key: String, item: String)

/** Emitted row: one heavy hitter of `key`'s stream as of `n_seen`
  * items. A batch's emission carries the FULL refreshed top-k, so the
  * rows with the maximum `n_seen` per key are the current answer. */
case class HeavyHitter(key: String, item: String, cnt: Long, rank: Int,
                       n_seen: Long, max_error: Long)

/** STREAMING HEAVY HITTERS — the live twin of the batch
  * `graft_topk_freq` aggregate ([[graft.expressions.TopKFreq]]): "top
  * tokens per language, continuously" for drift dashboards and abuse
  * monitors, without ever materializing a token histogram.
  *
  * The state is the SAME Misra–Gries summary the batch aggregate uses
  * — mergeable (Agarwal et al., PODS'12), so folding micro-batch after
  * micro-batch into the carried summary is exactly the batch partial/
  * final merge replayed over time. In the exact regime (distinct items
  * ≤ capacity, where MG performs no decrements) the streamed counts
  * equal the batch aggregate's REGARDLESS of how the input splits into
  * triggers — StreamingHeavyHittersSpec asserts stream == batch ==
  * one-trigger stream. Past the exact regime the classic bound
  * (undercount ≤ n/(capacity+1)) still holds because merges preserve
  * it.
  *
  * Scale shape: state per key is the MapState counter table, bounded
  * by `capacity` entries — RocksDB holds one (key, item) → cnt entry
  * each, so a batch touches O(capacity) state rows per ACTIVE key,
  * never O(stream). Emission is the refreshed top-k per active key
  * per trigger (monitoring semantics: each trigger overwrites the
  * dashboard; `n_seen` makes "latest" explicit for downstream
  * consumers).
  */
object StreamingHeavyHitters {

  /** Totals carried besides the counter map. */
  case class HhMeta(n_seen: Long, max_error: Long)

  class HhProcessor(k: Int, capacity: Int, ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, FreqItem, HeavyHitter] {
    @transient private var counters
        : org.apache.spark.sql.streaming.MapState[String, Long] = _
    @transient private var meta
        : org.apache.spark.sql.streaming.ValueState[HhMeta] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[String, Long]("counters",
        Encoders.STRING, Encoders.scalaLong, ttl)
      meta = getHandle.getValueState[HhMeta]("meta",
        Encoders.product[HhMeta], ttl)
    }

    override def handleInputRows(key: String, rows: Iterator[FreqItem],
                                 timerValues: TimerValues)
        : Iterator[HeavyHitter] = {
      // load the bounded counter table (≤ capacity entries), fold the
      // batch through the SAME FreqSummary the batch aggregate runs,
      // then write back the diff (removed entries are MG evictions)
      val s = new FreqSummary(capacity)
      val before = new scala.collection.mutable.HashSet[String]
      counters.iterator().foreach { p =>
        s.counts.put(p._1, p._2); before += p._1
      }
      val m = Option(meta.get()).getOrElse(HhMeta(0L, 0L))
      s.maxError = m.max_error
      var n = m.n_seen
      rows.foreach { r => s.add(r.item); n += 1 }
      before.foreach { item =>
        if (!s.counts.containsKey(item)) counters.removeKey(item)
      }
      s.counts.forEach((item, cnt) => counters.updateValue(item, cnt))
      meta.update(HhMeta(n, s.maxError))
      s.topK(k).iterator.zipWithIndex.map { case ((item, cnt), i) =>
        HeavyHitter(key, item, cnt, i + 1, n, s.maxError)
      }
    }
  }

  /** Projection shared by stream and batch twin: one row per counted
    * item. `keyCol` must be string (cast upstream if needed). */
  def toItems(df: DataFrame, keyCol: String, itemCol: String): Dataset[FreqItem] = {
    import df.sparkSession.implicits._
    df.select(col(keyCol).cast("string").as("key"),
      col(itemCol).cast("string").as("item")).as[FreqItem]
  }

  /** Streaming form (RocksDB state store, as all state-v2 ops here). */
  def topKStream(items: Dataset[FreqItem], k: Int, capacity: Int,
                 ttl: TTLConfig = TTLConfig.NONE): DataFrame = {
    import items.sparkSession.implicits._
    items.groupByKey(_.key)
      .transformWithState(new HhProcessor(k, capacity, ttl),
        TimeMode.None(), OutputMode.Append())
      .toDF()
  }

  /** Batch twin: the keyed `graft_topk_freq` aggregate. */
  def topKBatch(items: Dataset[FreqItem], k: Int, capacity: Int): DataFrame =
    items.groupBy(col("key"))
      .agg(expr(s"graft_topk_freq(item, $k, $capacity)").as("tk"))
      .select(col("key"), posexplode(col("tk")))
      .select(col("key"), col("col.item").as("item"),
        col("col.cnt").as("cnt"), (col("pos") + 1).cast("int").as("rank"))
}
