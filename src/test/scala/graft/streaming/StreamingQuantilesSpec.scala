package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the online exact-quantile monitor: the final
  * per-group reading must equal Spark's own `percentile` aggregate
  * BIT-EXACTLY — no sketch epsilon to explain away. */
class StreamingQuantilesSpec extends SparkSpec {

  import spark.implicits._

  private val ps = Seq(0.5, 0.95, 0.99)

  private lazy val rows = Tables.events(spark, sf0001)
    .select(col("event_type").as("g"), col("value").as("v")).cache()

  private lazy val batch: Map[String, (Long, Seq[Double])] =
    StreamingQuantiles.batch(rows, ps).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Double](2)))
      .toMap

  private def lastReadings(chunks: Seq[Seq[QuantEvent]])
      : Map[String, (Long, Seq[Double])] = {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[QuantEvent]
    val name = "quant_sink_" + chunks.size
    val q = StreamingQuantiles.monitor(
        input.toDF().select(col("g"), (col("cents").cast("double")
          / lit(100.0)).as("v")), ps)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    spark.table(name).collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) =>
        val last = rs.maxBy(_.getLong(1))
        g -> (last.getLong(1), last.getSeq[Double](2))
      }
  }

  private lazy val events: Seq[QuantEvent] = rows
    .select(col("g"), (col("v").cast("decimal(18,2)") * lit(100L))
      .cast("long").as("cents"))
    .as[QuantEvent].collect().toSeq

  test("one trigger == batch percentile, bit-exact") {
    val got = lastReadings(Seq(events))
    assert(batch.nonEmpty)
    assert(got === batch, s"\ngot  $got\nwant $batch")
  }

  test("state carries across triggers: three chunks == batch") {
    val n = events.size
    val got = lastReadings(Seq(events.take(n / 3),
      events.slice(n / 3, 2 * n / 3), events.drop(2 * n / 3)))
    assert(got === batch)
  }

  test("interpolate matches hand type-7 on a tiny axis") {
    // values {10, 20, 30, 40}: p50 → position 1.5 → 25.0
    val axis = Array((10L, 1L), (20L, 2L), (30L, 3L), (40L, 4L))
    assert(StreamingQuantiles.interpolate(axis, 4L, 0.5) === 25.0)
    assert(StreamingQuantiles.interpolate(axis, 4L, 0.0) === 10.0)
    assert(StreamingQuantiles.interpolate(axis, 4L, 1.0) === 40.0)
    // duplicated mass: {10×3, 40}: p50 → position 1.5 inside the 10s
    val dup = Array((10L, 3L), (40L, 4L))
    assert(StreamingQuantiles.interpolate(dup, 4L, 0.5) === 10.0)
  }
}
