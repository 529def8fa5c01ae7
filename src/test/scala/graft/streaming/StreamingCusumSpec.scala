package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the online CUSUM: with targets frozen at the
  * batch-derived means, the emitted rows must equal
  * [[graft.operators.Drift.cusum]]'s closed-form output bit-exactly —
  * in one trigger and time-split across three — putting the online
  * detector transitively under d64_cusum's DuckDB oracle. */
class StreamingCusumSpec extends SparkSpec {

  import spark.implicits._

  private val kA = 50000000L
  private val kH = 200000000L

  // the d64_cusum shape at sf0.001: hourly revenue per event type
  private lazy val series = Tables.events(spark, sf0001)
    .groupBy(col("event_type").as("g"),
      date_trunc("hour", col("ts")).as("t"))
    .agg(sum(col("value").cast("decimal(18,2)"))
      .cast("decimal(18,2)").as("x"))
    .cache()

  private lazy val batch = graft.operators.Drift.cusum(
      series.withColumnRenamed("g", "event_type"), "t", "x",
      Seq("event_type"), kA, kH)
    .orderBy("event_type", "t").collect().toSeq

  private def streamed(nChunks: Int): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val targets = StreamingCusum.fitTargets(series.select("g", "x"))
    val rows = series.select(col("g"), col("t"), col("x"))
      .as[CusumRaw].collect().toSeq.sortBy(_.t.getTime)
    val chunks =
      if (nChunks == 1) Seq(rows)
      else {
        val sz = math.max(1, rows.size / nChunks)
        rows.grouped(sz).toSeq
      }
    val input = MemoryStream[CusumRaw]
    val name = s"cusum_sink_$nChunks"
    val q = StreamingCusum.monitor(input.toDF(), targets, kA, kH)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    spark.table(name).orderBy("g", "t").collect().toSeq
  }

  private def key(r: org.apache.spark.sql.Row) =
    (r.getString(0), r.getTimestamp(1), r.getDouble(2), r.getDouble(3),
      r.getLong(4), r.getLong(5))

  test("one trigger == batch closed form, bit-exact") {
    val got = streamed(1)
    assert(batch.nonEmpty && got.size === batch.size)
    got.zip(batch).foreach { case (s, b) => assert(key(s) === key(b)) }
  }

  test("state carries across triggers: time-split feed == batch") {
    val got = streamed(3)
    got.zip(batch).foreach { case (s, b) => assert(key(s) === key(b)) }
  }
}
