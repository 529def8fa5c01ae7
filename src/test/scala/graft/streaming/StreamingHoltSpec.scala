package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the online Holt monitor: the final reading must
  * equal [[graft.operators.Forecast.holt]]'s fitted state on the same
  * series bit-exactly — in one trigger and split across three — which
  * transitively puts the monitor under d96's recursive-CTE oracle. */
class StreamingHoltSpec extends SparkSpec {

  import spark.implicits._

  private lazy val series = Tables.events(spark, sf0001)
    .groupBy(col("event_type").as("g"),
      date_trunc("day", col("ts")).as("t"))
    .agg(sum(col("value").cast("decimal(18,2)")).as("y"))
    .cache()

  private lazy val batchFit = graft.operators.Forecast.holt(
      series, Seq("g"), "t", "y", alpha = 0.3, beta = 0.1, horizon = 1)
    .collect()
    .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3),
      r.getDouble(4))).toMap

  private def streamed(nChunks: Int): Map[String, (Long, Double, Double,
      Double)] = {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val rows = series
      .select(col("g"), unix_micros(col("t")).as("tUs"),
        col("y").cast("double").as("y"))
      .as[HoltEvent].collect().toSeq.sortBy(_.tUs)
    val chunks =
      if (nChunks == 1) Seq(rows)
      else rows.grouped(math.max(1, rows.size / nChunks)).toSeq
    val input = MemoryStream[HoltEvent]
    val name = s"holt_sink_$nChunks"
    val q = StreamingHolt.monitor(input.toDF(), alpha = 0.3, beta = 0.1)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    // the LAST emitted reading per group is the final state
    spark.table(name).orderBy("g", "n").collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) =>
        val last = rs.maxBy(_.getLong(1))
        g -> (last.getLong(1), last.getDouble(2), last.getDouble(3),
          last.getDouble(4))
      }.toMap
  }

  test("one trigger: final reading == batch fit, bit-exact") {
    val got = streamed(1)
    assert(got.keySet === batchFit.keySet)
    got.foreach { case (g, (_, l, b, f1)) =>
      val (bl, bb, bf) = batchFit(g)
      assert(l === bl && b === bb && f1 === bf, s"$g: $l/$b vs $bl/$bb")
    }
  }

  test("three triggers: state carries across batches identically") {
    val got = streamed(3)
    got.foreach { case (g, (_, l, b, f1)) =>
      val (bl, bb, bf) = batchFit(g)
      assert(l === bl && b === bb && f1 === bf, s"$g: $l/$b vs $bl/$bb")
    }
  }

  test("hand-traced two-point warm-up and one-step forecast") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[HoltEvent]
    val q = StreamingHolt.monitor(input.toDF(), alpha = 0.5, beta = 0.5)
      .writeStream.format("memory").queryName("holt_hand")
      .outputMode("append").start()
    input.addData(Seq(HoltEvent("a", 1L, 10.0))) // 1 point: no reading
    q.processAllAvailable()
    assert(spark.table("holt_hand").count() === 0)
    input.addData(Seq(HoltEvent("a", 2L, 14.0), HoltEvent("a", 3L, 15.0)))
    q.processAllAvailable()
    q.stop()
    // ForecastSpec's trace: l = 16.5, b = 3.25, forecast1 = 19.75
    val r = spark.table("holt_hand").orderBy(col("n").desc).head
    assert(r.getLong(1) === 3L)
    assert(r.getDouble(2) === 16.5 && r.getDouble(3) === 3.25)
    assert(r.getDouble(4) === 19.75)
  }
}
