package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch for the online drift monitor: the final per-group
  * reading must equal [[graft.operators.Drift.psi]] bit-exactly — in
  * one trigger and split across three — which transitively puts the
  * monitor under d61_psi's DuckDB oracle. */
class StreamingDriftSpec extends SparkSpec {

  import spark.implicits._

  private val bins = 10

  // same shape as the d61_psi row: events value distribution, first
  // half of the month = baseline, second half = current, per type
  private lazy val events = Tables.events(spark, sf0001)
    .select(col("event_type").as("g"), col("value").as("v"),
      dayofmonth(col("ts")).as("dom")).cache()
  private lazy val baseRows = events.filter(col("dom") <= 15).select("g", "v")
  private lazy val currRows = events.filter(col("dom") > 15).select("g", "v")

  private def lastReadings(chunks: Seq[Seq[DriftEvent]])
      : Map[String, (Long, Double, Double)] = {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val baseline = StreamingDrift.fitBaseline(baseRows, bins)
    val input = MemoryStream[DriftEvent]
    val name = "drift_sink_" + chunks.size
    val q = StreamingDrift.monitor(input.toDF(), baseline, bins)
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    // per group, the reading with the largest n_curr is the final one
    spark.table(name).collect()
      .groupBy(_.getString(0))
      .map { case (g, rs) =>
        val last = rs.maxBy(_.getLong(1))
        g -> (last.getLong(1), last.getDouble(2), last.getDouble(3))
      }
  }

  private lazy val snapshots =
    baseRows.withColumn("snapshot", lit("base"))
      .unionByName(currRows.withColumn("snapshot", lit("curr")))

  // (n_curr, psi, js) per group: both batch operators on the same rows
  private lazy val batchPsi: Map[String, (Long, Double, Double)] = {
    val psi = graft.operators.Drift.psi(snapshots,
      "snapshot", "v", "base", "curr", bins = bins, groupCols = Seq("g"))
      .collect().map(r => r.getString(0) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val js = graft.operators.Drift.jsDivergence(snapshots,
      "snapshot", "v", "base", "curr", bins = bins, groupCols = Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    psi.map { case (g, (n, p)) => g -> (n, p, js(g)) }
  }

  test("one trigger == batch psi AND js, bit-exact") {
    val rows = currRows.as[DriftEvent].collect().toSeq
    val got = lastReadings(Seq(rows))
    assert(batchPsi.nonEmpty)
    assert(got === batchPsi)
  }

  test("state carries across triggers: three chunks == batch psi and js") {
    val rows = currRows.as[DriftEvent].collect().toSeq
    val n = rows.size
    val chunks = Seq(rows.take(n / 3), rows.slice(n / 3, 2 * n / 3),
      rows.drop(2 * n / 3))
    val got = lastReadings(chunks)
    assert(got === batchPsi)
  }

  test("unmonitored groups (no baseline) emit nothing") {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val baseline = StreamingDrift.fitBaseline(
      Seq(("known", 1.0), ("known", 2.0)).toDF("g", "v"), bins)
    val input = MemoryStream[DriftEvent]
    val q = StreamingDrift.monitor(input.toDF(), baseline, bins)
      .writeStream.format("memory").queryName("drift_unknown")
      .outputMode("append").start()
    input.addData(Seq(DriftEvent("rogue", 5.0), DriftEvent("known", 1.5)))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("drift_unknown").collect()
    assert(got.map(_.getString(0)).toSet === Set("known"))
  }
}
