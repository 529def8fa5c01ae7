package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** transformWithState (state v2) equivalence: the same rows through the
  * RocksDB-backed StatefulProcessor — in one trigger and split across
  * two — must match the batch twin, which is itself oracle-backed
  * (d8_running_totals). */
class StatefulRunningSpec extends SparkSpec {

  import spark.implicits._

  private lazy val batchEvents = Tables.events(spark, sf0001)
    .select("event_id", "ts", "user_id", "event_type", "value").cache()

  private def streamed(chunks: Seq[Seq[Ev]]): org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Ev]
    val name = "running_sink_" + chunks.size
    val q = StatefulRunning.runningStats(input.toDF())
      .writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    spark.table(name)
  }

  private def sortedRows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("user_id", "n_so_far", "event_id").collect().toSeq

  test("transformWithState: one trigger == batch twin") {
    val rows = batchEvents.as[Ev].collect().toSeq
    val stream = sortedRows(streamed(Seq(rows)))
    val batch = sortedRows(StatefulRunning.runningStatsBatch(batchEvents))
    assert(batch.nonEmpty)
    assert(stream === batch)
  }

  test("transformWithState: state carries across triggers (time-split feed)") {
    val rows = batchEvents.as[Ev].collect().toSeq.sortBy(_.ts.getTime)
    val (first, second) = rows.splitAt(rows.size / 2)
    val stream = sortedRows(streamed(Seq(first, second)))
    val batch = sortedRows(StatefulRunning.runningStatsBatch(batchEvents))
    assert(stream === batch)
  }

  test("running totals accumulate exactly on the cents grid") {
    val out = StatefulRunning.runningStatsBatch(batchEvents)
    val byUser = out.groupBy("user_id")
      .agg(max("n_so_far").as("n"), max("value_so_far").as("total"))
    val expected = batchEvents.groupBy("user_id")
      .agg(count(lit(1)).as("n"),
        (sum(col("value").cast("decimal(18,2)"))).cast("double").as("total"))
    assert(byUser.exceptAll(expected).isEmpty &&
      expected.exceptAll(byUser).isEmpty)
  }
}
