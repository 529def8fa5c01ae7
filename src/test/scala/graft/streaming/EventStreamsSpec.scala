package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

/** Batch-equivalence tests (SURVEY §2 C9/C10): the same rows through
  * the streaming engine (MemoryStream, one batch, then complete/append
  * output) must match the batch engine's answer. */
class EventStreamsSpec extends SparkSpec {

  import spark.implicits._

  private lazy val batchEvents = Tables.events(spark, sf0001)
    .select("event_id", "ts", "user_id", "event_type", "value").cache()

  private def streamed(transform: org.apache.spark.sql.DataFrame =>
      org.apache.spark.sql.DataFrame,
      mode: String): org.apache.spark.sql.DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val rows = batchEvents.as[Ev].collect()
    input.addData(rows.toSeq)
    val q = transform(input.toDF())
      .writeStream.format("memory").queryName("sink_" + mode)
      .outputMode(mode).start()
    q.processAllAvailable()
    q.stop()
    spark.table("sink_" + mode)
  }

  test("hourly tumbling aggregate: streaming == batch") {
    val stream = streamed(EventStreams.hourlyTumbling(_), "complete")
      .orderBy("hour_start", "event_type")
    val batch = EventStreams.hourlyTumbling(batchEvents)
      .orderBy("hour_start", "event_type")
    assert(stream.collect().toSeq === batch.collect().toSeq)
  }

  test("sessionization: streaming == batch") {
    val stream = streamed(EventStreams.sessionize(_), "complete")
      .orderBy("user_id", "session_start")
    val batch = EventStreams.sessionize(batchEvents)
      .orderBy("user_id", "session_start")
    assert(stream.collect().toSeq === batch.collect().toSeq)
  }

  test("file-source ingest -> dedup -> foreachBatch partitioned archive") {
    val dir = java.nio.file.Files.createTempDirectory("stream_archive").toString
    // stream input: the events table plus 100 duplicated rows, as files
    batchEvents.write.parquet(s"$dir/in")
    batchEvents.limit(100).write.mode("append").parquet(s"$dir/in")
    val stream = spark.readStream.schema(batchEvents.schema).parquet(s"$dir/in")
    val q = EventStreams.archiveDeduped(stream, s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    q.processAllAvailable()
    q.stop()
    val out = EventStreams.readArchive(spark, s"$dir/out")
    assert(out.count() === batchEvents.count()) // dups dropped
    assert(out.groupBy("event_id").count().filter(col("count") > 1).count() === 0)
    // the idempotency bookkeeping column stays internal
    assert(!out.columns.contains("__batch_id"))
    // hive-style date partitions actually materialized
    val partDirs = new java.io.File(s"$dir/out").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("event_date="))
    assert(partDirs.length > 1)
    // restart against the same checkpoint: committed batches are not
    // re-appended (idempotent archive)
    val q2 = EventStreams.archiveDeduped(
        spark.readStream.schema(batchEvents.schema).parquet(s"$dir/in"),
        s"$dir/out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    q2.processAllAvailable()
    q2.stop()
    assert(EventStreams.readArchive(spark, s"$dir/out").count() ===
      batchEvents.count())
  }

  test("stateful dedup keeps one row per event_id") {
    val withDups = batchEvents.union(batchEvents.limit(100))
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    input.addData(withDups.as[Ev].collect().toSeq)
    val q = EventStreams.dedupWithinWatermark(input.toDF())
      .writeStream.format("memory").queryName("dedup_sink")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_sink")
    assert(out.count() === batchEvents.count())
    assert(out.groupBy("event_id").count().filter(col("count") > 1).count() === 0)
  }
}
