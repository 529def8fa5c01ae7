package graft.streaming

import graft.SparkSpec
import graft.sources.VersionedTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class LogRow(id: Long, payload: String)

/** Exactly-once streaming publish: each micro-batch commits as one
  * atomic version; a replayed epoch (foreachBatch's at-least-once
  * recovery) publishes nothing new. */
class StreamingVersionedPublishSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  test("each micro-batch commits one version; the log equals the " +
    "full input") {
    val dir = tmp("vlog"); val ck = tmp("vck")
    VersionedTable.drop(spark, dir)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[LogRow]
    val q = StreamingVersionedPublish.run(input.toDF(), dir, ck)
    val batches = Seq(
      (1L to 50L).map(i => LogRow(i, s"p$i")),
      (51L to 80L).map(i => LogRow(i, s"p$i")),
      (81L to 90L).map(i => LogRow(i, s"p$i")))
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    assert(VersionedTable.versions(spark, dir).size === 3)
    val log = StreamingVersionedPublish.readLog(spark, dir)
      .as[LogRow].collect().map(_.id).sorted
    assert(log.toSeq === (1L to 90L))
    // each version is exactly its batch
    assert(VersionedTable.readAsOf(spark, dir, 2L).count() === 30L)
    VersionedTable.drop(spark, dir)
  }

  test("a replayed epoch is exactly-once: no new version, no " +
    "duplicated rows") {
    val dir = tmp("vreplay")
    VersionedTable.drop(spark, dir)
    val b0 = (1L to 20L).map(i => LogRow(i, s"p$i")).toDF()
    StreamingVersionedPublish.applyBatch(b0, epochId = 0L, dir)
    // recovery re-delivers epoch 0 (possibly with a recomputed frame)
    StreamingVersionedPublish.applyBatch(b0, epochId = 0L, dir)
    assert(VersionedTable.versions(spark, dir) === Seq(1L),
      "replayed epoch must not create a second version")
    assert(StreamingVersionedPublish.readLog(spark, dir).count() === 20L)
    // the next epoch still advances
    StreamingVersionedPublish.applyBatch(
      (21L to 25L).map(i => LogRow(i, s"p$i")).toDF(), epochId = 1L, dir)
    assert(VersionedTable.versions(spark, dir) === Seq(1L, 2L))
    VersionedTable.drop(spark, dir)
  }

  test("empty batches publish no version") {
    val dir = tmp("vempty")
    VersionedTable.drop(spark, dir)
    StreamingVersionedPublish.applyBatch(
      Seq.empty[LogRow].toDF(), epochId = 0L, dir)
    assert(VersionedTable.latestVersion(spark, dir).isEmpty)
    VersionedTable.drop(spark, dir)
  }
}
