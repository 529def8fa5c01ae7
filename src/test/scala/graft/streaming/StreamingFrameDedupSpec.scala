package graft.streaming

import graft.SparkSpec
import graft.multimodal.Multimodal
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class VideoAsset(asset_id: Long, payload: Array[Byte])

/** Online video dedup: the frame-hash claim machine fed through
  * MemoryStream — in one trigger and split across several — must keep
  * exactly the assets the batch twin keeps, and the batch twin is
  * oracle-backed (c6_online_frame_dedup_twin). */
class StreamingFrameDedupSpec extends SparkSpec {

  import spark.implicits._

  // the c6 fixture shape: 10 groups × 3 members, member m = member 0
  // trimmed by m frames (seed shift 7m)
  private lazy val corpus: Seq[VideoAsset] =
    (0L until 30L).map { id =>
      val g = id % 10L; val m = id / 10L
      VideoAsset(id, Multimodal.gifFixtureBytes(
        (4 + g % 5).toInt, (3 + g % 4).toInt, 6, g * 1000L + 7L * m))
    }.sortBy(_.asset_id)

  private def streamKept(chunks: Seq[Seq[VideoAsset]], name: String)
      : Set[Long] = {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[VideoAsset]
    val kept = scala.collection.mutable.Set[Long]()
    val q = StreamingFrameDedup.frameVerdicts(input.toDF(), "asset_id")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        kept ++= StreamingFrameDedup.resolveKept(batch)
          .filter(col("kept")).collect()
          .map(_.getLong(0))
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"framededup_$name").toString)
      .start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    kept.toSet
  }

  private lazy val batchKept =
    StreamingFrameDedup.keptBatch(corpus.toDF("asset_id", "payload"),
        "asset_id")
      .filter(col("kept")).collect().map(_.getLong(0)).toSet

  test("streaming == batch twin, single trigger") {
    assert(batchKept.nonEmpty && batchKept.size < corpus.size,
      "fixture should contain shifted copies for the test to bite")
    assert(streamKept(Seq(corpus), "one") === batchKept)
  }

  test("streaming == batch twin, arrival split across three triggers") {
    val third = corpus.size / 3
    val chunks = Seq(corpus.take(third),
      corpus.slice(third, 2 * third), corpus.drop(2 * third))
    assert(streamKept(chunks, "three") === batchKept)
  }

  test("first-wins: re-upload dropped, distinct footage kept") {
    def vid(seed: Long) = Multimodal.gifFixtureBytes(7, 5, 4, seed)
    val a = VideoAsset(1L, vid(230L))
    val reupload = VideoAsset(2L, vid(230L)) // identical frames
    val trimmed = VideoAsset(3L, vid(237L))  // shares 3 of 4 frames
    // fresh footage must WRAP inside the 35-px frames (seed 222:
    // wraps at px 34/27/20/13) — an unwrapped ramp (e.g. seed 120)
    // hashes identically to EVERY other ramp, including trimmed's
    // wrapped-around last frame (s=2), and would legitimately dedup
    val fresh = VideoAsset(4L, vid(222L))
    val got = streamKept(Seq(Seq(a), Seq(reupload, trimmed, fresh)), "fw")
    assert(!got.contains(2L), "identical re-upload not dropped")
    assert(!got.contains(3L), "75%-overlap trim not dropped")
    assert(got.contains(1L) && got.contains(4L))
  }
}
