package graft.streaming

import graft.SparkSpec
import graft.operators.MergeUpsert
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Change(id: Long, text: String, seq: Long, op: String)

/** Streaming CDC materialization: a changelog applied micro-batch by
  * micro-batch must leave exactly the snapshot the one-shot batch
  * merge produces, while rewriting only the hash buckets each batch
  * touches. */
class StreamingMergeSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private val base = (1L to 200L).map(i => (i, s"doc $i")).toDF("id", "text")

  private val batches: Seq[Seq[Change]] = Seq(
    // batch 1: revise some docs, insert new ones
    (1L to 40L).map(i => Change(i * 5, s"doc ${i * 5} v2", 100 + i, "upsert")) ++
      Seq(Change(201L, "doc 201", 180, "upsert")),
    // batch 2: delete every 20th doc (some just revised), more inserts
    (1L to 10L).map(i => Change(i * 20, "x", 200 + i, "delete")) ++
      Seq(Change(202L, "doc 202", 250, "upsert")),
    // batch 3: resurrect one deleted doc, re-revise another
    Seq(Change(40L, "doc 40 v3", 300, "upsert"),
      Change(25L, "doc 25 v3", 301, "upsert")))

  test("stream-maintained snapshot equals the one-shot batch merge") {
    val dir = tmp("snap"); val ck = tmp("ck")
    StreamingMerge.init(base, "id", dir, nBuckets = 16)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val q = StreamingMerge.run(input.toDF(), "id", "seq", "op", dir, ck,
      nBuckets = 16)
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    val streamed = StreamingMerge.snapshot(spark, dir)
      .as[(Long, String)].collect().toMap
    val batchMerged = MergeUpsert.merge(base,
      batches.flatten.toDF(), "id", "seq", "op")
      .as[(Long, String)].collect().toMap
    assert(streamed === batchMerged)
    // spot-check semantics across batches
    assert(!streamed.contains(20L))            // deleted, never resurrected
    assert(streamed(40L) === "doc 40 v3")      // deleted then re-upserted
    assert(streamed(25L) === "doc 25 v3")      // upsert of an untouched doc
    assert(streamed(202L) === "doc 202")       // streamed insert
  }

  test("a batch rewrites only the buckets it touches") {
    val dir = tmp("snap2")
    StreamingMerge.init(base, "id", dir, nBuckets = 16)
    def bucketFiles(): Map[String, Set[String]] = {
      val root = new java.io.File(dir)
      root.listFiles().filter(_.getName.startsWith("__bucket="))
        .map(d => d.getName ->
          d.listFiles().map(f => f.getName + ":" + f.lastModified()).toSet)
        .toMap
    }
    val before = bucketFiles()
    // one single-id change touches exactly one bucket
    StreamingMerge.applyBatch(
      Seq(Change(7L, "doc 7 v2", 1000, "upsert")).toDF(),
      "id", "seq", "op", dir, nBuckets = 16)
    val after = bucketFiles()
    val changed = after.keySet.filter(k => before.get(k) != after.get(k))
    assert(changed.size === 1, s"expected 1 rewritten bucket, got $changed")
    assert(StreamingMerge.snapshot(spark, dir)
      .filter(col("id") === 7L).select("text").as[String].head() === "doc 7 v2")
  }

  test("deleting a whole bucket leaves no stale files behind") {
    val dir = tmp("snap3")
    val tiny = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    StreamingMerge.init(tiny, "id", dir, nBuckets = 4)
    val dels = Seq(1L, 2L, 3L).map(i => Change(i, "x", 10 + i, "delete"))
    StreamingMerge.applyBatch(dels.toDF(), "id", "seq", "op", dir, 4)
    assert(StreamingMerge.snapshot(spark, dir).count() === 0L)
    val bucketDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("__bucket=")).toSeq
    assert(bucketDirs.isEmpty, s"stale bucket dirs: $bucketDirs")
  }

  test("replaying the same batch is idempotent (recovery semantics)") {
    val dir = tmp("snap4")
    StreamingMerge.init(base, "id", dir, nBuckets = 8)
    val b = batches.head
    StreamingMerge.applyBatch(b.toDF(), "id", "seq", "op", dir, 8)
    val once = StreamingMerge.snapshot(spark, dir)
      .as[(Long, String)].collect().toMap
    StreamingMerge.applyBatch(b.toDF(), "id", "seq", "op", dir, 8)
    val twice = StreamingMerge.snapshot(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(once === twice)
  }
}
