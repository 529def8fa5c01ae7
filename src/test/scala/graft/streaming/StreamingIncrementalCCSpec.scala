package graft.streaming

import graft.SparkSpec
import graft.dedup.IncrementalCC
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

case class Edge(a: Long, b: Long)

/** Streaming CC maintenance: edge batches folded micro-batch by
  * micro-batch must leave exactly the labels the one-shot batch CC of
  * the union produces, rewriting only the component buckets each
  * batch touches. */
class StreamingIncrementalCCSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def labelsOf(dir: String): Map[Long, Long] =
    StreamingIncrementalCC.labels(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private val batches: Seq[Seq[Edge]] = Seq(
    // batch 1: three components
    Seq(Edge(1, 2), Edge(2, 3), Edge(10, 11), Edge(20, 21)),
    // batch 2: grow {1,2,3}, fuse {10,11} with {20,21}, new {100,101}
    Seq(Edge(3, 4), Edge(11, 20), Edge(100, 101)),
    // batch 3: fuse everything except {100,101}
    Seq(Edge(4, 10)))

  test("stream-maintained labels equal the one-shot batch CC of the " +
    "union, batch by batch") {
    val dir = tmp("scc"); val ck = tmp("scc_ck")
    StreamingIncrementalCC.init(spark, dir, nBuckets = 8)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Edge]
    val q = StreamingIncrementalCC.run(input.toDF(), dir, ck, nBuckets = 8)
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    val streamed = labelsOf(dir)
    val recomputed = IncrementalCC.cc(batches.flatten.toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed === recomputed)
    assert(streamed(21L) === 1L, "everything except {100,101} fused to 1")
    assert(streamed(101L) === 100L)
  }

  test("replayed batch is idempotent (foreachBatch at-least-once)") {
    val dir = tmp("scc_rep")
    StreamingIncrementalCC.init(spark, dir, nBuckets = 8)
    StreamingIncrementalCC.applyBatch(
      Seq(Edge(1, 2), Edge(5, 6)).toDF(), dir, nBuckets = 8)
    val once = labelsOf(dir)
    StreamingIncrementalCC.applyBatch(
      Seq(Edge(1, 2), Edge(5, 6)).toDF(), dir, nBuckets = 8)
    assert(labelsOf(dir) === once)
  }

  test("a batch rewrites only touched and destination buckets; " +
    "untouched buckets' files carry over by reference") {
    val dir = tmp("scc_cow")
    StreamingIncrementalCC.init(spark, dir, nBuckets = 16)
    // seed: 50 two-node components spread over 16 buckets
    StreamingIncrementalCC.applyBatch(
      (0L until 100L by 2L).map(i => Edge(i, i + 1)).toDF(), dir,
      nBuckets = 16)
    def bucketFiles(): Map[String, Set[String]] =
      graft.sources.VersionedTable.latestManifest(spark, dir).get.files
        .groupBy(f => "__bucket=([0-9]+)".r.findFirstIn(f).get)
        .map { case (b, fs) => b -> fs.toSet }
    val before = bucketFiles()
    // touch ONE component (0-1) by fusing it with a new node
    StreamingIncrementalCC.applyBatch(
      Seq(Edge(1L, 1000L)).toDF(), dir, nBuckets = 16)
    val after = bucketFiles()
    // expected rewrite set: the bucket of component 0 (touched AND
    // destination — the fused label stays 0)
    val expected = spark.range(1)
      .select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.lit(0L)),
        org.apache.spark.sql.functions.lit(16L)).as("b"))
      .head().getLong(0)
    val changed = (before.keySet ++ after.keySet).filter(k =>
      before.get(k) != after.get(k))
    assert(changed === Set(s"__bucket=$expected"),
      s"only component 0's bucket may change, got $changed")
    // untouched buckets reference the exact same files — written once,
    // never rewritten in place
    (before.keySet - s"__bucket=$expected").foreach { b =>
      assert(after(b) === before(b), s"bucket $b files must carry over")
    }
    // correctness on the touched component
    val m = labelsOf(dir)
    assert(m(1000L) === 0L && m(1L) === 0L && m(98L) === 98L)
  }

  test("epoch-keyed replay is a version-level no-op; a reader racing " +
    "a trigger sees a complete labeling (atomic manifest swap)") {
    val dir = tmp("scc_epoch")
    StreamingIncrementalCC.init(spark, dir, nBuckets = 8)
    StreamingIncrementalCC.applyBatch(
      Seq(Edge(1, 2), Edge(5, 6)).toDF(), dir, nBuckets = 8,
      batchId = Some("cc-epoch-0"))
    val vs = graft.sources.VersionedTable.versions(spark, dir)
    val once = labelsOf(dir)
    StreamingIncrementalCC.applyBatch(
      Seq(Edge(1, 2), Edge(5, 6)).toDF(), dir, nBuckets = 8,
      batchId = Some("cc-epoch-0"))
    assert(labelsOf(dir) === once)
    assert(graft.sources.VersionedTable.versions(spark, dir) === vs,
      "a replayed epoch must not append a version")
  }

  test("empty batch is a no-op; state starts empty and first batch " +
    "is a plain cc") {
    val dir = tmp("scc_empty")
    StreamingIncrementalCC.init(spark, dir, nBuckets = 8)
    StreamingIncrementalCC.applyBatch(
      Seq.empty[Edge].toDF(), dir, nBuckets = 8)
    assert(StreamingIncrementalCC.labels(spark, dir).count() === 0L)
    StreamingIncrementalCC.applyBatch(Seq(Edge(7, 8)).toDF(), dir,
      nBuckets = 8)
    assert(labelsOf(dir) === Map(7L -> 7L, 8L -> 7L))
  }

  test("a mismatched nBuckets fails loudly instead of mis-pruning") {
    val dir = tmp("scc_nb")
    StreamingIncrementalCC.init(spark, dir, nBuckets = 8)
    val ex = intercept[IllegalArgumentException] {
      StreamingIncrementalCC.applyBatch(
        Seq(Edge(1, 2)).toDF(), dir, nBuckets = 16)
    }
    assert(ex.getMessage.contains("nBuckets mismatch"))
  }
}
