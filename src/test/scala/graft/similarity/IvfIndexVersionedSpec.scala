package graft.similarity

import graft.{SparkSpec, Tables}
import graft.sources.AtomicPointer
import org.apache.spark.sql.functions._

/** Atomic index swaps: a rebuild never disturbs the serving version;
  * readers that resolved the old version finish on it; GC drops
  * drained versions (catalog table + storage + pointer slot). */
class IvfIndexVersionedSpec extends SparkSpec {

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("ivf_versioned").toString

  test("publish, serve, rebuild, swap: new readers see v2, a v1 " +
    "reader finishes on v1; gc drops v1's table and path") {
    val embs = Tables.embeddings(spark, sf0001).localCheckpoint()
    val d1 = embs.filter(col("vec_id") % 3 =!= 0)
    val v1 = IvfIndexVersioned.publishBuild(d1, "vec_id", "embedding",
      baseTable = "ivf_ver_spec", dir = tmp, numCentroids = 4,
      numBuckets = 4)
    assert(v1 === 1L)
    val queries = embs.limit(10).localCheckpoint()
    val served1 = IvfIndexVersioned.topK(spark, tmp, queries,
      "vec_id", "embedding", k = 3, nProbe = 4)
    assert(served1.count() > 0)
    val (t1, p1) = IvfIndexVersioned.resolve(spark, tmp)

    // rebuild on the FULL corpus: a fresh table/path, atomic swap
    val v2 = IvfIndexVersioned.publishBuild(embs, "vec_id", "embedding",
      baseTable = "ivf_ver_spec", dir = tmp, numCentroids = 4,
      numBuckets = 4)
    assert(v2 === 2L)
    val (t2, p2) = IvfIndexVersioned.resolve(spark, tmp)
    assert(t2 != t1 && p2 != p1, "rebuild must not reuse v1's identity")
    // new readers: the v2 index includes the vec_id % 3 == 0 vectors
    val served2 = IvfIndexVersioned.topK(spark, tmp, queries,
      "vec_id", "embedding", k = 3, nProbe = 4)
    val v2Neighbors = served2.filter(col("b") % 3 === 0).count()
    assert(v2Neighbors > 0, "v2 must serve the newly indexed vectors")
    // a reader that resolved v1 before the swap still works — v1's
    // table and files are untouched by the rebuild
    val (t1b, p1b) = IvfIndexVersioned.resolveAsOf(spark, tmp, 1L)
    assert((t1b, p1b) === (t1, p1))
    val lateV1 = IvfIndex.topK(spark, t1b, p1b, queries,
      "vec_id", "embedding", k = 3, nProbe = 4)
    assert(lateV1.filter(col("b") % 3 === 0).count() === 0L,
      "v1 must still serve exactly the v1 corpus")

    // gc: v1's catalog table, storage, and pointer slot all go
    val dropped = IvfIndexVersioned.gc(spark, tmp, keepLast = 1)
    assert(dropped === Seq(1L))
    assert(!spark.catalog.tableExists(t1))
    val fs = new org.apache.hadoop.fs.Path(p1).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(p1)))
    intercept[NoSuchElementException] {
      IvfIndexVersioned.resolveAsOf(spark, tmp, 1L)
    }
    // current still serves
    assert(IvfIndexVersioned.topK(spark, tmp, queries,
      "vec_id", "embedding", k = 3, nProbe = 4).count() > 0)
  }

  test("pointer history is ordered and current follows the last " +
    "publish; torn stub is invisible") {
    val dir = java.nio.file.Files.createTempDirectory("ptr").toString
    assert(AtomicPointer.current(spark, dir).isEmpty)
    AtomicPointer.publish(spark, dir, "a")
    AtomicPointer.publish(spark, dir, "b")
    assert(AtomicPointer.history(spark, dir) ===
      Seq((1L, "a"), (2L, "b")))
    assert(AtomicPointer.current(spark, dir) === Some("b"))
    // unterminated stub: reserved slot 3 with no terminator
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val o = fs.create(new org.apache.hadoop.fs.Path(s"$dir/_pointer/3"),
      false)
    o.write("version=3\nvalue=torn\n".getBytes); o.close()
    assert(AtomicPointer.current(spark, dir) === Some("b"),
      "a torn pointer write must be invisible")
    // next publish skips the reserved slot
    assert(AtomicPointer.publish(spark, dir, "c") === 4L)
    assert(AtomicPointer.current(spark, dir) === Some("c"))
    // gc trims history AND the stub
    AtomicPointer.gc(spark, dir, keepLast = 1)
    assert(AtomicPointer.history(spark, dir) === Seq((4L, "c")))
  }
}
