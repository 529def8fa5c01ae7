package graft.streaming

import graft.dedup.IncrementalCC
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** STREAMING CONNECTED-COMPONENTS MAINTENANCE — the serving loop over
  * [[IncrementalCC]]: near-dup edge batches arrive continuously
  * (banded LSH pairs from the ingest stream), and the persisted
  * `(id, component)` labeling must absorb each batch without
  * re-paying the corpus CC — the nightly-dedup cost the batch
  * operator's contract eliminates, run as a stream.
  *
  * State layout is the [[StreamingMerge]] copy-on-write shape:
  * parquet hash-partitioned on `__bucket = pmod(xxhash64(component),
  * nBuckets)`. Per micro-batch:
  *
  *   1. ONE projection-only filter scan finds the components owning a
  *      batch endpoint (broadcast semi-join against the batch-node
  *      set — no shuffle; a second node-keyed index would prune even
  *      this scan, the documented next step if the scan ever
  *      dominates);
  *   2. the touched components' BUCKETS (≤ nBuckets values, collected)
  *      prune the state read; [[IncrementalCC.merge]] re-resolves just
  *      those members + the batch (star compression, batch-sized);
  *   3. relabeled rows may land in NEW buckets (a fused component
  *      takes the joint min label), so the rewrite set is touched ∪
  *      destination buckets: co-resident untouched rows are carried,
  *      partitions rewrite via per-write dynamic overwrite, and
  *      source buckets whose rows all moved are dropped explicitly
  *      (the StreamingMerge stale-bucket census).
  *
  * Replay idempotence: re-applying a batch re-resolves the same
  * touched components to the same labels (deterministic min-label
  * fixpoint), rewriting identical bucket contents — safe under
  * foreachBatch's at-least-once recovery. Node ids are BIGINT (the
  * hash-partitioned layout needs a pinned type).
  * StreamingIncrementalCCSpec pins stream ≡ batch recompute, replay,
  * and untouched-bucket byte-stability. */
object StreamingIncrementalCC {

  val BucketCol = "__bucket"

  private val Schema = StructType.fromDDL(
    s"id BIGINT, component BIGINT, $BucketCol BIGINT")

  private def bucketOf(c: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(c), lit(nBuckets.toLong))

  /** Create an empty state directory (schema-only). */
  def init(spark: SparkSession, dir: String): Unit = {
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new org.apache.hadoop.fs.Path(dir))
  }

  private def readState(spark: SparkSession, dir: String): DataFrame =
    spark.read.schema(Schema).parquet(dir)

  /** The maintained labeling (without the bucket column). */
  def labels(spark: SparkSession, dir: String): DataFrame =
    readState(spark, dir).select(col("id"), col("component"))

  /** Fold ONE edge batch `(a, b)` into the state at `dir` — the unit
    * foreachBatch applies; also the backfill entry point. */
  def applyBatch(edges: DataFrame, dir: String, nBuckets: Int = 64): Unit = {
    if (edges.isEmpty) return
    val spark = edges.sparkSession
    val e = edges.select(col("a").cast("bigint").as("a"),
      col("b").cast("bigint").as("b")).localCheckpoint()
    val batchNodes = e.select(col("a").as("id"))
      .union(e.select(col("b").as("id"))).distinct()
    // 1. touched components: one projection-only scan, broadcast semi
    val comps = readState(spark, dir)
      .join(broadcast(batchNodes), Seq("id"), "left_semi")
      .select(col("component")).distinct().localCheckpoint()
    val touchedBuckets = comps
      .select(bucketOf(col("component"), nBuckets).as("b"))
      .distinct().collect().map(_.getLong(0)).toSet
    // 2. pruned read + merge of the touched slice
    val current = readState(spark, dir)
      .filter(col(BucketCol).isin(touchedBuckets.toSeq.map(Long.box): _*))
      .localCheckpoint()
    val touchedState = current
      .join(comps, Seq("component"), "left_semi")
      .select(col("id"), col("component"))
    val relabeled = IncrementalCC.merge(touchedState, e)
      .withColumn(BucketCol, bucketOf(col("component"), nBuckets))
      .localCheckpoint()
    // 3. rewrite touched ∪ destination buckets, carrying co-resident
    // untouched rows; drop source buckets that emptied out
    val destBuckets = relabeled.select(col(BucketCol)).distinct()
      .collect().map(_.getLong(0)).toSet
    val allBuckets = (touchedBuckets ++ destBuckets).toSeq.sorted
    val keepRows = readState(spark, dir)
      .filter(col(BucketCol).isin(allBuckets.map(Long.box): _*))
      .join(comps, Seq("component"), "left_anti")
      .select(col("id"), col("component"), col(BucketCol))
    val newContent = keepRows
      .unionByName(relabeled.select(col("id"), col("component"),
        col(BucketCol)))
      .persist()
    try {
      val remaining = newContent.select(col(BucketCol)).distinct()
        .collect().map(_.getLong(0)).toSet // materializes before write
      newContent.repartition(col(BucketCol))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BucketCol).parquet(dir)
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      allBuckets.filterNot(remaining).foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$BucketCol=$b"), true)
      }
    } finally newContent.unpersist()
  }

  /** Start the maintainer: every micro-batch of `edgeStream(a, b)`
    * folds into the labeling at `dir`. */
  def run(edgeStream: DataFrame, dir: String, checkpointDir: String,
          nBuckets: Int = 64): StreamingQuery =
    edgeStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, dir, nBuckets)
      }
      .start()
}
