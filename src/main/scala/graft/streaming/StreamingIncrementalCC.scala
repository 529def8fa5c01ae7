package graft.streaming

import graft.dedup.IncrementalCC
import graft.sources.VersionedTable
import org.apache.hadoop.fs.Path
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
  * State layout is the [[StreamingMerge]] copy-on-write shape on a
  * [[VersionedTable]]: rows hash-bucketed on
  * `__bucket = pmod(xxhash64(component), nBuckets)` directories
  * inside each version's data dir. Per micro-batch:
  *
  *   1. ONE projection-only filter scan finds the components owning a
  *      batch endpoint (broadcast semi-join against the batch-node
  *      set — no shuffle; a second node-keyed index would prune even
  *      this scan, the documented next step if the scan ever
  *      dominates);
  *   2. the touched components' BUCKETS (≤ nBuckets values, collected)
  *      prune the state read at the MANIFEST level;
  *      [[IncrementalCC.merge]] re-resolves just those members + the
  *      batch (star compression, batch-sized);
  *   3. relabeled rows may land in NEW buckets (a fused component
  *      takes the joint min label), so the rewrite set is touched ∪
  *      destination buckets: co-resident untouched rows in those
  *      buckets are rewritten alongside, every OTHER bucket's files
  *      carry into the next version BY REFERENCE, and the batch
  *      becomes visible as ONE manifest commit. A `labels()` reader
  *      racing a trigger therefore sees the previous complete
  *      labeling or the next one, never a mix (the round-12 dynamic-
  *      overwrite layout had a documented torn window between the
  *      partition overwrite and the stale-bucket delete — closed by
  *      this versioned rewrite; superseded versions age out via
  *      [[VersionedTable.gc]]).
  *
  * Exactly-once: [[run]] keys each trigger on its epoch
  * (`cc-epoch-{id}`), so a foreachBatch replay finds the epoch
  * committed and writes nothing; the un-keyed backfill path is
  * content-idempotent (deterministic min-label fixpoint).
  * StreamingIncrementalCCSpec pins stream ≡ batch recompute, replay,
  * and untouched-bucket carry-over. Node ids are BIGINT (the
  * hash-partitioned layout needs a pinned type). */
object StreamingIncrementalCC {

  val BucketCol: String = VersionedBuckets.BucketCol

  private val RowSchema = StructType.fromDDL("id BIGINT, component BIGINT")

  private def bucketOf(c: org.apache.spark.sql.Column, nBuckets: Int) =
    pmod(xxhash64(c), lit(nBuckets.toLong))

  /** Create the empty state: version 1 with no files, schema only.
    * `nBuckets` is pinned here (immutable table property) so a later
    * applyBatch with a different value fails loudly instead of
    * mis-pruning. */
  def init(spark: SparkSession, dir: String, nBuckets: Int = 64): Unit = {
    VersionedBuckets.writeNBuckets(spark, dir, nBuckets)
    VersionedTable.publishFiles(spark, dir, "init", RowSchema.json, Nil)
    ()
  }

  private def readFiles(spark: SparkSession, dir: String,
                        files: Seq[String]): DataFrame =
    if (files.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], RowSchema)
    else spark.read.schema(RowSchema)
      .parquet(files.map(f => new Path(dir, f).toString): _*)

  /** The maintained labeling — the latest committed version. */
  def labels(spark: SparkSession, dir: String): DataFrame =
    VersionedTable.readLatest(spark, dir)

  /** Fold ONE edge batch `(a, b)` into the state at `dir` — the unit
    * foreachBatch applies; also the backfill entry point. Pass
    * `batchId` for replay idempotence ([[run]] keys it on the trigger
    * epoch). */
  def applyBatch(edges: DataFrame, dir: String, nBuckets: Int = 64,
                 batchId: Option[String] = None): Unit = {
    if (edges.isEmpty) return
    val spark = edges.sparkSession
    VersionedBuckets.checkNBuckets(spark, dir, nBuckets)
    val bid = batchId.getOrElse(
      "cc-" + java.util.UUID.randomUUID().toString)
    if (VersionedTable.committedVersionOf(spark, dir, bid).isDefined)
      return
    val m = VersionedTable.latestManifest(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"no CC state at $dir — call init() first"))
    val e = edges.select(col("a").cast("bigint").as("a"),
      col("b").cast("bigint").as("b")).localCheckpoint()
    val batchNodes = e.select(col("a").as("id"))
      .union(e.select(col("b").as("id"))).distinct()
    // 1. touched components: one projection-only scan, broadcast semi
    val comps = readFiles(spark, dir, m.files)
      .join(broadcast(batchNodes), Seq("id"), "left_semi")
      .select(col("component")).distinct().localCheckpoint()
    val touchedBuckets = comps
      .select(bucketOf(col("component"), nBuckets).as("b"))
      .distinct().collect().map(_.getLong(0)).toSet
    // 2. manifest-pruned read + merge of the touched slice
    val touchedFiles = m.files.filter(f =>
      VersionedBuckets.bucketOfPath(f).exists(touchedBuckets))
    val touchedState = readFiles(spark, dir, touchedFiles)
      .join(comps, Seq("component"), "left_semi")
      .select(col("id"), col("component"))
    val relabeled = IncrementalCC.merge(touchedState, e)
      .withColumn(BucketCol, bucketOf(col("component"), nBuckets))
      .localCheckpoint()
    // 3. rewrite touched ∪ destination buckets, carrying co-resident
    // untouched rows; every other bucket's files carry by reference
    val destBuckets = relabeled.select(col(BucketCol)).distinct()
      .collect().map(_.getLong(0)).toSet
    val allBuckets = touchedBuckets ++ destBuckets
    val (rewriteFiles, carried) = m.files.partition(f =>
      VersionedBuckets.bucketOfPath(f).exists(allBuckets))
    val keepRows = readFiles(spark, dir, rewriteFiles)
      .join(comps, Seq("component"), "left_anti")
      .withColumn(BucketCol, bucketOf(col("component"), nBuckets))
    val newContent = keepRows
      .unionByName(relabeled.select(col("id"), col("component"),
        col(BucketCol)))
    val newFiles = VersionedBuckets.writeBucketed(newContent, dir)
    // optimistic commit on the base version (see StreamingMerge):
    // a racing writer's labels must abort us, never be lost
    VersionedTable.publishFilesIfUnchanged(spark, dir, bid, m.schemaJson,
      carried ++ newFiles, expectedBaseVersion = m.version)
    ()
  }

  /** Start the maintainer: every micro-batch of `edgeStream(a, b)`
    * folds into the labeling at `dir`, exactly once per epoch across
    * restarts. */
  def run(edgeStream: DataFrame, dir: String, checkpointDir: String,
          nBuckets: Int = 64): StreamingQuery =
    edgeStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        applyBatch(batch, dir, nBuckets, Some(s"cc-epoch-$epochId"))
      }
      .start()
}
