package graft.streaming

import graft.operators.MergeUpsert
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING CDC MATERIALIZATION — keep a queryable snapshot table up
  * to date under a continuous changelog (the streaming twin of
  * [[graft.operators.MergeUpsert]]): upserts and deletes arrive as a
  * stream, `foreachBatch` folds each micro-batch into the stored
  * snapshot with the same latest-wins merge the batch operator uses —
  * so stream-maintained state provably equals the one-shot batch merge
  * of the same changelog (StreamingMergeSpec asserts it).
  *
  * The 100 TB shape is INCREMENTAL, not read-modify-write of the
  * world: the snapshot is stored hash-partitioned on the id
  * (`__bucket = pmod(xxhash64(id), nBuckets)` directories), and each
  * micro-batch
  *
  *   1. computes the distinct buckets its ids touch (≤ nBuckets rows,
  *      broadcast back as an IN-filter),
  *   2. reads ONLY those partitions of the snapshot — partition
  *      pruning on the directory column, so a batch touching 0.1% of
  *      buckets reads 0.1% of the table,
  *   3. merges and rewrites ONLY those partitions via dynamic
  *      partition overwrite.
  *
  * Per-batch cost is O(changed buckets × bucket size), not
  * O(snapshot): the copy-on-write granularity every table format
  * (Delta/Iceberg/Hudi) uses, expressed with plain Spark partitioned
  * parquet. Unchanged buckets' files are untouched bytes on disk
  * (also asserted in the spec).
  *
  * Exactly-once: foreachBatch can re-run a batch on recovery; the
  * merge is idempotent for a replayed batch (same seq → same
  * latest-wins outcome), so a re-applied micro-batch rewrites the same
  * bucket contents.
  */
object StreamingMerge {

  val BucketCol = "__bucket"

  private def bucketOf(idCol: String, nBuckets: Int) =
    pmod(xxhash64(col(idCol)), lit(nBuckets.toLong))

  /** Materialize `base` as the initial bucketed snapshot at `dir`.
    * The schema is also persisted as an underscore-prefixed sidecar
    * (ignored by Spark's file listing, like _SUCCESS) so the table
    * stays readable even when a changelog deletes every row — zero
    * data files would otherwise leave nothing to infer a schema from. */
  def init(base: DataFrame, idCol: String, dir: String,
           nBuckets: Int = 64): Unit = {
    val withB = base.withColumn(BucketCol, bucketOf(idCol, nBuckets))
    withB.repartition(col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(dir)
    // resolve the filesystem FROM the path: FileSystem.get returns the
    // DEFAULT scheme and breaks for any table on s3a://, file://, etc.
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      base.sparkSession.sparkContext.hadoopConfiguration)
    val out = fs.create(
      new org.apache.hadoop.fs.Path(s"$dir/$SchemaFile"), true)
    try out.write(withB.schema.json.getBytes("UTF-8")) finally out.close()
  }

  private val SchemaFile = "_graft_schema.json"

  private def readWithSchema(spark: SparkSession, dir: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/$SchemaFile")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    val json = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    val schema = org.apache.spark.sql.types.DataType.fromJson(json)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    spark.read.schema(schema).parquet(dir)
  }

  /** Read the maintained snapshot (without the bucket column). */
  def snapshot(spark: SparkSession, dir: String): DataFrame =
    readWithSchema(spark, dir).drop(BucketCol)

  /** Fold ONE changelog batch into the snapshot at `dir` — the unit
    * foreachBatch applies; also the backfill entry point for a batch
    * changelog. */
  def applyBatch(batch: DataFrame, idCol: String, seqCol: String,
                 opCol: String, dir: String, nBuckets: Int = 64): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val withBucket = batch.withColumn(BucketCol, bucketOf(idCol, nBuckets))
    // the touched-bucket set is ≤ nBuckets values — driver-bounded by
    // construction, never by data volume
    val touched = withBucket.select(BucketCol).distinct()
      .collect().map(_.getLong(0)).sorted
    val current = readWithSchema(spark, dir)
      .filter(col(BucketCol).isin(touched.map(Long.box): _*))
    val merged = MergeUpsert.merge(
      current.drop(BucketCol),
      withBucket.drop(BucketCol), idCol, seqCol, opCol)
      .withColumn(BucketCol, bucketOf(idCol, nBuckets))
      .persist()
    try {
      // MATERIALIZE the merge before overwriting the directory it was
      // read from — the remaining-bucket collect below runs the plan
      // to completion, so the subsequent write consumes the cache, not
      // the files it is about to replace. (Relying on lazy cache
      // substitution here would make self-overwrite safety an
      // implementation detail.) The collect is bounded: ≤ nBuckets
      // rows. Doubles as the stale-bucket census — dynamic overwrite
      // only replaces partitions PRESENT in the output, so a bucket
      // whose every row was deleted writes nothing and must have its
      // directory dropped explicitly.
      val remaining = merged.select(BucketCol).distinct()
        .collect().map(_.getLong(0)).toSet
      // per-WRITE dynamic mode, not the session conf: a session-global
      // set/restore races with concurrent writers in the same session
      // (a restore flipping the mode to static mid-plan would turn the
      // scoped overwrite into whole-table deletion)
      merged.repartition(col(BucketCol))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(BucketCol).parquet(dir)
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      touched.filterNot(remaining).foreach { b =>
        fs.delete(new org.apache.hadoop.fs.Path(s"$dir/$BucketCol=$b"), true)
      }
    } finally merged.unpersist()
  }

  /** Start the maintainer: every micro-batch of `changeStream` folds
    * into the snapshot at `dir`. The snapshot must exist ([[init]]). */
  def run(changeStream: DataFrame, idCol: String, seqCol: String,
          opCol: String, dir: String, checkpointDir: String,
          nBuckets: Int = 64): StreamingQuery =
    changeStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, idCol, seqCol, opCol, dir, nBuckets)
      }
      .start()
}
