package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Layout-aware parquet sinks — the write-side half of the 100 TB
  * posture. Reading the right layout is free (`Tables` + Catalyst
  * pruning); WRITING the right layout is what makes the next thousand
  * queries cheap:
  *
  *  - `writePartitioned`: hive-style directory partitioning on a
  *    low-cardinality column (region, date, modality). Scans with a
  *    partition predicate prune whole directories — asserted in
  *    TableSinkSpec via the scan's PartitionFilters.
  *  - `writeBucketed`: fixed-bucket layout on a join/agg key.
  *    Same-bucketed tables joined on the bucket key sort-merge WITHOUT
  *    a shuffle on either side (asserted: zero Exchange in the plan) —
  *    at 100 TB this converts every recurring fact⋈fact join from a
  *    full network shuffle into a local merge. Bucket counts should be
  *    sized so bucket × file ≈ 128–512 MB; bucketing metadata lives in
  *    the catalog, so these write `saveAsTable` (path-addressed
  *    parquet cannot carry bucket specs).
  */
object TableSink {

  /** Directory-partitioned parquet at `path` (external location). */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Bucketed (and bucket-sorted) catalog table named `table`, stored
    * at `path`. Sorting within buckets makes the downstream sort-merge
    * join skip its sort too. */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    bucketCols: Seq[String], numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** APPEND a batch to an existing bucketed table — the incremental-
    * maintenance write: each append lands one new (bucketed, sorted)
    * file set scaled to the BATCH, existing files are untouched bytes,
    * and readers keep the no-Exchange bucketed join because the bucket
    * spec is unchanged (Spark rejects a mismatched spec at write
    * time). Many appends accumulate one file per bucket per batch;
    * bound that with a periodic [[writeBucketed]] REWRITE of the table
    * into a fresh location + catalog swap — NOT [[compact]], whose
    * plain parquet rewrite discards the bucket-id file mapping and
    * would silently demote every downstream join back to a shuffle. */
  def appendBucketed(df: DataFrame, table: String,
                     bucketCols: Seq[String], numBuckets: Int): Unit =
    df.write.mode(SaveMode.Append)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** COMPACTION — the small-files fix every long-lived ingest needs:
    * streaming sinks, per-batch CDC rewrites and fine-grained
    * partitions leave thousands of KB-sized parquet files, and at
    * 100 TB the per-file open/footer/task overhead comes to dominate
    * scans (and object-store listing). Rewrites `srcDir` to `dstDir`
    * with file count chosen from the MEASURED input bytes
    * (`ceil(bytes / targetBytes)`, so output files land near the
    * 128–512 MB sweet spot), preserving the row data bit-for-bit.
    * One shuffle-less coalesce when shrinking file count — plus an
    * optional `sortCol` to restore clustering (z-key, time), which
    * upgrades the coalesce to a range repartition.
    * Returns (filesBefore, filesAfter).
    *
    * CONCURRENCY: this is the RAW-DIRECTORY utility — `dstDir` is
    * replaced wholesale, so it must not be a location concurrent
    * readers resolve. For any table other jobs read while compaction
    * runs, use [[VersionedTable.compact]] (new version per
    * compaction, one atomic manifest commit, old versions retained
    * until gc) or [[graft.streaming.StreamingMerge.compact]] for
    * bucket-partitioned merge snapshots — since round 13 no graft
    * sink needs to rewrite readable files in place. */
  def compact(spark: org.apache.spark.sql.SparkSession, srcDir: String,
              dstDir: String, targetBytes: Long = 256L << 20,
              sortCol: Option[String] = None): (Int, Int) = {
    require(targetBytes > 0, "targetBytes must be positive")
    def dataFiles(dir: String): Seq[org.apache.hadoop.fs.FileStatus] = {
      val p = new org.apache.hadoop.fs.Path(dir)
      // filesystem FROM the path (FileSystem.get = default scheme only,
      // wrong for the object-store tables this is written for)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      val out = Seq.newBuilder[org.apache.hadoop.fs.FileStatus]
      while (it.hasNext) {
        val f = it.next()
        if (!f.getPath.getName.startsWith("_")) out += f
      }
      out.result()
    }
    val before = dataFiles(srcDir)
    val nOut = math.max(1,
      math.ceil(before.map(_.getLen).sum.toDouble / targetBytes).toInt)
    val df = spark.read.parquet(srcDir)
    val laid = sortCol match {
      case Some(c) => df.repartitionByRange(nOut,
        org.apache.spark.sql.functions.col(c))
      case None    => df.coalesce(nOut)
    }
    laid.write.mode(SaveMode.Overwrite).parquet(dstDir)
    (before.size, dataFiles(dstDir).size)
  }
}
