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
}
