package graft.dedup

import graft.sources.TableSink
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted MinHash-LSH index — the near-dup family's analog of
  * [[graft.similarity.IvfIndex]], and the 100 TB SERVING shape for
  * incremental crawl dedup. `StreamingNearDedup.incrementalKept`
  * re-shingles, re-signs and re-bands the ENTIRE reference corpus on
  * every nightly batch: right for a one-shot query, wrong when the
  * reference is 100 TB and tonight's batch is 100 GB. This splits the
  * phases:
  *
  *  - [[write]]: band the reference once
  *    ([[MinHashDedup.portableBandedDocs]] — the same portable-hash
  *    pipeline every incremental/online query uses), reduce it to the
  *    DISTINCT bucket set (the compact incremental state: one short
  *    string per occupied band bucket, orders of magnitude smaller
  *    than the corpus), and persist it as a catalog table BUCKETED on
  *    `bucket` via [[TableSink.writeBucketed]].
  *  - [[incrementalKept]]: band only the BATCH and left-join its
  *    claims against the bucketed table. The persisted side's layout
  *    IS the join partitioning, so the index is read in place with no
  *    Exchange (MinHashIndexSpec asserts it on the executed plan);
  *    only the batch claims shuffle to meet it, and the within-batch
  *    first-wins rule reuses that same partitioning.
  *
  * Served keeps are IDENTICAL to a fresh
  * `StreamingNearDedup.incrementalKept` recompute with the same
  * parameters (same banding ⇒ same buckets ⇒ same claims; the serve
  * path is literally shared — MinHashIndexSpec asserts row equality),
  * so the persisted variant inherits the exact DuckDB oracle.
  *
  * Appending a new day is an idempotent union — [[merge]]: band only
  * the batch, anti-join against the persisted set (an equi-join the
  * bucketed layout serves with no index-side Exchange), and APPEND the
  * genuinely-new buckets. The bucket set only grows and yesterday's
  * keeps are never re-decided, so (write ∪ merge) ≡ a one-shot write
  * of the union corpus EXACTLY (banding is per-document; the distinct
  * bucket set of a union is the union of bucket sets) —
  * MinHashIndexSpec pins it. Per-batch cost scales with the batch,
  * never the reference.
  */
object MinHashIndex {

  /** Band the reference corpus and persist its distinct bucket set,
    * bucketed + sorted on `bucket`. `table` is the catalog name
    * (bucketing metadata must live in a catalog — path-addressed
    * parquet cannot carry bucket specs); `numBuckets` should put
    * bucket × file around 128–512 MB at the target scale. */
  def write(reference: DataFrame, idCol: String, textCol: String,
            table: String, path: String, numHashes: Int = 16,
            bands: Int = 4, shingleSize: Int = 1, seed: Long = 42L,
            numBuckets: Int = 32): Unit = {
    val refBuckets = MinHashDedup.portableBandedDocs(reference, idCol,
        textCol, numHashes, bands, shingleSize, seed)
      .select(explode(col("buckets")).as("bucket")).distinct()
    TableSink.writeBucketed(refBuckets, table, path, Seq("bucket"),
      numBuckets)
  }

  /** INCREMENTALLY fold new (typically: kept) documents into the
    * persisted bucket set — the nightly-append path that retires the
    * full re-[[write]]: band ONLY the batch, keep the buckets not
    * already indexed (a left-anti equi-join the bucketed layout
    * serves in place), and append them as one batch-sized bucketed
    * file set ([[TableSink.appendBucketed]] — existing files are
    * untouched bytes, the bucket spec and the serve path's
    * zero-Exchange join survive). Banding parameters must match the
    * index's. Exact by construction: the distinct bucket set of
    * `reference ∪ batch` IS `old set ∪ batch's new buckets`
    * (MinHashIndexSpec pins (write ∪ merge) ≡ one-shot rebuild).
    * After many appends, [[TableSink.compact]] bounds per-bucket file
    * counts. */
  def merge(spark: SparkSession, table: String, newDocs: DataFrame,
            idCol: String, textCol: String, numHashes: Int = 16,
            bands: Int = 4, shingleSize: Int = 1, seed: Long = 42L,
            numBuckets: Int = 32): Unit = {
    if (newDocs.isEmpty) return
    val batchBuckets = MinHashDedup.portableBandedDocs(newDocs, idCol,
        textCol, numHashes, bands, shingleSize, seed)
      .select(explode(col("buckets")).as("bucket")).distinct()
    val fresh = batchBuckets
      .join(spark.table(table), Seq("bucket"), "left_anti")
    TableSink.appendBucketed(fresh, table, Seq("bucket"), numBuckets)
    spark.catalog.refreshTable(table)
  }

  /** Incremental near-dup keeps for `batch` against the PERSISTED
    * reference bucket set — no reference re-scan, no re-banding. The
    * banding parameters must match the ones the index was written
    * with (same contract as IvfIndex: the index pins the geometry). */
  def incrementalKept(spark: SparkSession, table: String,
                      batch: DataFrame, idCol: String, textCol: String,
                      numHashes: Int = 16, bands: Int = 4,
                      shingleSize: Int = 1, seed: Long = 42L): DataFrame =
    graft.streaming.StreamingNearDedup.incrementalKeptAgainstBuckets(
      batch, spark.table(table), idCol, textCol, numHashes, bands,
      shingleSize, seed)
}
