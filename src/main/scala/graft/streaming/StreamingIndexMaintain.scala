package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** STREAMING INDEX MAINTENANCE — keep the persisted serving indexes
  * current under a continuous document/vector feed (the streaming twin
  * of the round-10 `merge` family, shaped like [[StreamingMerge]]):
  * each micro-batch folds into the index through the SAME incremental
  * merge the nightly batch path uses, so stream-maintained state
  * provably equals the batch-merged index — and, transitively through
  * each merge's own spec, equals a one-shot rebuild over everything
  * seen (StreamingIndexMaintainSpec asserts the lexical chain
  * end-to-end).
  *
  * Per-micro-batch cost is the merge's: batch-sized tokenize/band/
  * assign + a batch-sized bucketed APPEND; the indexed corpus is never
  * re-read. The same caveats transfer — doc ids must be NEW (replays
  * of a FAILED micro-batch can double-append: `foreachBatch` is
  * at-least-once for side effects, so exactly-once here needs the
  * caller to keep batch ids idempotent, e.g. a processed-batch ledger
  * next to the index — the standard foreachBatch contract, documented
  * rather than hidden), and many appends warrant the periodic
  * bucketed REWRITE described on
  * [[graft.sources.TableSink.appendBucketed]].
  */
object StreamingIndexMaintain {

  /** Maintain a [[graft.text.LexicalIndex]] under a document stream:
    * every micro-batch of `docStream` (idCol, textCol) merges into the
    * index at (`table`, `path`). The index must exist
    * ([[graft.text.LexicalIndex.write]]). */
  def runLexical(docStream: DataFrame, idCol: String, textCol: String,
                 table: String, path: String, checkpointDir: String,
                 numBuckets: Int = 32): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.text.LexicalIndex.merge(batch.sparkSession, table, path,
          batch, idCol, textCol, numBuckets)
      }
      .start()

  /** Maintain a [[graft.dedup.MinHashIndex]] bucket set under a
    * document stream — each micro-batch's new buckets append. */
  def runMinHash(docStream: DataFrame, idCol: String, textCol: String,
                 table: String, checkpointDir: String,
                 numHashes: Int = 16, bands: Int = 4,
                 shingleSize: Int = 1, seed: Long = 42L,
                 numBuckets: Int = 32): StreamingQuery =
    docStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.dedup.MinHashIndex.merge(batch.sparkSession, table, batch,
          idCol, textCol, numHashes, bands, shingleSize, seed, numBuckets)
      }
      .start()

  /** Maintain an [[graft.similarity.IvfIndex]] under a vector stream —
    * frozen-centroid assignment + append per micro-batch (the FAISS
    * add-under-frozen-quantizer model; re-fit policy on
    * [[graft.similarity.IvfIndex.merge]]). */
  def runIvf(vecStream: DataFrame, idCol: String, vecCol: String,
             table: String, path: String, checkpointDir: String,
             numBuckets: Int = 32): StreamingQuery =
    vecStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.similarity.IvfIndex.merge(batch.sparkSession, table, path,
          batch, idCol, vecCol, numBuckets)
      }
      .start()

  /** Maintain a [[graft.impute.KnnImpute]] donor index under a row
    * stream — fully-featured donor rows (non-null target + features)
    * assign to frozen cells and append; rows that are not valid
    * donors are skipped by the merge itself.
    *
    * Serving-session caveat (applies to every maintainer here): the
    * merge refreshes the MICRO-BATCH session's table-metadata cache;
    * any OTHER session serving from the catalog table must
    * `spark.catalog.refreshTable(table)` before it sees the new
    * files — standard Spark catalog-cache semantics. */
  def runKnnDonor(rowStream: DataFrame, idCol: String, targetCol: String,
                  featureCols: Seq[String], table: String, path: String,
                  checkpointDir: String,
                  numBuckets: Int = 32): StreamingQuery =
    rowStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.impute.KnnImpute.mergeDonorIndex(batch.sparkSession, table,
          path, batch, idCol, targetCol, featureCols, numBuckets)
      }
      .start()
}
