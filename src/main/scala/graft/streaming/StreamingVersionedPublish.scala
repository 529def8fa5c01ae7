package graft.streaming

import graft.sources.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

/** EXACTLY-ONCE STREAMING PUBLISH — the streaming consumer
  * [[VersionedTable]]'s batchId idempotence exists for: foreachBatch
  * gives at-least-once batch delivery (a crashed trigger re-runs its
  * batch on recovery), and a plain parquet append would duplicate the
  * replayed rows. Publishing each micro-batch as one ATOMIC VERSION
  * keyed on the epoch id upgrades that to exactly-once:
  *
  *  - first delivery: data files land invisibly, the manifest commit
  *    makes the version appear atomically (a reader never sees a
  *    half-written batch — the torn-write contract);
  *  - replay: `publish` finds the epoch's batchId already committed
  *    and returns the existing version without writing a byte.
  *
  * The table is an APPEND LOG of batch-versions: `readAsOf(N)` is one
  * micro-batch, [[readLog]] unions every committed version (the full
  * stream content so far — version count stays bounded via
  * [[VersionedTable.gc]] retention, or compact old versions into one
  * via publish-of-the-union then gc). For maintained SNAPSHOT state
  * under a changelog use [[StreamingMerge]] (bucketed copy-on-write);
  * this sink owns the immutable-log shape.
  *
  * Scale: per trigger one batch-sized write + one small-file commit;
  * nothing rescans history. StreamingVersionedPublishSpec pins replay
  * idempotence and log ≡ input. */
object StreamingVersionedPublish {

  /** Fold ONE micro-batch into the versioned log — the unit
    * foreachBatch applies (exposed for replay tests and backfills).
    * Empty batches publish nothing (no empty versions). */
  def applyBatch(batch: DataFrame, epochId: Long, dir: String): Unit = {
    if (!batch.isEmpty) {
      VersionedTable.publish(batch, dir, s"stream-epoch-$epochId")
      ()
    }
  }

  /** Start the publisher: each micro-batch commits as one version at
    * `dir`, exactly once per epoch across restarts. */
  def run(stream: DataFrame, dir: String,
          checkpointDir: String): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        applyBatch(batch, epochId, dir)
      }
      .start()

  /** The full published log: union of every committed version (each
    * read from its manifest's exact file set). Bounded by the
    * retention policy, not the stream's lifetime. */
  def readLog(spark: SparkSession, dir: String): DataFrame = {
    val vs = VersionedTable.versions(spark, dir)
    require(vs.nonEmpty, s"no committed versions at $dir")
    vs.map(VersionedTable.readAsOf(spark, dir, _)).reduce(_.unionByName(_))
  }
}
