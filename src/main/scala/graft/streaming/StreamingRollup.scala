package graft.streaming

import graft.operators.IncrementalAgg
import graft.sources.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}

/** STREAMING ROLLUP MAINTAINER — a materialized aggregate that
  * FOLLOWS a versioned table (typically the [[StreamingMerge]] CDC
  * snapshot) through the manifest change feed: each [[refresh]]
  * advances the rollup from the snapshot version it reflects to the
  * current one by reading ONLY the files that changed in between
  * (`state ⊖ removed ⊕ added`, [[IncrementalAgg.maintainOverVersions]])
  * — per-trigger rollup cost tracks the trigger's change, never the
  * snapshot. The rollup is itself a [[VersionedTable]]: each refresh
  * is one atomic publish whose batchId (`rollup-of-v{N}`) RECORDS the
  * reflected snapshot version, which makes refresh
  *
  *  - replay-idempotent (a re-run of the same advance finds its
  *    batchId committed and no-ops — the exactly-once foreachBatch
  *    contract), and
  *  - self-describing (the next refresh reads the reflected version
  *    out of the latest rollup manifest; no side state).
  *
  * GC interplay: maintaining v_a → v_b needs BOTH manifests retained.
  * If the snapshot's gc already dropped the reflected version,
  * [[refresh]] falls back to one full recompute of the current
  * version (loudly impossible to get wrong — the fallback result is
  * defined identically). Keep the snapshot's `gc(keepLast)` at least
  * as deep as the rollup's refresh lag to stay on the incremental
  * path.
  *
  * Wire-up: call `refresh` after each [[StreamingMerge.applyBatch]]
  * in the same foreachBatch (or on its own cadence — refresh skips
  * cleanly when the snapshot hasn't advanced). */
object StreamingRollup {

  private val BatchPrefix = "rollup-of-v"

  /** RANGE-layout the state on its group key into an EXPLICIT file
    * count. Range, not hash: `repartition(k, groupCols)` is ELIDED
    * whenever the upstream aggregate already hash-partitioned on the
    * group key at width k (i.e. whenever `spark.sql.shuffle.partitions
    * == k`), and AQE then coalesces the aggregate's own exchange into
    * one file — the state's file count silently tracked the SESSION
    * width (one file at 8 cores, k files at 32), which broke the
    * bloom-skip contract under a narrower cluster shape. A range
    * shuffle can never be satisfied by the aggregate's hash
    * partitioning, and its REPARTITION_BY_NUM origin is exempt from
    * AQE coalescing, so the layout is deterministic in the data alone.
    * Range clustering also makes the per-file min/max sidecars tight
    * (each file covers a contiguous group-key slice), so stats-based
    * skipping composes with the blooms. None keeps the planner's
    * layout. */
  private def layout(df: DataFrame, groupCols: Seq[String],
                     statePartitions: Option[Int]): DataFrame =
    statePartitions match {
      case Some(k) => df.repartitionByRange(k,
        groupCols.map(org.apache.spark.sql.functions.col): _*)
      case None => df
    }

  private def reflectedVersion(spark: SparkSession,
                               rollupDir: String): Option[Long] =
    VersionedTable.latestManifest(spark, rollupDir)
      .flatMap(m => m.batchId match {
        case b if b.startsWith(BatchPrefix) =>
          scala.util.Try(b.drop(BatchPrefix.length).toLong).toOption
        case _ => None
      })

  /** Materialize the rollup of the snapshot's CURRENT version as
    * version 1 of `rollupDir`. `statsCols`/`bloomCols` give the
    * ROLLUP TABLE its own skipping metadata (the group key is the
    * natural bloom column): a grouped rollup at |groups| ≈ 10⁶ is a
    * real table, and "this group's current state" should open ~1
    * file, not scan the state. */
  def init(spark: SparkSession, snapDir: String, rollupDir: String,
           groupCols: Seq[String], valueCol: String,
           statsCols: Seq[String] = Nil,
           bloomCols: Seq[String] = Nil,
           statePartitions: Option[Int] = None): Long = {
    val v = VersionedTable.latestVersion(spark, snapDir).getOrElse(
      throw new NoSuchElementException(s"no snapshot at $snapDir"))
    VersionedTable.publish(
      layout(IncrementalAgg.retractableState(
        VersionedTable.readAsOf(spark, snapDir, v), groupCols, valueCol),
        groupCols, statePartitions),
      rollupDir, s"$BatchPrefix$v",
      statsCols = statsCols, bloomCols = bloomCols)
  }

  /** The maintained state (latest rollup version). */
  def current(spark: SparkSession, rollupDir: String): DataFrame =
    VersionedTable.readLatest(spark, rollupDir)

  /** Advance the rollup to the snapshot's current version. Reads only
    * the changed files (incremental path) or falls back to one full
    * recompute when the reflected version was GC'd. No-op (returning
    * the existing rollup version) when the snapshot hasn't advanced.
    * Returns the committed rollup version. */
  def refresh(spark: SparkSession, snapDir: String, rollupDir: String,
              groupCols: Seq[String], valueCol: String,
              statsCols: Seq[String] = Nil,
              bloomCols: Seq[String] = Nil,
              statePartitions: Option[Int] = None): Long =
    // OPTIMISTIC commit keyed on the rollup version we derived from:
    // a racing refresher (or a slower one finishing late) would
    // otherwise land an OLDER state on top of a newer one — the
    // conflict aborts the stale writer, and the shared retry helper
    // re-runs the whole derive-and-commit body off the winner
    VersionedTable.withConflictRetry(maxAttempts = 20) {
      val curV = VersionedTable.latestVersion(spark, snapDir).getOrElse(
        throw new NoSuchElementException(s"no snapshot at $snapDir"))
      val fromV = reflectedVersion(spark, rollupDir).getOrElse(
        throw new IllegalStateException(
          s"no rollup at $rollupDir — call init() first"))
      val rollupBase = VersionedTable.latestVersion(spark, rollupDir).get
      if (fromV == curV) rollupBase
      else VersionedTable.committedVersionOf(spark, rollupDir,
        s"$BatchPrefix$curV") match {
        // replay check before any work (exactly-once across re-runs)
        case Some(v) => v
        case None =>
          val next =
            try IncrementalAgg.maintainOverVersions(spark, snapDir, fromV,
              curV, current(spark, rollupDir), groupCols, valueCol)
            catch {
              case _: NoSuchElementException =>
                // reflected version GC'd from the snapshot: recompute
                IncrementalAgg.retractableState(
                  VersionedTable.readAsOf(spark, snapDir, curV), groupCols,
                  valueCol)
            }
          VersionedTable.publishIfUnchanged(
            layout(next, groupCols, statePartitions), rollupDir,
            s"$BatchPrefix$curV", expectedBaseVersion = rollupBase,
            statsCols = statsCols, bloomCols = bloomCols)
      }
    }
}
