package graft.streaming

import graft.operators.MergeUpsert
import graft.sources.VersionedTable
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.{DataType, StructType}

/** STREAMING CDC MATERIALIZATION — keep a queryable snapshot table up
  * to date under a continuous changelog (the streaming twin of
  * [[graft.operators.MergeUpsert]]): upserts and deletes arrive as a
  * stream, `foreachBatch` folds each micro-batch into the stored
  * snapshot with the same latest-wins merge the batch operator uses —
  * so stream-maintained state provably equals the one-shot batch merge
  * of the same changelog (StreamingMergeSpec asserts it).
  *
  * The 100 TB shape is INCREMENTAL, not read-modify-write of the
  * world: rows are stored hash-bucketed on the id
  * (`__bucket = pmod(xxhash64(id), nBuckets)` directories inside each
  * version's data dir), and each micro-batch
  *
  *   1. computes the distinct buckets its ids touch (≤ nBuckets rows,
  *      collected — driver-bounded by construction),
  *   2. reads ONLY those buckets' files out of the latest manifest,
  *   3. merges and writes NEW files for only those buckets, then
  *      commits a manifest carrying every untouched bucket's files
  *      FORWARD BY REFERENCE.
  *
  * Per-batch cost is O(changed buckets × bucket size), not
  * O(snapshot) — the copy-on-write granularity every table format
  * (Delta/Iceberg/Hudi) uses. Since round 13 the snapshot is a
  * [[graft.sources.VersionedTable]]: visibility is ONE manifest
  * commit, so a reader racing a merge trigger sees the previous
  * complete version or the next complete version, NEVER a
  * half-rewritten bucket (the old dynamic-partition-overwrite layout
  * had exactly that torn window — closed per the round-12 verdict).
  * Readable bytes are never rewritten in place; superseded versions
  * age out via [[VersionedTable.gc]] retention.
  *
  * Exactly-once: foreachBatch can re-run a batch on recovery; each
  * trigger commits under batchId `merge-epoch-{id}`, so a replay
  * finds the epoch already committed and writes nothing (the
  * [[StreamingVersionedPublish]] idempotence contract, with the
  * same-batchId canonicalization closing the zombie-driver race).
  */
object StreamingMerge {

  val BucketCol: String = VersionedBuckets.BucketCol

  private def bucketOf(idCol: String, nBuckets: Int) =
    pmod(xxhash64(col(idCol)), lit(nBuckets.toLong))

  private def bucketOfPath(rel: String): Option[Long] =
    VersionedBuckets.bucketOfPath(rel)

  /** Write `df` bucket-partitioned into a fresh invisible data dir
    * under `dir`; return the dir-relative file paths (which carry the
    * `__bucket=N` directory component the incremental reads prune
    * on). */
  private def writeBucketed(df: DataFrame, idCol: String, dir: String,
                            nBuckets: Int): Seq[String] =
    VersionedBuckets.writeBucketed(
      df.withColumn(BucketCol, bucketOf(idCol, nBuckets)), dir)

  /** Materialize `base` as version 1 of the snapshot at `dir`. The
    * manifest carries the ROW schema (bucket ids live in directory
    * names, not in the files), so the table stays readable even when
    * a changelog later deletes every row. */
  def init(base: DataFrame, idCol: String, dir: String,
           nBuckets: Int = 64, statsCols: Seq[String] = Nil): Unit = {
    VersionedBuckets.writeNBuckets(base.sparkSession, dir, nBuckets)
    val files = writeBucketed(base, idCol, dir, nBuckets)
    VersionedTable.publishFiles(base.sparkSession, dir, "init",
      base.schema.json, files,
      stats = VersionedTable.fileStats(base.sparkSession, dir, files,
        statsCols))
    ()
  }

  /** Read the maintained snapshot — the latest committed version. */
  def snapshot(spark: SparkSession, dir: String): DataFrame =
    VersionedTable.readLatest(spark, dir)

  /** Fold ONE changelog batch into the snapshot at `dir` — the unit
    * foreachBatch applies; also the backfill entry point for a batch
    * changelog. Pass `batchId` for replay idempotence (the [[run]]
    * maintainer keys it on the trigger epoch); None commits under a
    * fresh unique id (content-idempotent but version-appending). */
  def applyBatch(batch: DataFrame, idCol: String, seqCol: String,
                 opCol: String, dir: String, nBuckets: Int = 64,
                 batchId: Option[String] = None,
                 statsCols: Seq[String] = Nil): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    VersionedBuckets.checkNBuckets(spark, dir, nBuckets)
    val bid = batchId.getOrElse(
      "merge-" + java.util.UUID.randomUUID().toString)
    // replay check BEFORE any work: a committed epoch wrote everything
    if (VersionedTable.committedVersionOf(spark, dir, bid).isDefined)
      return
    val m = VersionedTable.latestManifest(spark, dir).getOrElse(
      throw new IllegalStateException(
        s"no snapshot at $dir — call init() first"))
    // the merge reads touched buckets RAW under the logical schema —
    // a rename/drop-evolved table would serve renamed columns as null
    require(m.colmapRefs.isEmpty,
      s"applyBatch($dir): rename/drop column evolution is not " +
        "supported on CDC merge tables — rebucket into a fresh dir " +
        "with the target schema instead")
    val schema = DataType.fromJson(m.schemaJson).asInstanceOf[StructType]
    // SCHEMA EVOLUTION: the batch may carry a SUPERSET of the snapshot
    // row schema — new payload columns widen the table in this commit
    // (same add-column rules as VersionedTable.evolveSchema: no drops,
    // no type changes; carried/untouched rows read the new columns as
    // null). The snapshot side is null-aligned before the merge so the
    // latest-wins arithmetic sees one schema.
    val batchPayload = batch.schema.fields
      .filter(f => f.name != seqCol && f.name != opCol)
    val missing = schema.fieldNames
      .filterNot(n => batchPayload.exists(_.name == n))
    require(missing.isEmpty,
      s"applyBatch($dir): batch drops snapshot column(s) " +
        s"${missing.mkString(",")} — a changelog must carry every " +
        "payload column (add-column evolution only)")
    schema.fields.foreach { f =>
      val bf = batchPayload.find(_.name == f.name).get
      require(bf.dataType == f.dataType,
        s"applyBatch($dir): column '${f.name}' changes type " +
          s"${f.dataType.simpleString} -> ${bf.dataType.simpleString}" +
          " — incompatible")
    }
    val oldNames = schema.fieldNames.toSet
    val added = batchPayload.filterNot(f => oldNames(f.name))
    val widened =
      if (added.isEmpty) schema
      else StructType(schema.fields ++ added.map(_.copy(nullable = true)))
    val withBucket = batch.withColumn(BucketCol, bucketOf(idCol, nBuckets))
    // the touched-bucket set is ≤ nBuckets values — driver-bounded by
    // construction, never by data volume
    val touched = withBucket.select(BucketCol).distinct()
      .collect().map(_.getLong(0)).toSet
    val (touchedFiles, carried) =
      m.files.partition(f => bucketOfPath(f).exists(touched))
    // read ONLY the touched buckets' files — manifest-level pruning,
    // so a batch touching 0.1% of buckets reads 0.1% of the table
    // (read under the WIDENED schema: parquet's read-by-name contract
    // nulls the added columns for files written before the evolution)
    val current =
      if (touchedFiles.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], widened)
      else spark.read.schema(widened)
        .parquet(touchedFiles.map(f => new Path(dir, f).toString): _*)
    val merged = MergeUpsert.merge(current, withBucket.drop(BucketCol),
      idCol, seqCol, opCol)
    // new files for touched buckets only (a bucket whose every row was
    // deleted simply writes no file and drops out of the manifest);
    // untouched buckets carry over by reference — untouched bytes stay
    // untouched on disk, and the swap is one atomic manifest commit
    val newFiles = writeBucketed(merged, idCol, dir, nBuckets)
    // optimistic commit keyed on the base version: a concurrent
    // writer's rows would be LOST if we published a file set derived
    // from a stale snapshot — conflict fails the trigger loudly
    // (foreachBatch replays it against the new latest on restart).
    // Stats are computed for the NEW files only (bounded by the
    // batch); carried files inherit theirs from the previous manifest
    // (VersionedTable.inheritFileMeta), so zone maps stay complete
    // across triggers at per-change cost.
    VersionedTable.publishFilesIfUnchanged(spark, dir, bid, widened.json,
      carried ++ newFiles, expectedBaseVersion = m.version,
      stats = VersionedTable.fileStats(spark, dir, newFiles, statsCols))
    ()
  }

  /** POINT LOOKUP on the maintained snapshot — the CDC table's
    * primary access pattern ("what is the current row for id X?"),
    * answered WITHOUT opening the table: the id's bucket is a pure
    * function of the value (`pmod(xxhash64(id), nBuckets)`, the same
    * hash the writer used, evaluated driver-side with no job), and
    * every data file carries its `__bucket=N` in its manifest path —
    * so the read opens ONLY the probe bucket's files (~1/nBuckets of
    * the snapshot) plus a residual equality filter. This is the
    * bucket-key complement of [[graft.sources.VersionedTable
    * .readAsOfPoint]]'s blooms: here the layout makes the skip exact
    * (no false opens), with zero extra manifest metadata. Returns
    * (dataframe, files opened, files in the snapshot). */
  def lookup(spark: SparkSession, dir: String, idCol: String,
             value: Any, nBuckets: Int = 64): (DataFrame, Int, Int) = {
    require(value != null, "point probes are non-null")
    VersionedBuckets.checkNBuckets(spark, dir, nBuckets)
    val m = VersionedTable.latestManifest(spark, dir).getOrElse(
      throw new NoSuchElementException(s"no snapshot at $dir"))
    require(m.colmapRefs.isEmpty,
      s"lookup($dir): rename/drop-evolved tables are not CDC merge " +
        "tables (see applyBatch)")
    val schema = DataType.fromJson(m.schemaJson).asInstanceOf[StructType]
    import org.apache.spark.sql.catalyst.expressions.{Literal, XxHash64}
    val dt = schema(idCol).dataType
    val scalaV = VersionedTable.castProbe(dt, value)
    // seed 42L = the `functions.xxhash64` default bucketOf uses
    val h = XxHash64(Seq(Literal.create(scalaV, dt)), 42L).eval(null)
      .asInstanceOf[Long]
    val bucket = ((h % nBuckets) + nBuckets) % nBuckets
    val keep = m.files.filter(f => bucketOfPath(f).contains(bucket))
    val base =
      if (keep.isEmpty)
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema)
        .parquet(keep.map(f => new Path(dir, f).toString): _*)
    (base.filter(col(idCol) === lit(scalaV)), keep.size, m.files.size)
  }

  /** Start the maintainer: every micro-batch of `changeStream` folds
    * into the snapshot at `dir`, exactly once per epoch across
    * restarts. The snapshot must exist ([[init]]). */
  def run(changeStream: DataFrame, idCol: String, seqCol: String,
          opCol: String, dir: String, checkpointDir: String,
          nBuckets: Int = 64): StreamingQuery =
    changeStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        applyBatch(batch, idCol, seqCol, opCol, dir, nBuckets,
          Some(s"merge-epoch-$epochId"))
      }
      .start()

  /** [[run]] + a maintained rollup in the SAME trigger: each
    * micro-batch folds into the snapshot and then advances the
    * [[StreamingRollup]] at `rollupDir` through the change feed —
    * both sides are batchId-idempotent (merge on the epoch, rollup on
    * the reflected snapshot version), so a replayed trigger re-does
    * neither and a crash between the two is healed by the next
    * trigger's refresh (the rollup simply advances two versions,
    * still reading only the changed buckets). The rollup must exist
    * ([[StreamingRollup.init]]). */
  def runWithRollup(changeStream: DataFrame, idCol: String,
                    seqCol: String, opCol: String, dir: String,
                    checkpointDir: String, rollupDir: String,
                    groupCols: Seq[String], valueCol: String,
                    nBuckets: Int = 64): StreamingQuery =
    changeStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        applyBatch(batch, idCol, seqCol, opCol, dir, nBuckets,
          Some(s"merge-epoch-$epochId"))
        StreamingRollup.refresh(batch.sparkSession, dir, rollupDir,
          groupCols, valueCol)
        ()
      }
      .start()

  /** ROW-LEVEL CHANGE DATA FEED between two committed versions of the
    * CDC snapshot — the consumer-facing complement of the
    * manifest-level file delta: downstream systems (index maintainers,
    * caches, sync targets) want "which ROWS changed, and how", not
    * file lists. Derived entirely from the changed files (cost ∝ the
    * change, never the snapshot): the removed files' rows and the
    * added files' rows full-outer-join on the id, and
    *
    *  - id only on the new side            → `insert`
    *  - id only on the old side            → `delete`
    *  - both sides, payload differs        → `update_preimage` (old
    *    row) + `update_postimage` (new row)
    *  - both sides, payload identical      → NO event — these are the
    *    untouched same-bucket rows a copy-on-write rewrite carries,
    *    which a naive file-delta consumer would mis-report as
    *    delete+insert.
    *
    * Payload comparison is null-safe struct equality (`<=>`), so null
    * fields compare correctly. Schema evolution between the versions
    * is handled like every reader: the old side is null-aligned to
    * the new version's schema (an evolution commit alone therefore
    * emits NO events — no bytes changed). Returns
    * `(__change_type, <new-schema payload columns>)`. */
  def changeFeedRows(spark: SparkSession, dir: String, vOld: Long,
                     vNew: Long, idCol: String): DataFrame = {
    val (added, removed) =
      VersionedTable.changedFiles(spark, dir, vOld, vNew)
    val newRows = VersionedTable.readFileSubset(spark, dir, vNew, added)
    val oldRaw = VersionedTable.readFileSubset(spark, dir, vOld, removed)
    // null-align the old side to the new schema (add-column evolution)
    val oldRows = newRows.schema.fields
      .filterNot(f => oldRaw.columns.contains(f.name))
      .foldLeft(oldRaw)((d, f) =>
        d.withColumn(f.name, lit(null).cast(f.dataType)))
    val payload = newRows.columns.filter(_ != idCol).toSeq
    // id-only table: struct() with zero fields fails at analysis, and
    // no update is expressible anyway (the row IS the id) — compare on
    // the id alone and emit an insert/delete-only feed
    if (payload.isEmpty) {
      val joined = oldRows.select(col(idCol), lit(true).as("__o"))
        .join(newRows.select(col(idCol), lit(true).as("__n")),
          Seq(idCol), "full_outer")
      return joined
        .filter(col("__o").isNull || col("__n").isNull)
        .select(when(col("__o").isNull, lit("insert"))
          .otherwise(lit("delete")).as("__change_type"), col(idCol))
    }
    def packed(df: DataFrame, as: String) = df.select(col(idCol),
      struct(payload.map(col): _*).as(as))
    val joined = packed(oldRows, "__o")
      .join(packed(newRows, "__n"), Seq(idCol), "full_outer")
    val ins = when(col("__o").isNull && col("__n").isNotNull,
      struct(lit("insert").as("t"), col("__n").as("p")))
    val del = when(col("__n").isNull && col("__o").isNotNull,
      struct(lit("delete").as("t"), col("__o").as("p")))
    val upd = col("__o").isNotNull && col("__n").isNotNull &&
      !(col("__o") <=> col("__n"))
    val pre = when(upd, struct(lit("update_preimage").as("t"),
      col("__o").as("p")))
    val post = when(upd, struct(lit("update_postimage").as("t"),
      col("__n").as("p")))
    joined
      .select(col(idCol), explode(filter(array(ins, del, pre, post),
        x => x.isNotNull)).as("__e"))
      .select(col("__e.t").as("__change_type") +: col(idCol) +:
        payload.map(c => col(s"__e.p.$c").as(c)): _*)
  }

  /** VERSIONED RE-BUCKET — the escape hatch from the immutable
    * `nBuckets` pin: a CDC table that grows 100× keeps its init-time
    * bucket count forever (the pin is what keeps reads/merges
    * consistent), so a point lookup on a 100 TB table with 64 buckets
    * opens 1/64 of 100 TB. The fix reuses existing machinery: rewrite
    * the CURRENT snapshot into a FRESH directory at the new bucket
    * count (one bounded full-rewrite job — the cost any re-bucketing
    * pays) and let the caller swap serving to `newDir` atomically via
    * [[graft.sources.AtomicPointer]] / [[graft.sources.TableSet]].
    * Readers of `dir` are untouched mid-rebucket (nothing in the old
    * table changes — old manifests, old bucket pin, old lookups all
    * keep working); lookups against `newDir` honor ITS pinned count.
    * Idempotent per source version (batchId `rebucket-of-v{N}` at the
    * new dir); the maintainer should be quiesced (or its triggers
    * replayed onto `newDir`) before the swap — changes applied to
    * `dir` after the rewrite cut are NOT in `newDir`, exactly like any
    * table migration. Returns the new dir's committed version. */
  def rebucket(spark: SparkSession, dir: String, newDir: String,
               newNBuckets: Int, idCol: String): Long = {
    require(newNBuckets > 0, "newNBuckets must be positive")
    val m = VersionedTable.latestManifest(spark, dir).getOrElse(
      throw new NoSuchElementException(s"no snapshot at $dir"))
    // the TARGET bucket count is part of the replay identity — a
    // re-request with a different count must not be swallowed by an
    // earlier rebucket's batchId (it fails the newDir pin check below)
    val bid = s"rebucket-of-v${m.version}-to-$newNBuckets"
    VersionedTable.committedVersionOf(spark, newDir, bid) match {
      case Some(v) => return v // replayed rebucket: already done
      case None =>
    }
    // pin the NEW count at the new dir (create-no-overwrite: a racing
    // rebucket to the same dir must agree or fail loudly). The catch
    // alone is not enough: a transient create failure leaves NO pin,
    // and checkNBuckets passes vacuously on a missing pin — require
    // the pin to exist before publishing the rewrite.
    try VersionedBuckets.writeNBuckets(spark, newDir, newNBuckets)
    catch { case _: java.io.IOException => () }
    VersionedBuckets.requireNBuckets(spark, newDir, newNBuckets)
    val df = VersionedTable.readAsOf(spark, dir, m.version)
    val files = writeBucketed(df, idCol, newDir, newNBuckets)
    VersionedTable.publishFiles(spark, newDir, bid, m.schemaJson, files)
  }

  /** Bound the one-file-set-per-batch accumulation: rewrite every
    * bucket of the latest version into one right-sized file set and
    * commit it as a new version (idempotent per source version via
    * batchId `merge-compact-of-v{N}`). Unlike
    * [[VersionedTable.compact]] this PRESERVES the bucket layout the
    * incremental reads prune on. Rewriting the world is the RIGHT
    * shape here: each trigger already leaves exactly one file per
    * touched bucket (writeBucketed repartitions on the bucket id), so
    * the latest version never accumulates intra-bucket small files —
    * the debt a bucket table accrues is superseded VERSIONS ([[
    * graft.sources.VersionedTable.gc]]) and under-sized buckets
    * ([[rebucket]]), not per-bucket fragments. Returns (filesBefore,
    * filesAfter). */
  def compact(spark: SparkSession, dir: String, idCol: String,
              nBuckets: Int = 64): (Int, Int) = {
    VersionedBuckets.checkNBuckets(spark, dir, nBuckets)
    val m = VersionedTable.latestManifest(spark, dir).getOrElse(
      throw new NoSuchElementException(s"no snapshot at $dir"))
    val bid = s"merge-compact-of-v${m.version}"
    if (VersionedTable.committedVersionOf(spark, dir, bid).isDefined)
      return (m.files.size, m.files.size)
    val df = VersionedTable.readAsOf(spark, dir, m.version)
    val newFiles = writeBucketed(df, idCol, dir, nBuckets)
    VersionedTable.publishFilesIfUnchanged(spark, dir, bid, m.schemaJson,
      newFiles, expectedBaseVersion = m.version)
    (m.files.size, newFiles.size)
  }
}
