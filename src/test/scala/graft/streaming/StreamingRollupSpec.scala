package graft.streaming

import graft.SparkSpec
import graft.operators.IncrementalAgg
import graft.sources.VersionedTable
import org.apache.spark.sql.functions._

/** The rollup maintainer must track the CDC snapshot bit-exactly at
  * every trigger while reading only the changed buckets, no-op when
  * the snapshot hasn't advanced, replay cleanly, and survive the
  * reflected version being GC'd (full-recompute fallback). */
class StreamingRollupSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private def recompute(snapDir: String) =
    IncrementalAgg.retractableState(
      VersionedTable.readLatest(spark, snapDir), Seq("grp"), "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2))).toMap

  private def maintained(rollupDir: String) =
    StreamingRollup.current(spark, rollupDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2))).toMap

  test("rollup follows the snapshot through batches bit-exactly; " +
    "no-op refresh; replay idempotent; gc'd base falls back") {
    val snap = tmp("rsnap"); val roll = tmp("rroll")
    val base = (1L to 200L)
      .map(i => (i, if (i % 2 == 0) "even" else "odd", i.toDouble))
      .toDF("id", "grp", "v")
    StreamingMerge.init(base, "id", snap, nBuckets = 8)
    val v1 = StreamingRollup.init(spark, snap, roll, Seq("grp"), "v")
    assert(v1 === 1L)
    assert(maintained(roll) === recompute(snap))
    // refresh without snapshot movement: version-level no-op
    assert(StreamingRollup.refresh(spark, snap, roll, Seq("grp"), "v")
      === 1L)
    assert(VersionedTable.versions(spark, roll) === Seq(1L))
    // batch 1: upserts (group moves) + deletes
    val b1 = ((1L to 30L).map(i => (i * 3, "even", 1000.0, 10L, "upsert")) ++
      (1L to 10L).map(i => (i * 20, "x", 0.0, 11L, "delete")))
      .toDF("id", "grp", "v", "seq", "op")
    StreamingMerge.applyBatch(b1, "id", "seq", "op", snap, 8,
      Some("e0"))
    val r2 = StreamingRollup.refresh(spark, snap, roll, Seq("grp"), "v")
    assert(maintained(roll) === recompute(snap))
    // replayed refresh: same version, nothing new committed
    assert(StreamingRollup.refresh(spark, snap, roll, Seq("grp"), "v")
      === r2)
    // batch 2: delete an entire group's remainder
    val oddIds = VersionedTable.readLatest(spark, snap)
      .filter(col("grp") === "odd").select("id").as[Long].collect()
    val b2 = oddIds.toSeq.map(i => (i, "odd", 0.0, 20L, "delete"))
      .toDF("id", "grp", "v", "seq", "op")
    StreamingMerge.applyBatch(b2, "id", "seq", "op", snap, 8,
      Some("e1"))
    StreamingRollup.refresh(spark, snap, roll, Seq("grp"), "v")
    val m = maintained(roll)
    assert(m === recompute(snap))
    assert(!m.contains("odd"), "fully-deleted group must drop")
    // GC the snapshot down to ONE version (reflected version gone),
    // advance again: refresh must fall back to a full recompute and
    // still be exact
    val b3 = Seq((9999L, "new", 42.0, 30L, "upsert"))
      .toDF("id", "grp", "v", "seq", "op")
    StreamingMerge.applyBatch(b3, "id", "seq", "op", snap, 8,
      Some("e2"))
    VersionedTable.gc(spark, snap, keepLast = 1, orphanGraceMs = 0L)
    StreamingRollup.refresh(spark, snap, roll, Seq("grp"), "v")
    assert(maintained(roll) === recompute(snap))
    assert(maintained(roll)("new")._1 === 1L)
    VersionedTable.drop(spark, snap)
    VersionedTable.drop(spark, roll)
  }

  test("runWithRollup: snapshot AND rollup stay exact across stream " +
    "triggers in one exactly-once pipeline") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val snap = tmp("rwsnap"); val roll = tmp("rwroll")
    val ck = tmp("rwck")
    val base = (1L to 100L)
      .map(i => (i, if (i % 3 == 0) "tri" else "rest", i.toDouble))
      .toDF("id", "grp", "v")
    StreamingMerge.init(base, "id", snap, nBuckets = 8)
    StreamingRollup.init(spark, snap, roll, Seq("grp"), "v")
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val q = StreamingMerge.runWithRollup(input.toDF()
        .withColumnRenamed("text", "grp")
        .withColumn("v", col("id").cast("double") * 2),
      "id", "seq", "op", snap, ck, roll, Seq("grp"), "v", nBuckets = 8)
    val batches = Seq(
      Seq(Change(3L, "tri", 100, "upsert"), Change(101L, "new", 101, "upsert")),
      Seq(Change(6L, "x", 200, "delete"), Change(102L, "new", 201, "upsert")))
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    assert(maintained(roll) === recompute(snap),
      "rollup must track the snapshot after every trigger")
    assert(maintained(roll)("new")._1 === 2L)
    VersionedTable.drop(spark, snap)
    VersionedTable.drop(spark, roll)
  }

  test("the rollup table carries its own skipping metadata: a group " +
    "point-read opens fewer files than the state holds, across " +
    "init AND refresh") {
    val snap = tmp("rbsnap"); val roll = tmp("rbroll")
    // 64 groups spread over 8 state files so one group's bloom probe
    // has real files to skip
    val base = (1L to 512L)
      .map(i => (i, s"g${i % 64}", i.toDouble)).toDF("id", "grp", "v")
    StreamingMerge.init(base, "id", snap, nBuckets = 8)
    StreamingRollup.init(spark, snap, roll, Seq("grp"), "v",
      bloomCols = Seq("grp"), statePartitions = Some(8))
    val (hit1, opened1, total1) = VersionedTable.readLatestPoint(
      spark, roll, "grp", "g7")
    assert(total1 > 1, s"state must span several files, got $total1")
    assert(opened1 < total1,
      s"bloom skip must fire on the INIT state: $opened1 of $total1")
    assert(hit1.count() === 1L)
    // advance the snapshot; the refreshed state keeps bloom coverage
    // (new files computed, carried files inherited)
    val b = (1L to 40L).map(i => (i * 7, s"g${(i * 7) % 64}", 9.0,
      10L, "upsert")).toDF("id", "grp", "v", "seq", "op")
    StreamingMerge.applyBatch(b, "id", "seq", "op", snap, 8, Some("e0"))
    StreamingRollup.refresh(spark, snap, roll, Seq("grp"), "v",
      bloomCols = Seq("grp"), statePartitions = Some(8))
    val (hit2, opened2, total2) = VersionedTable.readLatestPoint(
      spark, roll, "grp", "g7")
    assert(opened2 < total2,
      s"bloom skip must survive refresh: $opened2 of $total2")
    assert(hit2.count() === 1L)
    assert(maintained(roll) === recompute(snap))
    VersionedTable.drop(spark, snap)
    VersionedTable.drop(spark, roll)
  }

  test("the state layout is deterministic in the data, not the session " +
    "width: statePartitions yields a multi-file state even when " +
    "spark.sql.shuffle.partitions equals statePartitions") {
    // Regression for the round-17 8-core bench failure: with
    // shuffle.partitions == statePartitions the old hash repartition
    // was elided (the upstream aggregate already satisfied it) and AQE
    // coalesced the aggregate's exchange to ONE file — the bloom skip
    // had nothing to prune. Run the same rollup at two shuffle widths,
    // one of them exactly equal to statePartitions.
    val priorWidth = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      for (width <- Seq("8", "32")) {
        spark.conf.set("spark.sql.shuffle.partitions", width)
        val snap = tmp(s"wsnap$width"); val roll = tmp(s"wroll$width")
        val base = (1L to 512L)
          .map(i => (i, s"g${i % 64}", i.toDouble)).toDF("id", "grp", "v")
        StreamingMerge.init(base, "id", snap, nBuckets = 8)
        StreamingRollup.init(spark, snap, roll, Seq("grp"), "v",
          bloomCols = Seq("grp"), statePartitions = Some(8))
        val b = (1L to 40L).map(i => (i * 7, s"g${(i * 7) % 64}", 9.0,
          10L, "upsert")).toDF("id", "grp", "v", "seq", "op")
        StreamingMerge.applyBatch(b, "id", "seq", "op", snap, 8, Some("e0"))
        StreamingRollup.refresh(spark, snap, roll, Seq("grp"), "v",
          bloomCols = Seq("grp"), statePartitions = Some(8))
        val (hit, opened, total) = VersionedTable.readLatestPoint(
          spark, roll, "grp", "g7")
        assert(total > 1,
          s"state must span several files at width $width, got $total")
        assert(opened < total,
          s"bloom skip must fire at width $width: $opened of $total")
        assert(hit.count() === 1L)
        assert(maintained(roll) === recompute(snap))
        VersionedTable.drop(spark, snap)
        VersionedTable.drop(spark, roll)
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", priorWidth)
  }

  test("two RACING refreshes serialize through the shared OCC retry: " +
    "both land (or dedupe), the final state is exact, no CME escapes") {
    val snap = tmp("racesnap"); val roll = tmp("raceroll")
    val base = (1L to 200L)
      .map(i => (i, if (i % 2 == 0) "even" else "odd", i.toDouble))
      .toDF("id", "grp", "v")
    StreamingMerge.init(base, "id", snap, nBuckets = 8)
    StreamingRollup.init(spark, snap, roll, Seq("grp"), "v")
    // two snapshot advances, then two maintainers racing to catch up —
    // the slower one must re-derive off the winner, never lose state
    // or land a stale rollup on top of a newer one
    StreamingMerge.applyBatch(
      Seq((7L, "even", 100.0, 10L, "upsert"))
        .toDF("id", "grp", "v", "seq", "op"),
      "id", "seq", "op", snap, 8, Some("e0"))
    StreamingMerge.applyBatch(
      Seq((8L, "odd", 200.0, 11L, "upsert"))
        .toDF("id", "grp", "v", "seq", "op"),
      "id", "seq", "op", snap, 8, Some("e1"))
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (1 to 2).map(_ => new Thread(() => {
      try StreamingRollup.refresh(spark, snap, roll, Seq("grp"), "v")
      catch { case t: Throwable => errors.add(t) }
    }))
    threads.foreach(_.start()); threads.foreach(_.join(120000))
    assert(errors.isEmpty, s"no exception may escape the retry: $errors")
    assert(maintained(roll) === recompute(snap),
      "racing refreshes must leave the exact rollup")
    // the final rollup reflects the snapshot's CURRENT version
    assert(StreamingRollup.refresh(spark, snap, roll, Seq("grp"), "v")
      === VersionedTable.latestVersion(spark, roll).get,
      "a follow-up refresh must be a no-op")
    VersionedTable.drop(spark, snap)
    VersionedTable.drop(spark, roll)
  }
}
