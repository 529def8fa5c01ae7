package graft.streaming

import graft.SparkSpec
import graft.operators.MergeUpsert
import graft.sources.VersionedTable
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Change(id: Long, text: String, seq: Long, op: String)

/** Streaming CDC materialization: a changelog applied micro-batch by
  * micro-batch must leave exactly the snapshot the one-shot batch
  * merge produces, while writing only the hash buckets each batch
  * touches — and, since the round-13 versioned layout, while NEVER
  * rewriting a readable byte in place: each trigger is one atomic
  * manifest commit a concurrent reader can only see whole. */
class StreamingMergeSpec extends SparkSpec {

  import spark.implicits._

  private def tmp(p: String) =
    java.nio.file.Files.createTempDirectory(p).toString

  private val base = (1L to 200L).map(i => (i, s"doc $i")).toDF("id", "text")

  private val batches: Seq[Seq[Change]] = Seq(
    // batch 1: revise some docs, insert new ones
    (1L to 40L).map(i => Change(i * 5, s"doc ${i * 5} v2", 100 + i, "upsert")) ++
      Seq(Change(201L, "doc 201", 180, "upsert")),
    // batch 2: delete every 20th doc (some just revised), more inserts
    (1L to 10L).map(i => Change(i * 20, "x", 200 + i, "delete")) ++
      Seq(Change(202L, "doc 202", 250, "upsert")),
    // batch 3: resurrect one deleted doc, re-revise another
    Seq(Change(40L, "doc 40 v3", 300, "upsert"),
      Change(25L, "doc 25 v3", 301, "upsert")))

  test("stream-maintained snapshot equals the one-shot batch merge") {
    val dir = tmp("snap"); val ck = tmp("ck")
    StreamingMerge.init(base, "id", dir, nBuckets = 16)
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Change]
    val q = StreamingMerge.run(input.toDF(), "id", "seq", "op", dir, ck,
      nBuckets = 16)
    batches.foreach { b => input.addData(b); q.processAllAvailable() }
    q.stop()
    val streamed = StreamingMerge.snapshot(spark, dir)
      .as[(Long, String)].collect().toMap
    val batchMerged = MergeUpsert.merge(base,
      batches.flatten.toDF(), "id", "seq", "op")
      .as[(Long, String)].collect().toMap
    assert(streamed === batchMerged)
    // spot-check semantics across batches
    assert(!streamed.contains(20L))            // deleted, never resurrected
    assert(streamed(40L) === "doc 40 v3")      // deleted then re-upserted
    assert(streamed(25L) === "doc 25 v3")      // upsert of an untouched doc
    assert(streamed(202L) === "doc 202")       // streamed insert
    // each trigger committed exactly one version after init
    assert(VersionedTable.versions(spark, dir) === Seq(1L, 2L, 3L, 4L))
  }

  test("a batch writes only the buckets it touches; untouched buckets " +
    "carry over by reference (same files, same bytes)") {
    val dir = tmp("snap2")
    StreamingMerge.init(base, "id", dir, nBuckets = 16)
    def latestFiles(): Map[String, Set[String]] =
      VersionedTable.latestManifest(spark, dir).get.files
        .groupBy(f => "__bucket=([0-9]+)".r.findFirstIn(f).get)
        .map { case (b, fs) => b -> fs.toSet }
    val before = latestFiles()
    // one single-id change touches exactly one bucket
    StreamingMerge.applyBatch(
      Seq(Change(7L, "doc 7 v2", 1000, "upsert")).toDF(),
      "id", "seq", "op", dir, nBuckets = 16)
    val after = latestFiles()
    val changed = after.keySet.filter(k => before.get(k) != after.get(k))
    assert(changed.size === 1, s"expected 1 rewritten bucket, got $changed")
    // untouched buckets reference the EXACT same file paths — written
    // once, never rewritten
    (before.keySet - changed.head).foreach { b =>
      assert(after(b) === before(b), s"bucket $b files must carry over")
    }
    assert(StreamingMerge.snapshot(spark, dir)
      .filter(col("id") === 7L).select("text").as[String].head() === "doc 7 v2")
  }

  test("deleting a whole bucket drops it from the manifest; gc reclaims " +
    "the superseded version's bytes") {
    val dir = tmp("snap3")
    val tiny = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    StreamingMerge.init(tiny, "id", dir, nBuckets = 4)
    val dels = Seq(1L, 2L, 3L).map(i => Change(i, "x", 10 + i, "delete"))
    StreamingMerge.applyBatch(dels.toDF(), "id", "seq", "op", dir, 4)
    assert(StreamingMerge.snapshot(spark, dir).count() === 0L)
    assert(VersionedTable.latestManifest(spark, dir).get.files.isEmpty,
      "an all-deleted snapshot must reference no files")
    // the pre-delete version is still time-travelable until gc
    assert(VersionedTable.readAsOf(spark, dir, 1L).count() === 3L)
    VersionedTable.gc(spark, dir, keepLast = 1, orphanGraceMs = 0L)
    val dataDirs = new java.io.File(s"$dir/data").listFiles()
    assert(dataDirs == null || dataDirs.isEmpty,
      s"gc must reclaim the superseded bytes: ${dataDirs.toSeq}")
  }

  test("replaying the same epoch batchId is a no-op (exactly-once " +
    "recovery semantics)") {
    val dir = tmp("snap4")
    StreamingMerge.init(base, "id", dir, nBuckets = 8)
    val b = batches.head
    StreamingMerge.applyBatch(b.toDF(), "id", "seq", "op", dir, 8,
      batchId = Some("merge-epoch-0"))
    val once = StreamingMerge.snapshot(spark, dir)
      .as[(Long, String)].collect().toMap
    val vOnce = VersionedTable.versions(spark, dir)
    StreamingMerge.applyBatch(b.toDF(), "id", "seq", "op", dir, 8,
      batchId = Some("merge-epoch-0"))
    val twice = StreamingMerge.snapshot(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(once === twice)
    assert(VersionedTable.versions(spark, dir) === vOnce,
      "a replayed epoch must not append a version")
  }

  test("a concurrent reader racing merge triggers always sees a " +
    "complete committed snapshot, never a torn one") {
    val dir = tmp("snap5")
    StreamingMerge.init(base, "id", dir, nBuckets = 8)
    // every valid snapshot is base with k of the batches applied, so
    // its (count, sum-of-ids) pair comes from this closed set
    val validStates: Set[(Long, Long)] = {
      var states = Set.empty[(Long, Long)]
      var cur = base
      states += ((cur.count(), cur.agg(sum("id")).as[Long].head()))
      for (k <- 1 to batches.length) {
        cur = MergeUpsert.merge(base,
          batches.take(k).flatten.toDF(), "id", "seq", "op")
        states += ((cur.count(), cur.agg(sum("id")).as[Long].head()))
      }
      states
    }
    @volatile var torn: Option[(Long, Long)] = None
    @volatile var stop = false
    val reader = new Thread(() => {
      while (!stop && torn.isEmpty) {
        val snap = StreamingMerge.snapshot(spark, dir)
          .agg(count(lit(1)), sum("id")).as[(Long, Long)].head()
        if (!validStates(snap)) torn = Some(snap)
      }
    })
    reader.start()
    try {
      batches.zipWithIndex.foreach { case (b, i) =>
        StreamingMerge.applyBatch(b.toDF(), "id", "seq", "op", dir, 8,
          batchId = Some(s"merge-epoch-$i"))
      }
    } finally { stop = true; reader.join(30000) }
    assert(torn.isEmpty,
      s"reader observed a torn snapshot $torn; valid: $validStates")
  }

  test("a mismatched nBuckets fails loudly instead of mis-pruning " +
    "the bucket reads") {
    val dir = tmp("snap_nb")
    StreamingMerge.init(base, "id", dir, nBuckets = 16)
    val ex = intercept[IllegalArgumentException] {
      StreamingMerge.applyBatch(
        Seq(Change(7L, "doc 7 v2", 1000, "upsert")).toDF(),
        "id", "seq", "op", dir, nBuckets = 64)
    }
    assert(ex.getMessage.contains("nBuckets mismatch"))
    intercept[IllegalArgumentException] {
      StreamingMerge.compact(spark, dir, "id", 64)
    }
  }

  test("compact bounds file accumulation, preserves rows and the " +
    "bucket layout, and is idempotent per source version") {
    val dir = tmp("snap6")
    StreamingMerge.init(base, "id", dir, nBuckets = 8)
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingMerge.applyBatch(b.toDF(), "id", "seq", "op", dir, 8,
        batchId = Some(s"merge-epoch-$i"))
    }
    val beforeRows = StreamingMerge.snapshot(spark, dir)
      .as[(Long, String)].collect().toMap
    val (nBefore, nAfter) = StreamingMerge.compact(spark, dir, "id", 8)
    assert(nAfter <= nBefore)
    val afterRows = StreamingMerge.snapshot(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(afterRows === beforeRows, "compaction must preserve rows")
    // layout preserved: every file still carries a bucket directory
    assert(VersionedTable.latestManifest(spark, dir).get.files
      .forall(_.contains("__bucket=")))
    // replay: recompacting the same source version adds no version
    val vs = VersionedTable.versions(spark, dir)
    // compact of the COMPACTED version is a new source version, so
    // re-run the ORIGINAL compact batchId path by calling twice
    StreamingMerge.compact(spark, dir, "id", 8)
    // second call compacts v5 (the compacted version) — one more
    // version at most, and rows still identical
    assert(StreamingMerge.snapshot(spark, dir)
      .as[(Long, String)].collect().toMap === beforeRows)
    assert(VersionedTable.versions(spark, dir).size <= vs.size + 1)
  }

  test("zone-map stats survive merges: carried buckets inherit their " +
    "entries, new buckets get fresh ones — at per-change cost") {
    val dir = tmp("inh")
    // value == the id's bucket number, so each file's [min,max] is a
    // single point and a range probe prunes to one bucket exactly
    val base = (1L to 400L).map(i => (i, s"d$i")).toDF("id", "text")
      .withColumn("v", pmod(xxhash64(col("id")), lit(8L)).cast("double"))
    StreamingMerge.init(base, "id", dir, nBuckets = 8,
      statsCols = Seq("v"))
    val m1 = VersionedTable.latestManifest(spark, dir).get
    assert(VersionedTable.fileMetaOf(spark, dir, m1.version)._1
      .map(_._1).toSet === m1.files.toSet,
      "init must record stats for every file")
    // one batch touching a single id → one bucket rewritten
    val b = Seq((3L, "d3 v2", 100L, "upsert"))
      .toDF("id", "text", "seq", "op")
      .withColumn("v", pmod(xxhash64(col("id")), lit(8L)).cast("double"))
    StreamingMerge.applyBatch(b.select("id", "text", "v", "seq", "op"),
      "id", "seq", "op", dir, 8, Some("e0"), statsCols = Seq("v"))
    val m2 = VersionedTable.latestManifest(spark, dir).get
    assert(VersionedTable.fileMetaOf(spark, dir, m2.version)._1
      .map(_._1).toSet === m2.files.toSet,
      "carried buckets must inherit stats, new buckets get fresh ones")
    // and the maintained zone maps actually skip: probe one bucket
    val (df, opened, total) = VersionedTable.readLatestPruned(
      spark, dir, "v", 5.0, 5.0)
    assert(opened < total, s"zone maps failed to skip: $opened/$total")
    assert(df.count() ===
      StreamingMerge.snapshot(spark, dir).filter(col("v") === 5.0).count())
    VersionedTable.drop(spark, dir)
  }

  test("point lookup opens only the probe id's bucket and equals the " +
    "snapshot filter — for live, upserted, deleted and absent ids") {
    val dir = tmp("lkp")
    StreamingMerge.init(base, "id", dir, nBuckets = 16)
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingMerge.applyBatch(b.toDF(), "id", "seq", "op", dir, 16,
        batchId = Some(s"merge-epoch-$i"))
    }
    val snap = StreamingMerge.snapshot(spark, dir)
      .as[(Long, String)].collect().toMap
    // live-unchanged, revised, resurrected, inserted ids
    Seq(3L, 5L, 40L, 202L).foreach { id =>
      val (df, opened, total) = StreamingMerge.lookup(spark, dir, "id",
        id, 16)
      assert(opened < total,
        s"id $id: bucket pruning must fire ($opened/$total)")
      assert(df.collect().map(_.getString(1)).toSeq === Seq(snap(id)),
        s"id $id")
    }
    // deleted and never-present ids: zero rows, still ≤ one bucket
    Seq(20L, 99999L).foreach { id =>
      val (df, opened, total) = StreamingMerge.lookup(spark, dir, "id",
        id, 16)
      assert(opened < total && df.count() === 0L, s"id $id")
    }
    // a mismatched nBuckets must fail loudly, not mis-prune
    intercept[IllegalArgumentException] {
      StreamingMerge.lookup(spark, dir, "id", 3L, nBuckets = 8)
    }
  }

  test("applyBatch accepts a SUPERSET-schema batch: add-column " +
    "evolution through the CDC merge, old rows null-backfilled") {
    val dir = tmp("snap6")
    StreamingMerge.init(base, "id", dir, nBuckets = 8)
    // the changelog starts carrying a quality score the snapshot
    // doesn't have yet
    val evolved = Seq(
      (5L, "doc 5 v2", Some(0.9), 100L, "upsert"),
      (201L, "doc 201", Some(0.4), 101L, "upsert"),
      (10L, "x", None: Option[Double], 102L, "delete"))
      .toDF("id", "text", "score", "seq", "op")
    StreamingMerge.applyBatch(evolved, "id", "seq", "op", dir, 8)
    val snap = StreamingMerge.snapshot(spark, dir)
    assert(snap.schema.fieldNames.toSeq === Seq("id", "text", "score"))
    val byId = snap.collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(byId(5L) === ("doc 5 v2", Some(0.9)))
    assert(byId(201L) === ("doc 201", Some(0.4)))
    assert(!byId.contains(10L))
    assert(byId(7L) === ("doc 7", None),
      "carried rows must read the added column as null")
    assert(byId.size === 200L) // 200 base - 1 delete + 1 insert
    // v1 keeps its two-column schema (time travel under old schema)
    assert(VersionedTable.readAsOf(spark, dir, 1L).schema.fieldNames
      .toSeq === Seq("id", "text"))
    // the NEXT narrow batch (pre-evolution shape) is refused: a
    // changelog must carry every payload column
    intercept[IllegalArgumentException] {
      StreamingMerge.applyBatch(
        Seq(Change(6L, "doc 6 v2", 200L, "upsert")).toDF(),
        "id", "seq", "op", dir, 8)
    }
    // a type change is refused
    intercept[IllegalArgumentException] {
      StreamingMerge.applyBatch(
        Seq((6L, "doc 6 v2", "high", 200L, "upsert"))
          .toDF("id", "text", "score", "seq", "op"),
        "id", "seq", "op", dir, 8)
    }
    // point lookup still works on the evolved table
    val (hit, opened, total) = StreamingMerge.lookup(spark, dir, "id",
      5L, 8)
    assert(opened < total)
    assert(hit.select("score").as[Double].head() === 0.9)
  }

  test("concurrent merges and restores serialize through OCC: every " +
    "writer commits (after CME retries) and every version stays a " +
    "complete readable snapshot") {
    val dir = tmp("race")
    StreamingMerge.init(base.limit(50), "id", dir, nBuckets = 4)
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        try {
          var attempt = 0
          var done = false
          while (!done && attempt < 40) {
            try {
              if (i % 2 == 0)
                StreamingMerge.applyBatch(
                  Seq(Change(i.toLong, s"race doc $i", 100L + i,
                    "upsert")).toDF(),
                  "id", "seq", "op", dir, 4, Some(s"race-$i"))
              else VersionedTable.restore(spark, dir, 1L)
              done = true
            } catch {
              case _: java.util.ConcurrentModificationException =>
                attempt += 1 // stale base: re-read and retry
            }
          }
          assert(done, s"writer $i starved after 40 CME retries")
        } catch { case t: Throwable => errors.add(t) }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(errors.isEmpty, s"race errors: ${errors.toArray.toSeq}")
    // versions contiguous, every snapshot complete and consistent
    // with its own manifest metadata — no torn or half-applied commit
    val vs = VersionedTable.versions(spark, dir)
    assert(vs === (1L to vs.length.toLong),
      s"versions must be contiguous: $vs")
    // 4 merges always commit a new version; a restore no-ops when v1
    // content is already the latest, so total is in [5, 9]
    assert(vs.length >= 5 && vs.length <= 9, s"got ${vs.length}")
    vs.foreach { v =>
      assert(VersionedTable.readAsOf(spark, dir, v).count()
        === VersionedTable.rowCountOf(spark, dir, v),
        s"version $v: manifest count must match its snapshot")
    }
    val latest = StreamingMerge.snapshot(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(latest.size === VersionedTable.rowCountLatest(spark, dir))
  }

  test("changeFeedRows: inserts/deletes/update pre+post images; " +
    "carried same-bucket rows emit NOTHING; evolution null-aligns") {
    val dir = tmp("cdf")
    StreamingMerge.init(base, "id", dir, nBuckets = 4)
    // one batch: update id 5, delete id 20, insert 999 — everything
    // else in their buckets is carried by the rewrite and must not
    // appear in the feed
    val b = Seq(
      Change(5L, "doc 5 v2", 10L, "upsert"),
      Change(20L, "x", 11L, "delete"),
      Change(999L, "doc 999", 12L, "upsert"))
    StreamingMerge.applyBatch(b.toDF(), "id", "seq", "op", dir, 4)
    val feed = StreamingMerge.changeFeedRows(spark, dir, 1L, 2L, "id")
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2))).toSet
    assert(feed === Set(
      ("update_preimage", 5L, "doc 5"),
      ("update_postimage", 5L, "doc 5 v2"),
      ("delete", 20L, "doc 20"),
      ("insert", 999L, "doc 999")),
      s"got $feed")
    // an EVOLUTION batch: new column arrives; prior rows' feed images
    // carry it as null
    val evolved = Seq((5L, "doc 5 v3", Some(0.7), 20L, "upsert"))
      .toDF("id", "text", "score", "seq", "op")
    StreamingMerge.applyBatch(evolved, "id", "seq", "op", dir, 4)
    val feed2 = StreamingMerge.changeFeedRows(spark, dir, 2L, 3L, "id")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(feed2 === Set(
      ("update_preimage", 5L, "doc 5 v2", None),
      ("update_postimage", 5L, "doc 5 v3", Some(0.7))),
      s"got $feed2")
    // composing feeds across a version SPAN also works (1 -> 3)
    val span = StreamingMerge.changeFeedRows(spark, dir, 1L, 3L, "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(span.contains(("update_postimage", 5L)) &&
      span.contains(("delete", 20L)) && span.contains(("insert", 999L)))
  }

  test("rebucket rewrites the snapshot into a fresh dir at the new " +
    "pinned count; lookups honor each pin; the old dir is untouched") {
    val dir = tmp("rb"); val newDir = tmp("rbNew")
    new java.io.File(newDir).delete()
    StreamingMerge.init(base, "id", dir, nBuckets = 4)
    StreamingMerge.applyBatch(batches.head.toDF(), "id", "seq", "op",
      dir, 4)
    val beforeVersions = VersionedTable.versions(spark, dir)
    val beforeRows = StreamingMerge.snapshot(spark, dir)
      .as[(Long, String)].collect().toMap
    val v = StreamingMerge.rebucket(spark, dir, newDir, 16, "id")
    assert(v === 1L)
    // contents identical across the rewrite
    assert(StreamingMerge.snapshot(spark, newDir)
      .as[(Long, String)].collect().toMap === beforeRows)
    // the old dir is untouched mid-rebucket: same versions, lookups
    // still honor the OLD pin
    assert(VersionedTable.versions(spark, dir) === beforeVersions)
    val (oldHit, oldOpened, oldTotal) =
      StreamingMerge.lookup(spark, dir, "id", 5L, 4)
    assert(oldOpened < oldTotal)
    assert(oldHit.as[(Long, String)].collect().toMap ===
      beforeRows.filter(_._1 == 5L))
    // the new dir's lookups honor the NEW pin and open ~1/16
    val (newHit, newOpened, newTotal) =
      StreamingMerge.lookup(spark, newDir, "id", 5L, 16)
    assert(newOpened < newTotal && newOpened * 4 <= newTotal,
      s"16-bucket lookup should open ~1/16: $newOpened of $newTotal")
    assert(newHit.as[(Long, String)].collect().toMap ===
      beforeRows.filter(_._1 == 5L))
    // a stale caller passing the OLD count at the new dir fails loudly
    intercept[IllegalArgumentException] {
      StreamingMerge.lookup(spark, newDir, "id", 5L, 4)
    }
    // replayed rebucket of the same source version is a no-op
    assert(StreamingMerge.rebucket(spark, dir, newDir, 16, "id") === 1L)
    assert(VersionedTable.versions(spark, newDir) === Seq(1L))
    // the new table is a live CDC table: merges continue under its pin
    StreamingMerge.applyBatch(
      Seq(Change(5L, "doc 5 v3", 999L, "upsert")).toDF(),
      "id", "seq", "op", newDir, 16)
    assert(StreamingMerge.snapshot(spark, newDir)
      .filter(col("id") === 5L).select("text").as[String].head()
      === "doc 5 v3")
  }

  test("changeFeedRows on an id-only table: insert/delete-only feed, " +
    "carried ids emit nothing (struct() analysis failure fixed)") {
    val dir = tmp("cfr_idonly")
    VersionedTable.publish(Seq(1L, 2L).toDF("id"), dir, "b1")
    VersionedTable.publish(Seq(2L, 3L).toDF("id"), dir, "b2")
    val feed = StreamingMerge.changeFeedRows(spark, dir, 1L, 2L, "id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // id 2 is in both versions' (fully rewritten) file sets with an
    // empty payload — identical, so NO event; 1 deleted, 3 inserted
    assert(feed === Set(("insert", 3L), ("delete", 1L)))
    VersionedTable.drop(spark, dir)
  }

  test("requireNBuckets fails on a MISSING pin instead of passing " +
    "vacuously (rebucket's create-failure fallback)") {
    val dir = tmp("nopin")
    intercept[IllegalArgumentException] {
      VersionedBuckets.requireNBuckets(spark, dir, 16)
    }
    VersionedBuckets.writeNBuckets(spark, dir, 16)
    VersionedBuckets.requireNBuckets(spark, dir, 16) // now fine
    intercept[IllegalArgumentException] {
      VersionedBuckets.requireNBuckets(spark, dir, 8) // mismatch
    }
    VersionedTable.drop(spark, dir)
  }
}
