package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class VersionedTableSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/vt_spec_${tag}_" +
      java.util.UUID.randomUUID().toString.take(8)
    VersionedTable.drop(spark, d)
    d
  }

  test("publish / readLatest / readAsOf round-trip; old versions are " +
    "immutable snapshots") {
    val dir = freshDir("basic")
    val v1 = VersionedTable.publish(
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), dir, "batch-1")
    assert(v1 === 1L)
    val v2 = VersionedTable.publish(
      Seq((1L, "a2"), (3L, "c")).toDF("id", "s"), dir, "batch-2")
    assert(v2 === 2L)
    assert(VersionedTable.versions(spark, dir) === Seq(1L, 2L))
    val r1 = VersionedTable.readAsOf(spark, dir, 1L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(r1 === Map(1L -> "a", 2L -> "b"),
      "v1 must be unchanged after v2's publish")
    val latest = VersionedTable.readLatest(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(latest === Map(1L -> "a2", 3L -> "c"))
    VersionedTable.drop(spark, dir)
  }

  test("a terminated manifest with a malformed version line fails " +
    "LOUDLY instead of silently hiding a committed version") {
    val dir = freshDir("corrupt")
    VersionedTable.publish(Seq((1L, "a")).toDF("id", "s"), dir, "b1")
    // hand-write a terminated manifest whose version line is garbage —
    // manifest corruption, not a torn write (the terminator is last)
    val p = new java.io.File(s"$dir/_manifests/2")
    val w = new java.io.FileWriter(p)
    w.write("version=abc\nbatchId=bx\nschema={}\ncommitted\n")
    w.close()
    val ex = intercept[IllegalStateException] {
      VersionedTable.versions(spark, dir)
    }
    assert(ex.getMessage.contains("corrupt committed manifest"))
    // an UNTERMINATED stub with the same garbage stays invisible (a
    // torn write, not corruption)
    val w2 = new java.io.FileWriter(p)
    w2.write("version=abc\nbatchId=bx\nschema={}\n")
    w2.close()
    assert(VersionedTable.versions(spark, dir) === Seq(1L))
    VersionedTable.drop(spark, dir)
  }

  test("a torn write is invisible: orphan data files and an " +
    "unterminated manifest never reach a reader") {
    val dir = freshDir("torn")
    VersionedTable.publish(Seq((1L, "a")).toDF("id", "s"), dir, "b1")
    // simulate a crashed writer: data dir with no manifest, plus a
    // reserved-but-unterminated manifest stub
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((9L, "garbage")).toDF("id", "s")
      .write.parquet(s"$dir/data/orphan-uuid")
    val stub = fs.create(new org.apache.hadoop.fs.Path(s"$dir/_manifests/2"),
      false)
    stub.write("version=2\nbatchId=crashed\nschema={}\n".getBytes)
    stub.close()
    // readers: only the committed version exists
    assert(VersionedTable.versions(spark, dir) === Seq(1L))
    assert(VersionedTable.latestVersion(spark, dir) === Some(1L))
    assert(VersionedTable.readLatest(spark, dir).collect()
      .map(_.getString(1)).toSeq === Seq("a"))
    intercept[NoSuchElementException] {
      VersionedTable.readAsOf(spark, dir, 2L)
    }
    // a new publish skips the reserved slot and lands at 3
    val v = VersionedTable.publish(Seq((2L, "b")).toDF("id", "s"), dir, "b2")
    assert(v === 3L, "writer must skip the crashed writer's slot")
    assert(VersionedTable.versions(spark, dir) === Seq(1L, 3L))
    VersionedTable.drop(spark, dir)
  }

  test("replay idempotence: re-publishing a committed batchId is a " +
    "no-op returning the original version") {
    val dir = freshDir("replay")
    val v1 = VersionedTable.publish(Seq((1L, "a")).toDF("id", "s"), dir, "b1")
    val v1b = VersionedTable.publish(
      Seq((99L, "DIFFERENT")).toDF("id", "s"), dir, "b1")
    assert(v1b === v1, "same batchId must return the committed version")
    assert(VersionedTable.versions(spark, dir) === Seq(1L))
    assert(VersionedTable.readLatest(spark, dir).collect()
      .map(_.getString(1)).toSeq === Seq("a"),
      "replay must not change the committed data")
    VersionedTable.drop(spark, dir)
  }

  test("gc retention: old versions and unreferenced data dirs go; " +
    "retained versions keep reading") {
    val dir = freshDir("gc")
    for (i <- 1 to 3)
      VersionedTable.publish(Seq((i.toLong, s"v$i")).toDF("id", "s"),
        dir, s"b$i")
    // orphan from a crashed writer
    Seq((9L, "orphan")).toDF("id", "s").write.parquet(s"$dir/data/orphan")
    // grace 0: everything unreferenced is fair game immediately
    val (mDel, dDel) = VersionedTable.gc(spark, dir, keepLast = 2,
      orphanGraceMs = 0L)
    assert(mDel === 1 && dDel === 2,
      s"expected 1 manifest + 2 data dirs deleted, got ($mDel, $dDel)")
    intercept[NoSuchElementException] {
      VersionedTable.readAsOf(spark, dir, 1L)
    }
    assert(VersionedTable.readAsOf(spark, dir, 2L).collect()
      .map(_.getString(1)).toSeq === Seq("v2"))
    assert(VersionedTable.readAsOf(spark, dir, 3L).collect()
      .map(_.getString(1)).toSeq === Seq("v3"))
    // post-gc publish continues the version sequence
    val v4 = VersionedTable.publish(Seq((4L, "v4")).toDF("id", "s"),
      dir, "b4")
    assert(v4 === 4L)
    VersionedTable.drop(spark, dir)
  }

  test("gc on a table with NO committed version (writer crashed before " +
    "its first commit) still reclaims aged stubs and orphan data") {
    val dir = freshDir("gcempty")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    Seq((1L, "orphan")).toDF("id", "s").write.parquet(s"$dir/data/o1")
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dir/_manifests"))
    val stub = fs.create(
      new org.apache.hadoop.fs.Path(s"$dir/_manifests/1"), false)
    stub.write("version=1\nbatchId=crashed\n".getBytes)
    stub.close()
    val (mDel, dDel) = VersionedTable.gc(spark, dir, keepLast = 1,
      orphanGraceMs = 0L)
    assert(mDel === 1 && dDel === 1, s"($mDel, $dDel)")
    assert(VersionedTable.versions(spark, dir).isEmpty)
    VersionedTable.drop(spark, dir)
  }

  test("gc grace window: young unreferenced data (an in-flight publish " +
    "between data write and commit) is NOT collected") {
    val dir = freshDir("grace")
    VersionedTable.publish(Seq((1L, "a")).toDF("id", "s"), dir, "b1")
    // an in-flight publisher's data dir: written, not yet committed
    Seq((9L, "inflight")).toDF("id", "s")
      .write.parquet(s"$dir/data/inflight-uuid")
    val (_, dDel) = VersionedTable.gc(spark, dir, keepLast = 1)
    assert(dDel === 0,
      "default grace must protect the in-flight publisher's files")
    assert(new java.io.File(s"$dir/data/inflight-uuid").exists())
    // aged out (grace 0) it IS an orphan
    val (_, dDel2) = VersionedTable.gc(spark, dir, keepLast = 1,
      orphanGraceMs = 0L)
    assert(dDel2 === 1)
    VersionedTable.drop(spark, dir)
  }

  test("concurrent SAME-batchId publishers (zombie-driver replay race): " +
    "exactly one canonical version, all callers agree on it") {
    val dir = freshDir("zombie")
    val results = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val threads = (1 to 8).map { i =>
      new Thread(() => {
        results.add(VersionedTable.publish(
          Seq((1L, "payload")).toDF("id", "s"), dir, "the-one-batch"))
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    val returned = results.asScala.toSet
    assert(returned.size === 1,
      s"all publishers of one batchId must converge: $returned")
    // exactly one committed manifest carries the batchId
    val vs = VersionedTable.versions(spark, dir)
    val withBatch = vs.filter(v => VersionedTable
      .committedVersionOf(spark, dir, "the-one-batch").contains(v))
    assert(withBatch.size === 1 && returned.head === withBatch.head)
    // the table reads one clean copy of the payload
    assert(VersionedTable.readLatest(spark, dir).count() === 1L)
    VersionedTable.drop(spark, dir)
  }

  test("publishFiles: untouched files carry into the next version by " +
    "reference; readers of both versions see complete data") {
    val dir = freshDir("carry")
    VersionedTable.publish(
      (1L to 100L).map(i => (i, s"r$i")).toDF("id", "s"), dir, "b1")
    val m1 = VersionedTable.latestManifest(spark, dir).get
    // write a delta data dir by hand and commit old-files + new-files
    Seq((101L, "r101")).toDF("id", "s")
      .write.parquet(s"$dir/data/delta-uuid")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val deltaFiles = fs.listStatus(
      new org.apache.hadoop.fs.Path(s"$dir/data/delta-uuid")).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(s => s"data/delta-uuid/${s.getPath.getName}")
    val v2 = VersionedTable.publishFiles(spark, dir, "b2", m1.schemaJson,
      m1.files ++ deltaFiles)
    assert(v2 === 2L)
    assert(VersionedTable.readAsOf(spark, dir, 2L).count() === 101L)
    assert(VersionedTable.readAsOf(spark, dir, 1L).count() === 100L)
    // replay of the carry-over commit is idempotent too
    assert(VersionedTable.publishFiles(spark, dir, "b2", m1.schemaJson,
      m1.files ++ deltaFiles) === 2L)
    VersionedTable.drop(spark, dir)
  }

  test("compact commits a new right-sized version, preserves rows " +
    "bit-for-bit, and replays idempotently per source version") {
    val dir = freshDir("compact")
    // many small versions → many small files in the latest? no: compact
    // works on ONE version; give it a fragmented one via repartition
    val df = (1L to 1000L).map(i => (i, s"row $i")).toDF("id", "s")
      .repartition(32)
    VersionedTable.publish(df, dir, "frag")
    val before = VersionedTable.latestManifest(spark, dir).get.files.size
    assert(before > 1)
    val (b, a) = VersionedTable.compact(spark, dir)
    assert(b === before && a < b, s"expected shrink, got ($b, $a)")
    val rows = VersionedTable.readLatest(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rows === (1L to 1000L).map(i => i -> s"row $i").toMap)
    // v1 untouched; compaction never rewrites readable bytes
    assert(VersionedTable.readAsOf(spark, dir, 1L).count() === 1000L)
    // replay: compacting the already-compacted latest is a fresh
    // source version, but re-requesting v1's compaction is a no-op
    val vs = VersionedTable.versions(spark, dir)
    assert(VersionedTable.publishFiles(spark, dir, "compact-of-v1",
      "{}", Nil) === vs.last, "batchId replay must short-circuit")
    assert(VersionedTable.versions(spark, dir) === vs)
    VersionedTable.drop(spark, dir)
  }

  test("optimistic read-modify-write: a stale base version aborts the " +
    "commit (nothing durable) instead of losing the intervening write") {
    val dir = freshDir("occ")
    VersionedTable.publish(Seq((1L, "a")).toDF("id", "s"), dir, "b1")
    // another writer lands after our (simulated) read of version 1
    VersionedTable.publish(Seq((2L, "b")).toDF("id", "s"), dir, "b2")
    intercept[java.util.ConcurrentModificationException] {
      VersionedTable.publishIfUnchanged(
        Seq((1L, "stale")).toDF("id", "s"), dir, "b3",
        expectedBaseVersion = 1L)
    }
    assert(VersionedTable.versions(spark, dir) === Seq(1L, 2L),
      "the conflicted commit must leave no manifest")
    // based on the true latest it commits cleanly
    assert(VersionedTable.publishIfUnchanged(
      Seq((3L, "c")).toDF("id", "s"), dir, "b3",
      expectedBaseVersion = 2L) === 3L)
    VersionedTable.drop(spark, dir)
  }

  test("schema evolution across versions: each version reads with its " +
    "OWN manifest schema — old versions keep their shape after a " +
    "widened publish") {
    val dir = freshDir("evolve")
    VersionedTable.publish(Seq((1L, "a")).toDF("id", "s"), dir, "b1")
    VersionedTable.publish(
      Seq((2L, "b", 3.5)).toDF("id", "s", "score"), dir, "b2")
    val v1 = VersionedTable.readAsOf(spark, dir, 1L)
    assert(v1.schema.fieldNames.toSeq === Seq("id", "s"))
    assert(v1.count() === 1L)
    val v2 = VersionedTable.readAsOf(spark, dir, 2L)
    assert(v2.schema.fieldNames.toSeq === Seq("id", "s", "score"))
    assert(v2.collect().head.getDouble(2) === 3.5)
    VersionedTable.drop(spark, dir)
  }

  test("timestamp time travel: the newest version committed at or " +
    "before ts wins; too-early timestamps fail loudly") {
    val dir = freshDir("ts")
    VersionedTable.publish(Seq((1L, "v1")).toDF("id", "s"), dir, "b1")
    Thread.sleep(20)
    val mid = System.currentTimeMillis()
    Thread.sleep(20)
    VersionedTable.publish(Seq((1L, "v2")).toDF("id", "s"), dir, "b2")
    assert(VersionedTable.readAsOfTimestamp(spark, dir, mid)
      .collect().head.getString(1) === "v1")
    assert(VersionedTable
      .readAsOfTimestamp(spark, dir, System.currentTimeMillis())
      .collect().head.getString(1) === "v2")
    intercept[NoSuchElementException] {
      VersionedTable.readAsOfTimestamp(spark, dir, mid - 60000L)
    }
    VersionedTable.drop(spark, dir)
  }

  test("zone-map stats: a range-clustered publish records per-file " +
    "min/max and a narrow read opens only matching files") {
    val dir = freshDir("zonemap")
    val df = (1L to 10000L).map(i => (i, s"r$i")).toDF("id", "s")
      .repartitionByRange(16, col("id"))
    VersionedTable.publish(df, dir, "b1", statsCols = Seq("id"))
    val m = VersionedTable.latestManifest(spark, dir).get
    val mStats = VersionedTable.fileMetaOf(spark, dir, m.version)._1
    assert(m.files.size === 16 && mStats.size === 16,
      s"one id stat per file: ${mStats.size}/${m.files.size}")
    val (pruned, opened, total) =
      VersionedTable.readLatestPruned(spark, dir, "id", 2000.0, 2500.0)
    assert(total === 16 && opened <= 3,
      s"a 5% range must skip most files: opened $opened/$total")
    val got = pruned.collect().map(_.getLong(0)).sorted
    assert(got.toSeq === (2000L to 2500L),
      "pruned read must equal the full-scan filter exactly")
    // a version published WITHOUT stats keeps every file (conservative)
    VersionedTable.publish(df, dir, "b2")
    val (_, o2, t2) =
      VersionedTable.readLatestPruned(spark, dir, "id", 2000.0, 2500.0)
    assert(o2 === t2, "no stats -> no skipping, never wrong results")
    // compact(sortCol + statsCols) restores clustering AND stats
    VersionedTable.compact(spark, dir, targetBytes = 64L << 10,
      sortCol = Some("id"), statsCols = Seq("id"))
    val (p3, o3, t3) =
      VersionedTable.readLatestPruned(spark, dir, "id", 2000.0, 2500.0)
    assert(o3 < t3, s"compacted zone maps must prune: $o3/$t3")
    assert(p3.count() === 501L)
    VersionedTable.drop(spark, dir)
  }

  test("empty dataframe publishes and time-travels via its schema") {
    val dir = freshDir("empty")
    val empty = Seq((1L, "x")).toDF("id", "s").filter(lit(false))
    VersionedTable.publish(empty, dir, "b-empty")
    val r = VersionedTable.readAsOf(spark, dir, 1L)
    assert(r.count() === 0L)
    assert(r.schema.fieldNames.toSeq === Seq("id", "s"))
    VersionedTable.drop(spark, dir)
  }

  test("concurrent distinct-batch publishers: every batch commits, " +
    "all versions distinct, table never torn") {
    // full-suite load exposed the local-FS check-then-act create race
    // (5/6 versions, one manifest silently truncated) — the claim now
    // goes through POSIX O_CREAT|O_EXCL; 8 writers × 2 rounds keep the
    // window under contention
    val dir = freshDir("conc")
    for (round <- 0 to 1) {
      val threads = (1 to 8).map { i =>
        new Thread(() => {
          VersionedTable.publish(
            Seq((i.toLong, s"t$round-$i")).toDF("id", "s"),
            dir, s"batch-$round-$i")
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join())
    }
    val vs = VersionedTable.versions(spark, dir)
    assert(vs.size === 16 && vs.distinct.size === 16, s"versions: $vs")
    // every committed version reads exactly its one row; no batch's
    // data was lost to a slot race
    val all = vs.flatMap(v =>
      VersionedTable.readAsOf(spark, dir, v).collect()
        .map(_.getString(1)))
    assert(all.toSet ===
      (for (r <- 0 to 1; i <- 1 to 8) yield s"t$r-$i").toSet)
    VersionedTable.drop(spark, dir)
  }

  test("metadata hot path is O(1) in version history: 1000 committed " +
    "versions, each operation parses a bounded handful of manifests") {
    val dir = freshDir("meta")
    val schemaJson = Seq((1L, "x")).toDF("id", "s").schema.json
    // 1000 manifest-only commits (empty file lists — the protocol cost
    // without the parquet writes); checkpoints land every 10th version
    for (i <- 1 to 1000)
      VersionedTable.publishFiles(spark, dir, s"b-$i", schemaJson, Nil)
    assert(VersionedTable.versions(spark, dir).size === 1000)
    // checkpoint pruning: exactly one summary file survives
    val cps = new java.io.File(s"$dir/_checkpoints").listFiles()
    assert(cps != null && cps.length === 1, s"checkpoints: ${cps.toSeq}")
    def parses(op: => Unit): Long = {
      val before = VersionedTable.manifestParses.get()
      op
      VersionedTable.manifestParses.get() - before
    }
    // every hot operation must read O(1) manifest files — NOT the
    // round-13 O(versions) full parse (which would be 1000 here).
    // Budget: the ≤ CheckpointEvery post-checkpoint tail + the target
    // manifest + a stub or two of slack.
    val budget = 15L
    val pLatest = parses(VersionedTable.latestVersion(spark, dir))
    assert(pLatest <= budget, s"latestVersion parsed $pLatest manifests")
    val pRead = parses(VersionedTable.readLatest(spark, dir).schema)
    assert(pRead <= budget, s"readLatest parsed $pRead manifests")
    val pAsOf = parses(VersionedTable.readAsOf(spark, dir, 500L).schema)
    assert(pAsOf <= 2L, s"readAsOf parsed $pAsOf manifests")
    val pBatch = parses(assert(
      VersionedTable.committedVersionOf(spark, dir, "b-500") === Some(500L)))
    assert(pBatch <= budget, s"committedVersionOf parsed $pBatch manifests")
    val pPub = parses(VersionedTable.publishFiles(spark, dir, "b-new",
      schemaJson, Nil))
    assert(pPub <= 2 * budget, s"publishFiles parsed $pPub manifests")
    // replay of an ancient batchId still resolves (through the
    // checkpoint) without a full parse
    val pReplay = parses(assert(VersionedTable.publishFiles(spark, dir,
      "b-7", schemaJson, Nil) === 7L))
    assert(pReplay <= budget, s"replay parsed $pReplay manifests")
    // correctness is untouched by the summary level: gc retains and
    // rewrites the checkpoint, reads keep working, travel to a GC'd
    // version fails loudly
    VersionedTable.gc(spark, dir, keepLast = 50, orphanGraceMs = 0L)
    val vs = VersionedTable.versions(spark, dir)
    assert(vs.size === 50 && vs.last === 1001L, s"${vs.take(3)}..${vs.last}")
    intercept[NoSuchElementException] {
      VersionedTable.readAsOf(spark, dir, 10L)
    }
    val pAfterGc = parses(VersionedTable.latestVersion(spark, dir))
    assert(pAfterGc <= budget, s"post-gc latestVersion parsed $pAfterGc")
    VersionedTable.drop(spark, dir)
  }

  test("metadata-only row count equals the scan count per version, " +
    "with zero Spark jobs") {
    val dir = freshDir("rowcount")
    VersionedTable.publish((1L to 1234L).map(i => (i, s"r$i"))
      .toDF("id", "s").repartition(7), dir, "c1")
    VersionedTable.publish((1L to 77L).map(i => (i, s"r$i"))
      .toDF("id", "s"), dir, "c2")
    val jobsBefore = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(VersionedTable.rowCountOf(spark, dir, 1L) === 1234L)
    assert(VersionedTable.rowCountOf(spark, dir, 2L) === 77L)
    assert(VersionedTable.rowCountLatest(spark, dir) === 77L)
    assert(spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
      === jobsBefore, "footer counting must run no Spark job")
    assert(VersionedTable.readAsOf(spark, dir, 1L).count() === 1234L)
    // empty version: zero files, zero rows
    VersionedTable.publish(Seq((1L, "x")).toDF("id", "s")
      .filter(lit(false)), dir, "c3")
    assert(VersionedTable.rowCountOf(spark, dir, 3L) === 0L)
    VersionedTable.drop(spark, dir)
  }

  test("bloom point lookup: a hash-laid publish records per-file " +
    "blooms and an id probe opens ~1 file; result ≡ full-scan filter") {
    val dir = freshDir("bloom")
    // hash layout: each id lives in exactly one of 16 files
    val rows = (0L until 4000L).map(i => (i, s"payload-$i"))
      .toDF("id", "payload").repartition(16, col("id"))
    VersionedTable.publish(rows, dir, "cut-1", bloomCols = Seq("id"))
    val (df, opened, total) = VersionedTable.readLatestPoint(
      spark, dir, "id", 1234L)
    assert(total === 16)
    assert(opened <= 2, s"bloom failed to skip: opened $opened/$total")
    assert(df.collect().map(_.getString(1)).toSeq === Seq("payload-1234"))
    // probe equals the unpruned filter for MANY keys (false positives
    // only ever open more files, never change rows)
    Seq(0L, 7L, 3999L).foreach { k =>
      val (d2, o2, _) = VersionedTable.readLatestPoint(spark, dir, "id", k)
      assert(o2 <= 3)
      assert(d2.count() === 1L, s"key $k")
    }
    // an ABSENT key: a bloom has no false negatives — typically zero
    // files open, always zero rows
    val (dAbs, oAbs, _) = VersionedTable.readLatestPoint(
      spark, dir, "id", 999999L)
    assert(dAbs.count() === 0L)
    assert(oAbs <= 2, s"absent key opened $oAbs files")
    // string-typed probe column works through the same path
    val dir2 = freshDir("bloomstr")
    val srows = (0L until 1000L).map(i => (s"user-$i", i))
      .toDF("uid", "v").repartition(8, col("uid"))
    VersionedTable.publish(srows, dir2, "cut-1", bloomCols = Seq("uid"))
    val (ds, os, ts) = VersionedTable.readLatestPoint(
      spark, dir2, "uid", "user-77")
    assert(os < ts && ds.collect().map(_.getLong(1)).toSeq === Seq(77L))
    // a version published WITHOUT blooms never prunes but stays exact
    val dir3 = freshDir("nobloom")
    VersionedTable.publish(rows, dir3, "cut-1")
    val (dn, on, tn) = VersionedTable.readLatestPoint(
      spark, dir3, "id", 1234L)
    assert(on === tn)
    assert(dn.count() === 1L)
    VersionedTable.drop(spark, dir)
    VersionedTable.drop(spark, dir2)
    VersionedTable.drop(spark, dir3)
  }

  test("write-audit-publish: a staged cut is invisible until promote, " +
    "promote is atomic old-or-new, a failing constraint blocks it") {
    import graft.operators.Checks
    val dir = freshDir("wap")
    VersionedTable.publish(Seq((1L, "old")).toDF("id", "s"), dir, "b1")
    // stage a BAD cut (null key) — completely invisible to readers
    val badId = VersionedTable.publishStaged(
      Seq((Some(2L), "x"), (None, "y"))
        .map { case (i, s) => (i.map(Long.box).orNull, s) }
        .toDF("id", "s"), dir, "b2")
    assert(VersionedTable.versions(spark, dir) === Seq(1L),
      "staging must not commit a version")
    assert(VersionedTable.readLatest(spark, dir).collect()
      .map(_.getString(1)).toSeq === Seq("old"))
    // the audit surface sees exactly the staged rows
    assert(VersionedTable.readStaged(spark, dir, badId).count() === 2L)
    // failing constraint BLOCKS promotion, staged cut stays inspectable
    val ex = intercept[IllegalStateException] {
      Checks.auditAndPromote(spark, dir, badId,
        Seq(Checks.NotNull("id")))
    }
    assert(ex.getMessage.contains("promotion blocked"), ex.getMessage)
    assert(VersionedTable.versions(spark, dir) === Seq(1L))
    assert(VersionedTable.readStaged(spark, dir, badId).count() === 2L)
    VersionedTable.discardStaged(spark, dir, badId)
    intercept[NoSuchElementException] {
      VersionedTable.readStaged(spark, dir, badId)
    }
    // a GOOD cut passes the gate and promotes atomically
    val goodId = VersionedTable.publishStaged(
      Seq((2L, "new"), (3L, "new2")).toDF("id", "s"), dir, "b3")
    // gc with zero grace must NOT reclaim staged data mid-audit
    VersionedTable.gc(spark, dir, keepLast = 5, orphanGraceMs = 0L)
    assert(VersionedTable.readStaged(spark, dir, goodId).count() === 2L)
    val v = Checks.auditAndPromote(spark, dir, goodId,
      Seq(Checks.NotNull("id"), Checks.Unique(Seq("id"))))
    assert(v === 2L)
    assert(VersionedTable.readLatest(spark, dir).collect()
      .map(_.getString(1)).toSet === Set("new", "new2"))
    // the staged marker is consumed; staging an already-committed
    // batchId is refused
    intercept[NoSuchElementException] {
      VersionedTable.readStaged(spark, dir, goodId)
    }
    intercept[IllegalStateException] {
      VersionedTable.publishStaged(Seq((9L, "z")).toDF("id", "s"),
        dir, "b3")
    }
    VersionedTable.drop(spark, dir)
  }

  test("checkpoints are advisory: a deleted or torn checkpoint never " +
    "changes results, late-committed slots are still seen") {
    val dir = freshDir("cpadv")
    for (i <- 1 to 25)
      VersionedTable.publish(Seq((i.toLong, s"v$i")).toDF("id", "s"),
        dir, s"b$i")
    val withCp = VersionedTable.versions(spark, dir)
    // blow the checkpoint away: full fallback, identical answers
    val cd = new java.io.File(s"$dir/_checkpoints")
    cd.listFiles().foreach(_.delete())
    assert(VersionedTable.versions(spark, dir) === withCp)
    assert(VersionedTable.readLatest(spark, dir).count() === 1L)
    // torn checkpoint (no terminator): ignored, not an error
    val torn = new java.io.FileWriter(s"$dir/_checkpoints/99")
    torn.write("v=1\u00010\u0001bogus\n"); torn.close()
    assert(VersionedTable.versions(spark, dir) === withCp)
    assert(VersionedTable.committedVersionOf(spark, dir, "b3") === Some(3L))
    VersionedTable.drop(spark, dir)
  }

  test("slot numbers are never reused: a checkpoint-captured then " +
    "deleted top slot cannot serve stale identity to a new commit") {
    val dir = freshDir("slotreuse")
    for (i <- 1 to 10)
      VersionedTable.publish(Seq((i.toLong, s"v$i")).toDF("id", "s"),
        dir, s"b$i")
    // the commit cadence wrote a checkpoint at v10 summarizing slot 10
    val top = new java.io.File(s"$dir/_manifests/10")
    assert(top.exists())
    // canonicalization / missing-files-rollback shape: the committed
    // top slot vanishes AFTER the checkpoint captured it
    assert(top.delete())
    val v = VersionedTable.publish(Seq((99L, "new")).toDF("id", "s"),
      dir, "bNew")
    assert(v === 11L, "slot 10 must never be re-claimed — a stale " +
      "checkpoint entry would serve the old (batchId, ts) for it")
    assert(VersionedTable.committedVersionOf(spark, dir, "bNew")
      === Some(11L))
    assert(VersionedTable.committedVersionOf(spark, dir, "b10") === None,
      "the deleted version's batchId must not resolve to the new slot")
    assert(VersionedTable.readAsOf(spark, dir, 11L).collect()
      .map(_.getString(1)).toSeq === Seq("new"))
    VersionedTable.drop(spark, dir)
  }

  test("publishing an empty cut with bloomCols commits cleanly " +
    "(no blooms) instead of crashing") {
    val dir = freshDir("emptybloom")
    val empty = Seq((1L, "a")).toDF("id", "s").filter(col("id") < 0L)
    val v = VersionedTable.publish(empty, dir, "b-empty",
      bloomCols = Seq("id"), statsCols = Seq("id"))
    assert(v === 1L)
    assert(VersionedTable.readLatest(spark, dir).count() === 0L)
    assert(VersionedTable.rowCountOf(spark, dir, 1L) === 0L)
    // an EMPTY file holds no values: zero row count keeps stat
    // coverage intact and the range is None (no values), not a crash
    assert(VersionedTable.statRangeOf(spark, dir, 1L, "id") === None)
    VersionedTable.drop(spark, dir)
  }

  test("count(*) is ONE manifest read: rowCountOf opens zero footers " +
    "on manifests carrying rows=, falls back (counted) on legacy ones") {
    val dir = freshDir("rowcounts")
    VersionedTable.publish(
      (1L to 100L).map(i => (i, s"x$i")).toDF("id", "s").repartition(4),
      dir, "b1")
    VersionedTable.publish(
      (1L to 37L).map(i => (i, s"y$i")).toDF("id", "s").repartition(3),
      dir, "b2")
    val before = VersionedTable.footerReads.get()
    assert(VersionedTable.rowCountOf(spark, dir, 1L) === 100L)
    assert(VersionedTable.rowCountLatest(spark, dir) === 37L)
    assert(VersionedTable.footerReads.get() === before,
      "round-15 manifests must answer count(*) without footer I/O")
    // per-file counts cover every file and sum to the total
    val perFile = VersionedTable.fileRowCountsOf(spark, dir, 1L)
    assert(perFile.keySet === VersionedTable.filesOf(spark, dir, 1L).toSet)
    assert(perFile.values.sum === 100L)
    // LEGACY manifest (predating rows=): strip the lines — the footer
    // fallback gives the same answer and counts its opens
    val mPath = s"$dir/_manifests/1"
    val src = scala.io.Source.fromFile(mPath)
    val stripped = try src.getLines().filterNot(l =>
      l.startsWith("rows=") || l.startsWith("metaref="))
      .mkString("\n") + "\n" finally src.close()
    val w = new java.io.FileWriter(mPath); w.write(stripped); w.close()
    assert(VersionedTable.rowCountOf(spark, dir, 1L) === 100L)
    assert(VersionedTable.footerReads.get() > before,
      "the legacy path must be the counted footer fallback")
    VersionedTable.drop(spark, dir)
  }

  test("gcReport: the dry run predicts exactly what gc reclaims, " +
    "shared (carried) files excluded, bytes from manifest sizes") {
    val dir = freshDir("gcreport")
    // v1: two files; v2 CARRIES one of them + adds one (copy-on-write)
    val a = Seq((1L, "a")).toDF("id", "s")
    VersionedTable.publish(a, dir, "b1")
    val v1Files = VersionedTable.filesOf(spark, dir, 1L)
    val bDir = s"data/extra-${java.util.UUID.randomUUID()}"
    Seq((2L, "b")).toDF("id", "s").coalesce(1)
      .write.parquet(s"$dir/$bDir")
    val bFile = new java.io.File(s"$dir/$bDir").listFiles()
      .filter(_.getName.endsWith(".parquet")).head.getName
    VersionedTable.publishFiles(spark, dir, "b2",
      a.schema.json, v1Files :+ s"$bDir/$bFile")
    VersionedTable.publish(Seq((3L, "c")).toDF("id", "s"), dir, "b3")
    // keepLast=1 drops v1+v2; v1's file is shared with v2 (also
    // dropped) so it IS reclaimable; nothing v3 references is
    val (mDrop, fDrop, bytes) = VersionedTable.gcReport(spark, dir, 1)
    assert(mDrop === 2)
    assert(fDrop === 2, "v1's file + v2's extra file are reclaimable")
    assert(bytes > 0L)
    // keepLast=2 keeps v2+v3: v1's file is CARRIED by v2 — not
    // reclaimable; dropping v1 reclaims no files
    assert(VersionedTable.gcReport(spark, dir, 2) === ((1, 0, 0L)))
    // the dry run ≡ the real sweep (data-dir granularity: v1's dir
    // and v2's extra dir go; v3's stays)
    val (mGone, dGone) = VersionedTable.gc(spark, dir, keepLast = 1,
      orphanGraceMs = 0L)
    assert(mGone === 2 && dGone === 2)
    assert(VersionedTable.readLatest(spark, dir).count() === 1L)
    VersionedTable.drop(spark, dir)
  }

  test("readAsOfPointMulti: a conjunctive probe opens no more files " +
    "than its tightest single column and stays ≡ the filter") {
    val dir = freshDir("multiprobe")
    // two independent 32-value keys spread over 16 files: either
    // column's bloom keeps ~1/32 of files per value, the conjunction
    // keeps their intersection
    val df = (1L to 4096L).map(i =>
      (i, s"a${i % 32}", s"b${(i / 32) % 32}")).toDF("id", "a", "b")
    VersionedTable.publish(df.repartition(16), dir, "b1",
      bloomCols = Seq("a", "b"))
    val (both, oBoth, total) = VersionedTable.readAsOfPointMulti(
      spark, dir, 1L, Map("a" -> "a7", "b" -> "b3"))
    val (_, oA, _) = VersionedTable.readAsOfPoint(spark, dir, 1L,
      "a", "a7")
    val (_, oB, _) = VersionedTable.readAsOfPoint(spark, dir, 1L,
      "b", "b3")
    assert(oBoth <= math.min(oA, oB),
      s"conjunction must not open more than either side: " +
        s"$oBoth vs ($oA, $oB) of $total")
    assert(both.collect().map(_.getLong(0)).toSet ===
      df.filter(col("a") === "a7" && col("b") === "b3")
        .collect().map(_.getLong(0)).toSet)
    // a column without a recorded bloom prunes nothing but stays exact
    val (byId, oId, _) = VersionedTable.readAsOfPointMulti(
      spark, dir, 1L, Map("id" -> 77L, "a" -> "a13"))
    assert(oId <= oA || oId <= total)
    assert(byId.collect().map(_.getLong(0)).toSeq === Seq(77L))
    // absent compound value: ~no files, zero rows
    val (none, _, _) = VersionedTable.readAsOfPointMulti(
      spark, dir, 1L, Map("a" -> "a7", "b" -> "nope"))
    assert(none.count() === 0L)
    VersionedTable.drop(spark, dir)
  }

  test("restore rolls back to an old version's exact content without " +
    "copying data; history keeps the bad cut; gc keeps shared files") {
    val dir = freshDir("restore")
    VersionedTable.publish(Seq((1L, "good")).toDF("id", "s"), dir, "b1",
      statsCols = Seq("id"))
    VersionedTable.publish(Seq((2L, "bad")).toDF("id", "s"), dir, "b2")
    val v3 = VersionedTable.restore(spark, dir, 1L)
    assert(v3 === 3L)
    // restored content ≡ v1, same files by reference (no copy)
    assert(VersionedTable.readLatest(spark, dir).collect()
      .map(_.getString(1)).toSeq === Seq("good"))
    assert(VersionedTable.filesOf(spark, dir, 3L)
      === VersionedTable.filesOf(spark, dir, 1L))
    // metadata carried: count and stat range survive the restore
    val before = VersionedTable.footerReads.get()
    assert(VersionedTable.rowCountOf(spark, dir, 3L) === 1L)
    assert(VersionedTable.footerReads.get() === before)
    assert(VersionedTable.statRangeOf(spark, dir, 3L, "id")
      === Some((1.0, 1.0)))
    // the bad cut stays inspectable until gc
    assert(VersionedTable.readAsOf(spark, dir, 2L).collect()
      .map(_.getString(1)).toSeq === Seq("bad"))
    // replayed restore: no new version
    assert(VersionedTable.restore(spark, dir, 1L) === 3L)
    assert(VersionedTable.versions(spark, dir) === Seq(1L, 2L, 3L))
    // restoring the current latest is a no-op
    assert(VersionedTable.restore(spark, dir, 3L) === 3L)
    // gc to the restored tail: v3's (shared) files survive
    VersionedTable.gc(spark, dir, keepLast = 1, orphanGraceMs = 0L)
    assert(VersionedTable.readLatest(spark, dir).collect()
      .map(_.getString(1)).toSeq === Seq("good"))
    VersionedTable.drop(spark, dir)
  }

  test("tableBytesOf sums the manifest's recorded sizes with zero " +
    "status probes; compact sizes itself the same way") {
    val dir = freshDir("sizes")
    VersionedTable.publish(
      (1L to 200L).map(i => (i, s"x$i")).toDF("id", "s").repartition(4),
      dir, "b1")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val walked = VersionedTable.filesOf(spark, dir, 1L).map(f =>
      fs.getFileStatus(new org.apache.hadoop.fs.Path(s"$dir/$f")).getLen)
      .sum
    val before = VersionedTable.sizeProbes.get()
    assert(VersionedTable.tableBytesOf(spark, dir, 1L) === walked)
    assert(VersionedTable.sizeProbes.get() === before,
      "round-15 manifests must answer table bytes without status I/O")
    // compact consumes the recorded sizes too — and its own commit
    // re-records sizes for the compacted files
    VersionedTable.compact(spark, dir, targetBytes = 1L << 30)
    assert(VersionedTable.sizeProbes.get() === before)
    val v2 = VersionedTable.latestVersion(spark, dir).get
    assert(VersionedTable.tableBytesOf(spark, dir, v2) > 0L)
    assert(VersionedTable.sizeProbes.get() === before)
    assert(VersionedTable.rowCountOf(spark, dir, v2) === 200L)
    // legacy manifest (no size= lines): fallback equal and counted
    val mPath = s"$dir/_manifests/1"
    val src = scala.io.Source.fromFile(mPath)
    val stripped = try src.getLines().filterNot(l =>
      l.startsWith("size=") || l.startsWith("metaref="))
      .mkString("\n") + "\n" finally src.close()
    val w = new java.io.FileWriter(mPath); w.write(stripped); w.close()
    assert(VersionedTable.tableBytesOf(spark, dir, 1L) === walked)
    assert(VersionedTable.sizeProbes.get() > before)
    VersionedTable.drop(spark, dir)
  }

  test("statRangeOf folds the zone maps into a metadata-only min/max; " +
    "incomplete stat coverage answers None, never a wrong range") {
    val dir = freshDir("statrange")
    val df = (1L to 100L).map(i => (i, i.toDouble * 1.5))
      .toDF("id", "v").repartition(4)
    VersionedTable.publish(df, dir, "b1", statsCols = Seq("v"))
    assert(VersionedTable.statRangeOf(spark, dir, 1L, "v")
      === Some((1.5, 150.0)))
    // untracked column: None (no stats recorded)
    assert(VersionedTable.statRangeOf(spark, dir, 1L, "id") === None)
    // a version published WITHOUT stats: None even for v
    VersionedTable.publish(df, dir, "b2")
    assert(VersionedTable.statRangeOf(spark, dir, 2L, "v") === None)
    // an all-null-column file breaks coverage → None (an all-null
    // file records no stat and is indistinguishable from an
    // untracked one — conservative, never wrong)
    val withNull = (1L to 10L).map(i => (i, Some(i.toDouble)))
      .toDF("id", "v").union(
        Seq((99L, None: Option[Double])).toDF("id", "v").repartition(1))
    VersionedTable.publish(withNull.repartition(5), dir, "b3",
      statsCols = Seq("v"))
    val r3 = VersionedTable.statRangeOf(spark, dir, 3L, "v")
    assert(r3.forall(r => r._1 == 1.0 && r._2 == 10.0),
      s"if covered the range must be right: $r3")
    VersionedTable.drop(spark, dir)
  }

  test("add-column schema evolution: zero data I/O, carried files " +
    "read nulls, old versions keep their schema; incompatible " +
    "evolutions are rejected") {
    import org.apache.spark.sql.types._
    val dir = freshDir("evolve")
    VersionedTable.publish(Seq((1L, "a"), (2L, "b")).toDF("id", "s"),
      dir, "b1")
    val old = VersionedTable.readLatest(spark, dir).schema
    val widened = StructType(old.fields :+
      StructField("score", DoubleType, nullable = true))
    val v2 = VersionedTable.evolveSchema(spark, dir, widened)
    assert(v2 === 2L)
    // the evolution commit rewrites NOTHING: same file list, counts
    // carried, count(*) still footer-free
    assert(VersionedTable.filesOf(spark, dir, 1L)
      === VersionedTable.filesOf(spark, dir, 2L))
    val before = VersionedTable.footerReads.get()
    assert(VersionedTable.rowCountOf(spark, dir, 2L) === 2L)
    assert(VersionedTable.footerReads.get() === before)
    // carried rows read the new column as null
    val rows = VersionedTable.readLatest(spark, dir).orderBy("id").collect()
    assert(rows.map(_.getString(1)).toSeq === Seq("a", "b"))
    assert(rows.forall(_.isNullAt(2)))
    // time travel reads v1 under the schema it was committed with
    assert(VersionedTable.readAsOf(spark, dir, 1L).schema.fieldNames
      .toSeq === Seq("id", "s"))
    // replay: evolving to the already-current schema is a no-op
    assert(VersionedTable.evolveSchema(spark, dir, widened) === 2L)
    // nullable -> non-nullable tightening over null-bearing data is
    // rejected (checked while the live column IS nullable)
    intercept[IllegalArgumentException] {
      VersionedTable.evolveSchema(spark, dir, StructType(
        widened.fields.map(f =>
          if (f.name == "score") f.copy(nullable = false) else f)))
    }
    // new publishes fill the column going forward
    VersionedTable.publish(Seq((3L, "c", 0.5)).toDF("id", "s", "score"),
      dir, "b3")
    val latest = VersionedTable.readLatest(spark, dir)
    assert(latest.where(col("score").isNotNull).count() === 1L)
    // rejected evolutions, all loud
    intercept[IllegalArgumentException] { // drops a column
      VersionedTable.evolveSchema(spark, dir, StructType(
        widened.fields.filterNot(_.name == "s")))
    }
    intercept[IllegalArgumentException] { // changes a type
      VersionedTable.evolveSchema(spark, dir, StructType(
        widened.fields.map(f =>
          if (f.name == "score") f.copy(dataType = StringType) else f)))
    }
    intercept[IllegalArgumentException] { // non-nullable addition
      VersionedTable.evolveSchema(spark, dir, StructType(
        widened.fields :+ StructField("must", LongType, nullable = false)))
    }
    VersionedTable.drop(spark, dir)
  }

  test("sidecar metadata plane: a 1-file change commits O(change) " +
    "metadata bytes — carried files keep stats/blooms/counts by " +
    "reference, and the manifest body holds refs only") {
    val dir = freshDir("sidecar")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def slotBytes(v: Long): Long =
      fs.getFileStatus(new org.apache.hadoop.fs.Path(
        s"$dir/_manifests/$v")).getLen
    def refBytes(v: Long): Long = {
      val m = VersionedTable.fileMetaRefsOf(spark, dir, v)
      (m._1 ++ m._2.map(_._1)).map(r => fs.getFileStatus(
        new org.apache.hadoop.fs.Path(s"$dir/$r")).getLen).sum
    }
    // v1: 16 files with zone maps AND blooms — the heavy metadata
    val df = (1L to 20000L).map(i => (i, s"r$i")).toDF("id", "s")
      .repartitionByRange(16, col("id"))
    VersionedTable.publish(df, dir, "b1", statsCols = Seq("id"),
      bloomCols = Seq("id"))
    val m1 = VersionedTable.latestManifest(spark, dir).get
    assert(m1.metaRefs.nonEmpty && m1.bloomRefs.nonEmpty,
      "round-16 commits must reference sidecars")
    assert(m1.stats.isEmpty && m1.blooms.isEmpty &&
      m1.rowCounts.isEmpty && m1.sizes.isEmpty,
      "no inline per-file metadata in a sidecar-era manifest")
    // v2: a 1-file change — carry 15, add 1 new file
    val extraRel = s"data/extra-${java.util.UUID.randomUUID()}"
    (90001L to 90002L).map(i => (i, s"n$i")).toDF("id", "s").coalesce(1)
      .write.parquet(s"$dir/$extraRel")
    val newFile = fs.listStatus(new org.apache.hadoop.fs.Path(
      s"$dir/$extraRel")).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(s => s"$extraRel/${s.getPath.getName}")
    val v2files = m1.files.tail ++ newFile
    VersionedTable.publishFilesIfUnchanged(spark, dir, "b2",
      m1.schemaJson, v2files, expectedBaseVersion = 1L,
      stats = VersionedTable.fileStats(spark, dir, newFile, Seq("id")),
      blooms = VersionedTable.fileBlooms(spark, dir, newFile, Seq("id")))
    // the CHANGE commit's metadata bytes: its manifest + the sidecars
    // it wrote (refs v2 carries that v1 didn't have) must be a small
    // fraction of v1's full metadata — O(change), not O(table)
    val m2 = VersionedTable.latestManifest(spark, dir).get
    val v1Refs = (m1.metaRefs ++ m1.bloomRefs.map(_._1)).toSet
    val newRefs = (m2.metaRefs ++ m2.bloomRefs.map(_._1))
      .filterNot(v1Refs)
    val newRefBytes = newRefs.map(r => fs.getFileStatus(
      new org.apache.hadoop.fs.Path(s"$dir/$r")).getLen).sum
    val changeBytes = slotBytes(2L) + newRefBytes
    assert(changeBytes * 4 < refBytes(1L),
      s"1-of-16-file change wrote $changeBytes metadata bytes vs " +
        s"${refBytes(1L)} for the full table — not O(change)")
    // carried metadata still serves every reader, bit-exactly
    val before = VersionedTable.footerReads.get()
    assert(VersionedTable.rowCountOf(spark, dir, 2L) ===
      VersionedTable.readAsOf(spark, dir, 2L).count())
    assert(VersionedTable.footerReads.get() === before,
      "carried rows= must resolve through refs, no footer I/O")
    val (pruned, opened, total) =
      VersionedTable.readAsOfPruned(spark, dir, 2L, "id", 3000.0, 3100.0)
    assert(total === 16 && opened <= 3, s"zone maps: $opened/$total")
    assert(pruned.count() === 101L)
    val (hit, pOpened, pTotal) =
      VersionedTable.readAsOfPoint(spark, dir, 2L, "id", 90001L)
    assert(pOpened < pTotal, s"blooms must skip: $pOpened/$pTotal")
    assert(hit.count() === 1L)
    VersionedTable.drop(spark, dir)
  }

  test("metadata consolidation bounds carried sidecar refs; reads stay " +
    "exact across the collapse") {
    val dir = freshDir("consolidate")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val saved = VersionedTable.MaxMetaRefs
    VersionedTable.MaxMetaRefs = 4 // test seam: 65 real commits is slow
    try {
      VersionedTable.publish(Seq((0L, "v0")).toDF("id", "s"), dir, "b0",
        statsCols = Seq("id"))
      // each APPEND commit carries all prior files + adds one → one
      // more carried ref per commit, until the bound forces a
      // consolidation
      for (i <- 1 to 7) {
        val m = VersionedTable.latestManifest(spark, dir).get
        val rel = s"data/app-$i"
        Seq((i.toLong, s"v$i")).toDF("id", "s").coalesce(1)
          .write.parquet(s"$dir/$rel")
        val fNew = fs.listStatus(new org.apache.hadoop.fs.Path(
          s"$dir/$rel")).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
          .map(s => s"$rel/${s.getPath.getName}")
        VersionedTable.publishFilesIfUnchanged(spark, dir, s"b$i",
          m.schemaJson, m.files ++ fNew, expectedBaseVersion = m.version,
          stats = VersionedTable.fileStats(spark, dir, fNew, Seq("id")))
      }
      val m = VersionedTable.latestManifest(spark, dir).get
      assert(m.files.size === 8)
      assert(m.metaRefs.size <= VersionedTable.MaxMetaRefs,
        s"refs must stay bounded, got ${m.metaRefs.size}")
      // full history still reads exactly (consolidation never loses
      // carried entries)
      val (stats, rows, sizes) =
        VersionedTable.fileMetaOf(spark, dir, m.version)
      assert(stats.map(_._1).toSet === m.files.toSet,
        "every live file keeps its zone map through consolidation")
      assert(rows.keySet === m.files.toSet && sizes.keySet === m.files.toSet)
      assert(VersionedTable.rowCountOf(spark, dir, m.version) === 8L)
      val (rangeHit, opened, total) = VersionedTable.readAsOfPruned(
        spark, dir, m.version, "id", 3.0, 3.0)
      assert(rangeHit.collect().map(_.getString(1)).toSeq === Seq("v3"))
      assert(opened === 1 && total === 8,
        s"single-point zone maps must prune to 1 file: $opened/$total")
    } finally VersionedTable.MaxMetaRefs = saved
    VersionedTable.drop(spark, dir)
  }

  test("gc sweeps superseded sidecars and keeps every referenced one") {
    val dir = freshDir("gcmeta")
    VersionedTable.publish(
      (1L to 100L).map(i => (i, s"x$i")).toDF("id", "s").repartition(4),
      dir, "b1", statsCols = Seq("id"))
    // full rewrite: v2 references ONLY its own sidecars
    VersionedTable.compact(spark, dir, targetBytes = 1L << 30,
      statsCols = Seq("id"))
    VersionedTable.gc(spark, dir, keepLast = 1, orphanGraceMs = 0L)
    val m = VersionedTable.latestManifest(spark, dir).get
    val live = new java.io.File(s"$dir/_meta").listFiles()
      .filterNot(_.getName.startsWith(".")) // local-FS .crc shadows
      .map(f => s"_meta/${f.getName}").toSet
    val referenced = (m.metaRefs ++ m.bloomRefs.map(_._1)).toSet
    assert(live === referenced,
      s"gc must keep exactly the referenced sidecars: $live vs $referenced")
    // and the retained metadata still answers
    assert(VersionedTable.rowCountOf(spark, dir, m.version) === 100L)
    assert(VersionedTable.statRangeOf(spark, dir, m.version, "id")
      === Some((1.0, 100.0)))
    VersionedTable.drop(spark, dir)
  }

  test("compactIncremental packs only the small-file debt: big files " +
    "carry byte-identically, content is preserved, replay no-ops") {
    val dir = freshDir("optinc")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // one BIG file + several small append commits (the streaming debt)
    VersionedTable.publish(
      (1L to 50000L).map(i => (i, s"row-with-some-padding-$i"))
        .toDF("id", "s").coalesce(1), dir, "base")
    val big = VersionedTable.filesOf(spark, dir, 1L)
    assert(big.size === 1)
    for (i <- 1 to 4) {
      val m = VersionedTable.latestManifest(spark, dir).get
      val rel = s"data/append-$i"
      Seq((100000L + i, s"small-$i")).toDF("id", "s").coalesce(1)
        .write.parquet(s"$dir/$rel")
      val fNew = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$rel"))
        .toSeq.filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
        .map(s => s"$rel/${s.getPath.getName}")
      VersionedTable.publishFilesIfUnchanged(spark, dir, s"app-$i",
        m.schemaJson, m.files ++ fNew, expectedBaseVersion = m.version)
    }
    val mBefore = VersionedTable.latestManifest(spark, dir).get
    assert(mBefore.files.size === 5)
    val want = VersionedTable.readLatest(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val bigStamp = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(s"$dir/${big.head}"))
    // pack the debt: the big file is above smallBytes, the 4 appends
    // are below — only they are rewritten
    val (rewritten, carried, after) = VersionedTable.compactIncremental(
      spark, dir, targetBytes = 1L << 30, smallBytes = 64L << 10)
    assert(rewritten === 4 && carried === 1 && after === 2,
      s"($rewritten, $carried, $after)")
    val mAfter = VersionedTable.latestManifest(spark, dir).get
    assert(mAfter.files.contains(big.head),
      "the big file must carry by reference")
    val stamp2 = fs.getFileStatus(
      new org.apache.hadoop.fs.Path(s"$dir/${big.head}"))
    assert(stamp2.getModificationTime === bigStamp.getModificationTime &&
      stamp2.getLen === bigStamp.getLen,
      "carried bytes must be untouched on disk")
    assert(VersionedTable.readLatest(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet === want,
      "content must be identical after packing")
    // replay: same source version + thresholds → no-op
    val v = VersionedTable.latestVersion(spark, dir).get
    VersionedTable.compactIncremental(spark, dir,
      targetBytes = 1L << 30, smallBytes = 64L << 10)
    // (new latest has ≤1 small file → no-op, no new version)
    assert(VersionedTable.latestVersion(spark, dir).get === v)
    VersionedTable.drop(spark, dir)
  }

  test("renameColumn: zero-data-I/O rename round-trip — old files " +
    "serve the new name, old versions travel under the old name, " +
    "rename chains compose") {
    val dir = freshDir("rename")
    VersionedTable.publish(
      Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "s", "score"),
      dir, "b1")
    val dataBytes = new java.io.File(s"$dir/data").listFiles().length
    assert(VersionedTable.renameColumn(spark, dir, "score", "rating")
      === 2L)
    // no data rewritten: same number of data dirs
    assert(new java.io.File(s"$dir/data").listFiles().length === dataBytes)
    val latest = VersionedTable.readLatest(spark, dir)
    assert(latest.schema.fieldNames.toSeq === Seq("id", "s", "rating"))
    assert(latest.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      === Map(1L -> 10.0, 2L -> 20.0),
      "renamed column must serve the OLD files' values")
    // time travel: v1 still reads under the old name
    val v1 = VersionedTable.readAsOf(spark, dir, 1L)
    assert(v1.schema.fieldNames.toSeq === Seq("id", "s", "score"))
    assert(v1.collect().map(_.getDouble(2)).sorted.toSeq === Seq(10.0, 20.0))
    // a post-rename publish writes the new name physically; both
    // generations serve one logical schema
    val m2 = VersionedTable.latestManifest(spark, dir).get
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rel = "data/gen2"
    Seq((3L, "c", 30.0)).toDF("id", "s", "rating").coalesce(1)
      .write.parquet(s"$dir/$rel")
    val fNew = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$rel"))
      .toSeq.filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(s => s"$rel/${s.getPath.getName}")
    VersionedTable.publishFilesIfUnchanged(spark, dir, "b3",
      m2.schemaJson, m2.files ++ fNew, expectedBaseVersion = m2.version)
    assert(VersionedTable.readLatest(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      === Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    // chain: rating -> grade keeps resolving the ORIGINAL physical
    VersionedTable.renameColumn(spark, dir, "rating", "grade")
    val chained = VersionedTable.readLatest(spark, dir)
    assert(chained.schema.fieldNames.toSeq === Seq("id", "s", "grade"))
    assert(chained.collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
      === Map(1L -> 10.0, 2L -> 20.0, 3L -> 30.0))
    // replay: same (version, names) no-ops; bad renames are loud
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, dir, "nope", "x")
    }
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, dir, "grade", "id")
    }
    VersionedTable.drop(spark, dir)
  }

  test("dropColumn masks the physical data: re-adding the same name " +
    "serves NULL for old files, never the stale bytes") {
    val dir = freshDir("dropcol")
    VersionedTable.publish(
      Seq((1L, "a", 99.0), (2L, "b", 88.0)).toDF("id", "s", "secret"),
      dir, "b1")
    assert(VersionedTable.dropColumn(spark, dir, "secret") === 2L)
    val dropped = VersionedTable.readLatest(spark, dir)
    assert(dropped.schema.fieldNames.toSeq === Seq("id", "s"))
    // v1 still time-travels WITH the column
    assert(VersionedTable.readAsOf(spark, dir, 1L)
      .collect().map(_.getDouble(2)).sorted.toSeq === Seq(88.0, 99.0))
    // re-add the SAME name via add-column evolution: old files must
    // serve null (the mask), not the stale 99/88
    val withReadd = org.apache.spark.sql.types.StructType(
      dropped.schema.fields :+ org.apache.spark.sql.types.StructField(
        "secret", org.apache.spark.sql.types.DoubleType, nullable = true))
    VersionedTable.evolveSchema(spark, dir, withReadd)
    val readded = VersionedTable.readLatest(spark, dir)
    assert(readded.schema.fieldNames.toSeq === Seq("id", "s", "secret"))
    assert(readded.where(col("secret").isNotNull).count() === 0L,
      "masked physical data must NEVER leak into a re-added column")
    // new writers fill it going forward
    val m = VersionedTable.latestManifest(spark, dir).get
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val rel = "data/gen2"
    Seq((3L, "c", 7.0)).toDF("id", "s", "secret").coalesce(1)
      .write.parquet(s"$dir/$rel")
    val fNew = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dir/$rel"))
      .toSeq.filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .map(s => s"$rel/${s.getPath.getName}")
    VersionedTable.publishFilesIfUnchanged(spark, dir, "b4",
      m.schemaJson, m.files ++ fNew, expectedBaseVersion = m.version)
    val vals = VersionedTable.readLatest(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(vals === Map(1L -> None, 2L -> None, 3L -> Some(7.0)))
    intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, dir, "ghost")
    }
    VersionedTable.drop(spark, dir)
  }

  test("drop -> re-add -> rename preserves the mask: the renamed " +
    "re-added column must NOT serve the dropped column's stale bytes") {
    val dir = freshDir("dropreaddrename")
    VersionedTable.publish(
      Seq((1L, "a", 99.0), (2L, "b", 88.0)).toDF("id", "s", "secret"),
      dir, "b1")
    VersionedTable.dropColumn(spark, dir, "secret")
    val cur = VersionedTable.readLatest(spark, dir).schema
    VersionedTable.evolveSchema(spark, dir,
      org.apache.spark.sql.types.StructType(cur.fields :+
        org.apache.spark.sql.types.StructField("secret",
          org.apache.spark.sql.types.DoubleType, nullable = true)))
    // the bug: rename's colmap fallback-to-name emitted (file, secret,
    // disclosed) for old files whose map already MASKS physical
    // `secret` (-> ""), and later-wins folding overrode the mask
    VersionedTable.renameColumn(spark, dir, "secret", "disclosed")
    val out = VersionedTable.readLatest(spark, dir)
    assert(out.schema.fieldNames.toSeq === Seq("id", "s", "disclosed"))
    assert(out.where(col("disclosed").isNotNull).count() === 0L,
      "masked bytes must never leak through a rename of the re-added " +
        "column")
    VersionedTable.drop(spark, dir)
  }

  test("rename -> re-add old name -> rename: the second rename must " +
    "not orphan the first rename's data (claimed physical is skipped)") {
    val dir = freshDir("renamereaddrename")
    VersionedTable.publish(
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "a"), dir, "b1")
    VersionedTable.renameColumn(spark, dir, "a", "b") // physical a -> b
    val cur = VersionedTable.readLatest(spark, dir).schema
    VersionedTable.evolveSchema(spark, dir,
      org.apache.spark.sql.types.StructType(cur.fields :+
        org.apache.spark.sql.types.StructField("a",
          org.apache.spark.sql.types.DoubleType, nullable = true)))
    // the bug: renaming the RE-ADDED `a` fell back to physical `a`,
    // which is claimed by the first rename (a -> b); the override
    // orphaned b's data AND served a's stale bytes under c
    VersionedTable.renameColumn(spark, dir, "a", "c")
    val out = VersionedTable.readLatest(spark, dir)
    assert(out.schema.fieldNames.toSeq === Seq("id", "b", "c"))
    assert(out.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      === Map(1L -> 10.0, 2L -> 20.0),
      "the first rename's column must keep serving its physical bytes")
    assert(out.where(col("c").isNotNull).count() === 0L,
      "the re-added column has no physical backing in old files")
    VersionedTable.drop(spark, dir)
  }

  test("restore to a pre-rename version serves the ORIGINAL values " +
    "(the rollback pairs the old schema with the old maps)") {
    val dir = freshDir("restorerename")
    VersionedTable.publish(
      Seq((1L, 10.0), (2L, 20.0)).toDF("id", "score"), dir, "b1")
    VersionedTable.renameColumn(spark, dir, "score", "rating")
    assert(VersionedTable.restore(spark, dir, 1L) === 3L)
    val back = VersionedTable.readLatest(spark, dir)
    assert(back.schema.fieldNames.toSeq === Seq("id", "score"))
    assert(back.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      === Map(1L -> 10.0, 2L -> 20.0),
      "restored column must serve its values, not NULL from a " +
        "carried rename map")
    // and restoring FORWARD to the renamed version works too
    VersionedTable.restore(spark, dir, 2L)
    val fwd = VersionedTable.readLatest(spark, dir)
    assert(fwd.schema.fieldNames.toSeq === Seq("id", "rating"))
    assert(fwd.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      === Map(1L -> 10.0, 2L -> 20.0))
    VersionedTable.drop(spark, dir)
  }

  test("metadata answers respect column maps: renamed columns keep " +
    "pruning/ranging under the NEW name; a dropped-then-re-added " +
    "column never serves stale stats or blooms") {
    val dir = freshDir("metamap")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    VersionedTable.publish(
      (1L to 1000L).map(i => (i, i.toDouble)).toDF("id", "v")
        .repartitionByRange(8, col("id")),
      dir, "b1", statsCols = Seq("id", "v"), bloomCols = Seq("id"))
    // RENAME: stats/blooms recorded under the physical name keep
    // working for the logical name (same bytes)
    VersionedTable.renameColumn(spark, dir, "id", "key")
    assert(VersionedTable.statRangeOf(spark, dir, 2L, "key")
      === Some((1.0, 1000.0)))
    assert(VersionedTable.statRangeOf(spark, dir, 2L, "id") === None,
      "the renamed-away name must not answer")
    val (pruned, opened, total) =
      VersionedTable.readAsOfPruned(spark, dir, 2L, "key", 100.0, 150.0)
    assert(opened < total, s"zone maps must survive rename: $opened/$total")
    assert(pruned.count() === 51L)
    val (hit, pOpened, pTotal) =
      VersionedTable.readAsOfPoint(spark, dir, 2L, "key", 7L)
    assert(pOpened < pTotal, s"blooms must survive rename: $pOpened/$pTotal")
    assert(hit.count() === 1L)
    // DROP then RE-ADD: the re-added column reads NULL from old files,
    // so the metadata range must NOT serve the masked stats
    VersionedTable.dropColumn(spark, dir, "v")
    val cur = VersionedTable.readLatest(spark, dir).schema
    VersionedTable.evolveSchema(spark, dir,
      org.apache.spark.sql.types.StructType(cur.fields :+
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.DoubleType, nullable = true)))
    val v4 = VersionedTable.latestVersion(spark, dir).get
    assert(VersionedTable.statRangeOf(spark, dir, v4, "v") === None,
      "stale masked stats must never answer for a re-added column")
    VersionedTable.drop(spark, dir)
  }

  test("bucket-layout CDC tables loudly refuse compactIncremental, " +
    "renameColumn and dropColumn; nonsensical packing thresholds too") {
    val dir = freshDir("bucketguard")
    graft.streaming.StreamingMerge.init(
      Seq((1L, "a"), (2L, "b")).toDF("id", "text"), "id", dir,
      nBuckets = 4)
    intercept[IllegalArgumentException] {
      VersionedTable.compactIncremental(spark, dir)
    }
    intercept[IllegalArgumentException] {
      VersionedTable.renameColumn(spark, dir, "text", "body")
    }
    intercept[IllegalArgumentException] {
      VersionedTable.dropColumn(spark, dir, "text")
    }
    VersionedTable.drop(spark, dir)
    val d2 = freshDir("thresholds")
    VersionedTable.publish(Seq((1L, "a")).toDF("id", "s"), d2, "b1")
    intercept[IllegalArgumentException] { // never converges
      VersionedTable.compactIncremental(spark, d2,
        targetBytes = 64L << 20, smallBytes = 256L << 20)
    }
    VersionedTable.drop(spark, d2)
  }

  test("VersionedSql.sql leaves versioned(...) text inside string " +
    "literals alone") {
    val dir = freshDir("sqlliteral")
    VersionedTable.publish(
      Seq((1L, "see versioned('/nonexistent')")).toDF("id", "note"),
      dir, "b1")
    val got = VersionedSql.sql(spark,
      s"SELECT note FROM versioned('$dir') " +
        "WHERE note = 'see versioned(''/nonexistent'')'")
      .collect()
    assert(got.length === 1 &&
      got.head.getString(0) === "see versioned('/nonexistent')",
      "the literal must compare unrewritten (and no view registered " +
        "for the quoted path)")
    VersionedTable.drop(spark, dir)
  }

  test("VersionedSql.sql rewrites only whole-word call sites: an " +
    "identifier merely ENDING in 'versioned(' is left alone") {
    // pre-fix, the regex matched the `versioned('/nonexistent')` tail
    // of `unversioned(...)` and registration threw
    // NoSuchElementException("no committed version at /nonexistent");
    // post-fix the text reaches spark.sql untouched and fails as an
    // unresolved FUNCTION, naming `unversioned`
    val ex = intercept[Exception] {
      VersionedSql.sql(spark, "SELECT unversioned('/nonexistent')")
    }
    assert(!ex.isInstanceOf[NoSuchElementException] &&
      Option(ex.getMessage).exists(_.contains("unversioned")),
      s"the rewrite must not fire inside identifiers, got: $ex")
  }

  test("delta-encoded file lists: append commits write O(change) " +
    "manifest lines, chains cap at the depth bound, and gc shadows a " +
    "dropped base so retained snapshots keep resolving") {
    val dir = freshDir("deltalist")
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    VersionedTable.publish(
      (1L to 800L).map(i => (i, s"x$i")).toDF("id", "s").repartition(8),
      dir, "b0")
    for (i <- 1 to 15) {
      val m = VersionedTable.latestManifest(spark, dir).get
      val rel = s"data/app-$i"
      Seq((10000L + i, s"n$i")).toDF("id", "s").coalesce(1)
        .write.parquet(s"$dir/$rel")
      val fNew = fs.listStatus(new org.apache.hadoop.fs.Path(
        s"$dir/$rel")).toSeq
        .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
        .map(s => s"$rel/${s.getPath.getName}")
      VersionedTable.publishFilesIfUnchanged(spark, dir, s"a$i",
        m.schemaJson, m.files ++ fNew, expectedBaseVersion = m.version)
    }
    def slotText(v: Long): String =
      java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$dir/_manifests/$v"))
    // an append manifest is a DELTA: base= + one add=, no file= lines
    val d = slotText(5L).split("\n").toSeq
    assert(d.exists(_.startsWith("base=")) &&
      d.count(_.startsWith("add=")) === 1 &&
      !d.exists(_.startsWith("file=")),
      s"append slot must be a delta, got:\n${d.mkString("\n")}")
    // the chain resets with a FULL manifest within the depth bound
    val fullSlots = (2L to 16L).filter(v =>
      slotText(v).split("\n").exists(_.startsWith("file=")))
    assert(fullSlots.nonEmpty,
      "some commit within the bound must write a full list (cap)")
    // resolution is exact at every version
    assert(VersionedTable.readAsOf(spark, dir, 1L).count() === 800L)
    assert(VersionedTable.readAsOf(spark, dir, 9L).count() === 808L)
    assert(VersionedTable.readLatest(spark, dir).count() === 815L)
    assert(VersionedTable.filesOf(spark, dir, 16L).size === 23)
    // metadata still resolves footer-free through the chain
    val before = VersionedTable.footerReads.get()
    assert(VersionedTable.rowCountOf(spark, dir, 16L) === 815L)
    assert(VersionedTable.footerReads.get() === before)
    // gc: dropped versions that are BASES of retained deltas survive
    // as invisible .base shadows; everything keeps resolving
    VersionedTable.gc(spark, dir, keepLast = 2, orphanGraceMs = 0L)
    assert(VersionedTable.versions(spark, dir) === Seq(15L, 16L))
    assert(VersionedTable.readLatest(spark, dir).count() === 815L)
    assert(VersionedTable.readAsOf(spark, dir, 15L).count() === 814L)
    intercept[NoSuchElementException] { // dropped: invisible
      VersionedTable.readAsOf(spark, dir, 9L)
    }
    val names = new java.io.File(s"$dir/_manifests").list().toSeq
    assert(names.exists(_.endsWith(".base")),
      s"a referenced base must survive as a shadow: $names")
    // a later full rewrite drops the chain; the shadows age out
    VersionedTable.compact(spark, dir, targetBytes = 1L << 30)
    VersionedTable.gc(spark, dir, keepLast = 1, orphanGraceMs = 0L)
    val names2 = new java.io.File(s"$dir/_manifests").list().toSeq
    assert(!names2.exists(_.endsWith(".base")),
      s"unreferenced shadows must age out: $names2")
    assert(VersionedTable.readLatest(spark, dir).count() === 815L)
    VersionedTable.drop(spark, dir)
  }

  test("history: one metadata-only row per committed version, " +
    "operation-encoding batchIds, zero data I/O") {
    val dir = freshDir("history")
    VersionedTable.publish(
      (1L to 90L).map(i => (i, s"x$i")).toDF("id", "s"), dir, "cut-1")
    VersionedTable.publish(
      (1L to 30L).map(i => (i, s"y$i")).toDF("id", "s"), dir, "cut-2")
    VersionedTable.restore(spark, dir, 1L)
    val before = VersionedTable.footerReads.get()
    val h = VersionedTable.history(spark, dir)
      .collect().map(r => (r.getLong(0), r.getString(2), r.getInt(3),
        r.getLong(4)))
    assert(VersionedTable.footerReads.get() === before,
      "history must be metadata-only")
    assert(h.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(h.map(_._2).toSeq ===
      Seq("cut-1", "cut-2", "restore-v1-over-v2"),
      "batchIds are the operations log")
    assert(h.map(_._4).toSeq === Seq(90L, 30L, 90L))
    assert(h.forall(_._3 > 0), "file counts recorded")
    VersionedTable.drop(spark, dir)
  }

  test("withConflictRetry: re-runs the body on CME with bounded " +
    "backoff, propagates after maxAttempts") {
    var calls = 0
    val got = VersionedTable.withConflictRetry(maxAttempts = 5,
      backoffMs = 1L) {
      calls += 1
      if (calls < 3)
        throw new java.util.ConcurrentModificationException("stale")
      42
    }
    assert(got === 42 && calls === 3)
    var calls2 = 0
    intercept[java.util.ConcurrentModificationException] {
      VersionedTable.withConflictRetry(maxAttempts = 3, backoffMs = 1L) {
        calls2 += 1
        throw new java.util.ConcurrentModificationException("always")
      }
    }
    assert(calls2 === 3, "attempts must be bounded")
    // non-CME failures propagate immediately, no retry
    var calls3 = 0
    intercept[IllegalStateException] {
      VersionedTable.withConflictRetry(maxAttempts = 5, backoffMs = 1L) {
        calls3 += 1
        throw new IllegalStateException("real failure")
      }
    }
    assert(calls3 === 1)
  }
}
