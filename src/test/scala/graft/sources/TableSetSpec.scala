package graft.sources

import graft.SparkSpec

class TableSetSpec extends SparkSpec {

  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/ts_spec_${tag}_" +
      java.util.UUID.randomUUID().toString.take(8)
    VersionedTable.drop(spark, d)
    d
  }

  test("publishAll: members first, one atomic pointer swap; a writer " +
    "crashing between member publishes leaves readers on the OLD " +
    "consistent pair") {
    val setDir = freshDir("set")
    val cDir = freshDir("corpus")
    val xDir = freshDir("index")
    val corpus1 = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    val index1 = Seq(("a", 1L), ("b", 1L)).toDF("term", "df")
    val v1 = TableSet.publishAll(spark, setDir, "set-1", Seq(
      ("corpus", corpus1, cDir), ("index", index1, xDir)))
    assert(v1 === Map("corpus" -> 1L, "index" -> 1L))
    assert(TableSet.current(spark, setDir) ===
      Map("corpus" -> (cDir, 1L), "index" -> (xDir, 1L)))
    assert(TableSet.read(spark, setDir, "corpus").count() === 2L)
    // CRASH SIMULATION: the next release publishes its corpus member
    // and dies before the index publish / pointer swap. The member
    // version exists at TABLE level...
    val corpus2 = Seq((1L, "a2"), (3L, "c")).toDF("id", "text")
    VersionedTable.publish(corpus2, cDir, "set-2:corpus")
    assert(VersionedTable.latestVersion(spark, cDir) === Some(2L))
    // ...but every SET reader still resolves the old consistent pair
    assert(TableSet.current(spark, setDir) ===
      Map("corpus" -> (cDir, 1L), "index" -> (xDir, 1L)))
    assert(TableSet.read(spark, setDir, "corpus").collect()
      .map(_.getString(1)).toSet === Set("a", "b"),
      "set readers must not see the crashed writer's member version")
    // RECOVERY: replaying the whole publishAll resumes — the corpus
    // member replays to its committed version, the index publishes,
    // one swap makes the NEW pair visible
    val index2 = Seq(("a2", 1L), ("c", 1L)).toDF("term", "df")
    val v2 = TableSet.publishAll(spark, setDir, "set-2", Seq(
      ("corpus", corpus2, cDir), ("index", index2, xDir)))
    assert(v2 === Map("corpus" -> 2L, "index" -> 2L))
    assert(TableSet.read(spark, setDir, "corpus").collect()
      .map(_.getString(1)).toSet === Set("a2", "c"))
    assert(TableSet.read(spark, setDir, "index").collect()
      .map(_.getString(0)).toSet === Set("a2", "c"))
    // REPLAY of the full publishAll: member versions unchanged, no new
    // pointer version (idempotent end to end)
    val histBefore = TableSet.history(spark, setDir).size
    val v2b = TableSet.publishAll(spark, setDir, "set-2", Seq(
      ("corpus", corpus2, cDir), ("index", index2, xDir)))
    assert(v2b === v2)
    assert(TableSet.history(spark, setDir).size === histBefore)
    // history keeps the old consistent assignment for time travel
    assert(TableSet.history(spark, setDir).head._2("corpus")._2 === 1L)
    // snapshot(): ONE assignment resolution pins every member — a
    // swap AFTER the resolve cannot mix generations into the frames
    val snap = TableSet.snapshot(spark, setDir)
    val corpus3 = Seq((9L, "a3")).toDF("id", "text")
    val index3 = Seq(("a3", 1L)).toDF("term", "df")
    TableSet.publishAll(spark, setDir, "set-3", Seq(
      ("corpus", corpus3, cDir), ("index", index3, xDir)))
    assert(snap("corpus").collect().map(_.getString(1)).toSet ===
      Set("a2", "c"), "pinned member frames must survive a later swap")
    assert(snap("index").collect().map(_.getString(0)).toSet ===
      Set("a2", "c"))
    Seq(setDir, cDir, xDir).foreach(VersionedTable.drop(spark, _))
  }

  test("gcMembers keeps exactly the retained assignments' versions — " +
    "no dangling reference, old generations reclaimed") {
    val setDir = freshDir("gcm")
    val cDir = freshDir("gcmc")
    val xDir = freshDir("gcmx")
    for (g <- 1 to 3) {
      TableSet.publishAll(spark, setDir, s"gen-$g", Seq(
        ("corpus", Seq((g.toLong, s"c$g")).toDF("id", "s"), cDir),
        ("index", Seq((g.toLong, s"x$g")).toDF("id", "s"), xDir)))
    }
    assert(VersionedTable.versions(spark, cDir) === Seq(1L, 2L, 3L))
    // keep the last TWO set generations: member versions 2,3 retained,
    // version 1 reclaimed, pointer history pruned to depth 2
    TableSet.gcMembers(spark, setDir, keepSets = 2, orphanGraceMs = 0L)
    assert(VersionedTable.versions(spark, cDir) === Seq(2L, 3L))
    assert(VersionedTable.versions(spark, xDir) === Seq(2L, 3L))
    assert(TableSet.history(spark, setDir).size === 2)
    // every retained assignment still resolves — nothing dangles
    TableSet.history(spark, setDir).foreach { case (_, m) =>
      m.foreach { case (_, (d, v)) =>
        assert(VersionedTable.readAsOf(spark, d, v).count() === 1L)
      }
    }
    assert(TableSet.read(spark, setDir, "corpus").collect()
      .map(_.getString(1)).toSeq === Seq("c3"))
    Seq(setDir, cDir, xDir).foreach(VersionedTable.drop(spark, _))
  }

  test("a DELAYED publishAll replay after a newer assignment landed " +
    "changes nothing — no pointer rollback, no new version") {
    val setDir = freshDir("replay")
    val cDir = freshDir("replayc")
    val df1 = Seq((1L, "gen1")).toDF("id", "s")
    val df2 = Seq((2L, "gen2")).toDF("id", "s")
    TableSet.publishAll(spark, setDir, "b1", Seq(("t", df1, cDir)))
    TableSet.publishAll(spark, setDir, "b2", Seq(("t", df2, cDir)))
    val cur = TableSet.current(spark, setDir)
    assert(cur("t")._2 === 2L)
    val histBefore = TableSet.history(spark, setDir)
    // the zombie replay of b1 arrives AFTER b2: the old head-value
    // check would see current != b1's target and re-publish the stale
    // assignment as a fresh pointer version, rolling the set back
    val replayed = TableSet.publishAll(spark, setDir, "b1",
      Seq(("t", df1, cDir)))
    assert(replayed === Map("t" -> 1L),
      "member publish must replay to its original version")
    assert(TableSet.current(spark, setDir) === cur,
      "a delayed replay must not roll the set back")
    assert(TableSet.history(spark, setDir) === histBefore,
      "a delayed replay must not append a pointer version")
    Seq(setDir, cDir).foreach(VersionedTable.drop(spark, _))
  }

  test("runWithSet: one consistent assignment per trigger, exactly " +
    "once across a crash between member publish and swap") {
    val setDir = freshDir("rws")
    val cDir = freshDir("rwsc")
    val xDir = freshDir("rwsx")
    val ck = java.nio.file.Files.createTempDirectory("rws_ck").toString
    import org.apache.spark.sql.DataFrame
    // each trigger publishes the batch as the corpus member and its
    // per-term counts as the index member — the curation corpus+index
    // pair, maintained from a stream
    def derive(batch: DataFrame, epochId: Long)
        : Seq[(String, DataFrame, String)] = {
      if (batch.isEmpty) Nil
      else Seq(
        ("corpus", batch, cDir),
        ("index", batch.groupBy("s")
          .agg(org.apache.spark.sql.functions.count(
            org.apache.spark.sql.functions.lit(1)).as("n")), xDir))
    }
    // CRASH SIMULATION before the stream ever runs: epoch 0's corpus
    // member was published, then the driver died before the index
    // publish and the swap — the set has NO assignment yet
    VersionedTable.publish(Seq((1L, "a")).toDF("id", "s"), cDir,
      "set-epoch-0:corpus")
    assert(TableSet.current(spark, setDir).isEmpty)
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = TableSet.runWithSet(input.toDF().toDF("id", "s"), ck,
      setDir, derive)
    input.addData(Seq((1L, "a")))  // the same epoch-0 content replays
    q.processAllAvailable()
    // healed: the corpus member replayed to v1 (nothing re-published),
    // the index published, ONE swap made the pair visible
    val a1 = TableSet.current(spark, setDir)
    assert(a1("corpus") === (cDir, 1L) && a1("index") === (xDir, 1L))
    assert(VersionedTable.versions(spark, cDir) === Seq(1L),
      "the replayed member must not re-publish")
    input.addData(Seq((2L, "b"), (3L, "b")))
    q.processAllAvailable()
    q.stop()
    val a2 = TableSet.current(spark, setDir)
    assert(a2("corpus") === (cDir, 2L) && a2("index") === (xDir, 2L))
    assert(TableSet.read(spark, setDir, "index").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("b" -> 2L))
    assert(TableSet.history(spark, setDir).size === 2)
    // RESTART from the same checkpoint: no new data → no new epochs
    // re-fire with content; the committed assignments stand
    val q2 = TableSet.runWithSet(input.toDF().toDF("id", "s"), ck,
      setDir, derive)
    q2.processAllAvailable()
    q2.stop()
    assert(TableSet.history(spark, setDir).size === 2,
      "a restart must not re-commit committed epochs")
    Seq(setDir, cDir, xDir).foreach(VersionedTable.drop(spark, _))
  }

  test("currentAsOf / snapshotAsOf: cross-table time travel pins " +
    "every member to the version it served at that instant") {
    val setDir = freshDir("asof")
    val cDir = freshDir("asofc")
    val xDir = freshDir("asofx")
    TableSet.publishAll(spark, setDir, "g1", Seq(
      ("corpus", Seq((1L, "c1")).toDF("id", "s"), cDir),
      ("index", Seq((1L, "x1")).toDF("id", "s"), xDir)))
    val between = System.currentTimeMillis()
    Thread.sleep(5)
    TableSet.publishAll(spark, setDir, "g2", Seq(
      ("corpus", Seq((2L, "c2")).toDF("id", "s"), cDir),
      ("index", Seq((2L, "x2")).toDF("id", "s"), xDir)))
    // as-of between the generations: BOTH members resolve to gen 1 —
    // never a mixed pair
    val then_ = TableSet.snapshotAsOf(spark, setDir, between)
    assert(then_("corpus").collect().map(_.getString(1)).toSeq
      === Seq("c1"))
    assert(then_("index").collect().map(_.getString(1)).toSeq
      === Seq("x1"))
    // as-of now: gen 2
    val now = TableSet.currentAsOf(spark, setDir,
      System.currentTimeMillis())
    assert(now("corpus")._2 === 2L && now("index")._2 === 2L)
    // before everything: empty / loud
    assert(TableSet.currentAsOf(spark, setDir, 1L).isEmpty)
    intercept[IllegalArgumentException] {
      TableSet.snapshotAsOf(spark, setDir, 1L)
    }
    Seq(setDir, cDir, xDir).foreach(VersionedTable.drop(spark, _))
  }

  test("commit validates member versions; unknown members fail loudly") {
    val setDir = freshDir("val")
    val cDir = freshDir("valc")
    VersionedTable.publish(Seq((1L, "a")).toDF("id", "s"), cDir, "b1")
    intercept[IllegalArgumentException] {
      TableSet.commit(spark, setDir, Map("corpus" -> (cDir, 9L)))
    }
    TableSet.commit(spark, setDir, Map("corpus" -> (cDir, 1L)))
    intercept[NoSuchElementException] {
      TableSet.read(spark, setDir, "index")
    }
    assert(TableSet.read(spark, setDir, "corpus").count() === 1L)
    Seq(setDir, cDir).foreach(VersionedTable.drop(spark, _))
  }
}
