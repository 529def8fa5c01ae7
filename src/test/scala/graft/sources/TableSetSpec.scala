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
