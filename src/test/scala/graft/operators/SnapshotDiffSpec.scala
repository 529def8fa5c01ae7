package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {

  import spark.implicits._

  private def statusMap(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("classifies added / removed / changed / unchanged") {
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("id", "text")
    val neu = Seq((2L, "beta"), (3L, "GAMMA"), (4L, "delta"), (5L, "epsilon"))
      .toDF("id", "text")
    val got = statusMap(SnapshotDiff.diff(old, neu, "id", "text"))
    assert(got === Map(
      1L -> "removed",   // only in old
      2L -> "unchanged", // same bytes
      3L -> "changed",   // case edit IS a change (byte-level fp)
      4L -> "unchanged",
      5L -> "added"))    // only in new
  }

  test("identical snapshots are all unchanged; disjoint ones never are") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "text")
    assert(statusMap(SnapshotDiff.diff(df, df, "id", "text"))
      .values.toSet === Set("unchanged"))
    val other = Seq((3L, "c")).toDF("id", "text")
    assert(statusMap(SnapshotDiff.diff(df, other, "id", "text")) ===
      Map(1L -> "removed", 2L -> "removed", 3L -> "added"))
  }

  test("empty sides degrade to all-added / all-removed") {
    val df = Seq((1L, "a")).toDF("id", "text")
    val empty = df.filter(lit(false))
    assert(statusMap(SnapshotDiff.diff(empty, df, "id", "text")) ===
      Map(1L -> "added"))
    assert(statusMap(SnapshotDiff.diff(df, empty, "id", "text")) ===
      Map(1L -> "removed"))
  }

  test("NULL text is presence, not absence") {
    val old = Seq((1L, Option.empty[String]), (2L, Some("b")),
      (3L, Option.empty[String])).toDF("id", "text")
    val neu = Seq((1L, Some("a")), (2L, Option.empty[String]),
      (3L, Option.empty[String])).toDF("id", "text")
    // a row with NULL text still EXISTS in its snapshot: null→text is
    // changed (not added), text→null is changed (not removed),
    // null→null is unchanged
    assert(statusMap(SnapshotDiff.diff(old, neu, "id", "text")) ===
      Map(1L -> "changed", 2L -> "changed", 3L -> "unchanged"))
  }

  test("summary counts match the row-level diff") {
    val old = (1L to 100L).map(i => (i, s"doc $i")).toDF("id", "text")
    val neu = (11L to 110L)
      .map(i => (i, if (i % 2 == 0) s"doc $i v2" else s"doc $i"))
      .toDF("id", "text")
    val sum = SnapshotDiff.summary(old, neu, "id", "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // removed: 1-10; added: 101-110; of 11-100 in both, evens changed
    assert(sum === Map("removed" -> 10L, "added" -> 10L,
      "changed" -> 45L, "unchanged" -> 45L))
  }

  test("incremental diff off the manifest change feed ≡ full diff, " +
    "and only the changed files' content is read") {
    import graft.sources.VersionedTable
    val dir = s"${System.getProperty("java.io.tmpdir")}/sd_incr_" +
      java.util.UUID.randomUUID().toString.take(8)
    VersionedTable.drop(spark, dir)
    // v1: 4 one-file parts committed via publishFiles; v2 carries 3 of
    // them by reference, drops one, adds a new part (an edit + an add)
    val spark2 = spark
    import spark2.implicits._
    def part(rows: Seq[(Long, String)], name: String): String = {
      rows.toDF("id", "text").coalesce(1)
        .write.parquet(s"$dir/data/$name")
      val f = new java.io.File(s"$dir/data/$name").listFiles()
        .filter(f => f.getName.endsWith(".parquet")).head.getName
      s"data/$name/$f"
    }
    val schemaJson = Seq((1L, "x")).toDF("id", "text").schema.json
    val pa = part((1L to 10L).map(i => (i, s"doc $i")), "pa")
    val pb = part((11L to 20L).map(i => (i, s"doc $i")), "pb")
    val pc = part((21L to 30L).map(i => (i, s"doc $i")), "pc")
    val pd = part((31L to 40L).map(i => (i, s"doc $i")), "pd")
    VersionedTable.publishFiles(spark, dir, "v1", schemaJson,
      Seq(pa, pb, pc, pd))
    // pd is rewritten (two docs revised, one dropped, one added)
    val pd2 = part((32L to 41L).map(i =>
      (i, if (i % 2 == 0) s"doc $i v2" else s"doc $i")), "pd2")
    VersionedTable.publishFiles(spark, dir, "v2", schemaJson,
      Seq(pa, pb, pc, pd2))
    val (added, removed) = VersionedTable.changedFiles(spark, dir, 1L, 2L)
    assert(added === Seq(pd2) && removed === Seq(pd))
    val full = statusMap(SnapshotDiff.diff(
      VersionedTable.readAsOf(spark, dir, 1L),
      VersionedTable.readAsOf(spark, dir, 2L), "id", "text"))
    val incr = statusMap(SnapshotDiff.incremental(spark, dir, 1L, 2L,
      "id", "text"))
    assert(incr === full, "incremental must equal the full diff")
    assert(full(31L) === "removed" && full(41L) === "added" &&
      full(32L) === "changed" && full(33L) === "unchanged" &&
      full(5L) === "unchanged")
    // no sharing at all (independent versions): still ≡ full
    VersionedTable.publish((1L to 5L).map(i => (i, s"z $i"))
      .toDF("id", "text"), dir, "v3")
    val full3 = statusMap(SnapshotDiff.diff(
      VersionedTable.readAsOf(spark, dir, 2L),
      VersionedTable.readAsOf(spark, dir, 3L), "id", "text"))
    assert(statusMap(SnapshotDiff.incremental(spark, dir, 2L, 3L,
      "id", "text")) === full3)
    // foreign file paths are refused
    intercept[IllegalArgumentException] {
      VersionedTable.readFileSubset(spark, dir, 3L, Seq(pd))
    }
    VersionedTable.drop(spark, dir)
  }
}
