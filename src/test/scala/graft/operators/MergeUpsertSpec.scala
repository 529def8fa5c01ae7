package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeUpsertSpec extends SparkSpec {

  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  private val base = Seq(
    (1L, "one"), (2L, "two"), (3L, "three"), (4L, "four"))
    .toDF("id", "text")

  private def changes(rows: (Long, String, Long, String)*) =
    rows.toSeq.toDF("id", "text", "seq", "op")

  test("upsert replaces, insert adds, delete removes, rest pass through") {
    val c = changes(
      (2L, "two v2", 1L, "upsert"),  // replace
      (5L, "five",   1L, "upsert"),  // insert (id not in base)
      (3L, "x",      1L, "delete"),  // remove (payload ignored)
      (9L, "x",      1L, "delete"))  // delete of absent id: no-op
    assert(rows(MergeUpsert.merge(base, c, "id", "seq", "op")) === Map(
      1L -> "one", 2L -> "two v2", 4L -> "four", 5L -> "five"))
  }

  test("latest-wins: highest seq decides, regardless of changelog order") {
    val c = changes(
      (2L, "two v2", 1L, "upsert"),
      (2L, "x",      3L, "delete"),   // latest for id 2 → deleted
      (2L, "two v3", 2L, "upsert"),
      (4L, "x",      1L, "delete"),
      (4L, "four v2", 2L, "upsert"))  // latest for id 4 → upserted
    assert(rows(MergeUpsert.merge(base, c, "id", "seq", "op")) === Map(
      1L -> "one", 3L -> "three", 4L -> "four v2"))
  }

  test("empty changelog is the identity; empty base keeps only upserts") {
    val none = changes()
    assert(rows(MergeUpsert.merge(base, none, "id", "seq", "op")) ===
      rows(base))
    val emptyBase = base.filter(lit(false))
    val c = changes((7L, "seven", 1L, "upsert"), (8L, "x", 1L, "delete"))
    assert(rows(MergeUpsert.merge(emptyBase, c, "id", "seq", "op")) ===
      Map(7L -> "seven"))
  }

  test("equal seqs resolve deterministically (struct max tie-break)") {
    // Two entries with the SAME seq for id 2: struct max orders by
    // (seq, op, payload) — 'upsert' > 'delete' lexicographically, so
    // the upsert wins, and among equal (seq, op) the greater payload.
    val c = changes(
      (2L, "a", 1L, "delete"),
      (2L, "b", 1L, "upsert"))
    assert(rows(MergeUpsert.merge(base, c, "id", "seq", "op"))(2L) === "b")
    val c2 = changes((2L, "a", 1L, "upsert"), (2L, "b", 1L, "upsert"))
    assert(rows(MergeUpsert.merge(base, c2, "id", "seq", "op"))(2L) === "b")
  }

  test("unknown ops fail loudly instead of silently deleting") {
    val bad = changes((2L, "two v2", 1L, "update")) // common CDC synonym
    val ex = intercept[Exception] {
      MergeUpsert.merge(base, bad, "id", "seq", "op").collect()
    }
    assert(ex.getMessage != null)
    def msgs(e: Throwable): Seq[String] =
      Option(e).toSeq.flatMap(t =>
        Option(t.getMessage).toSeq ++ msgs(t.getCause))
    assert(msgs(ex).exists(_.contains("unknown op")), msgs(ex).mkString("; "))
  }

  test("merge(base, diff-derived changelog) round-trips a snapshot") {
    // Rebuild `new` from `old` + a changelog derived from the two
    // snapshots — the inverse relationship with SnapshotDiff.
    val old = (1L to 50L).map(i => (i, s"doc $i")).toDF("id", "text")
    val neu = (11L to 60L)
      .map(i => (i, if (i % 2 == 0) s"doc $i v2" else s"doc $i"))
      .toDF("id", "text")
    val d = SnapshotDiff.diff(old, neu, "id", "text")
    val ups = neu.join(d.filter(col("status").isin("added", "changed")),
        Seq("id"), "left_semi")
      .withColumn("seq", lit(1L)).withColumn("op", lit("upsert"))
    val dels = d.filter(col("status") === "removed").select(col("id"),
      lit("").as("text"), lit(1L).as("seq"), lit("delete").as("op"))
    val merged = MergeUpsert.merge(old, ups.unionByName(dels),
      "id", "seq", "op")
    assert(rows(merged) === rows(neu))
  }
}
