package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkSpec {

  import spark.implicits._

  private val clean = Seq(
    (1L, "Customer#000000042"),
    (2L, "Customer#000000043"),
    (3L, "Customer#000000999"),
    (4L, "Supplier#000000042")).toDF("lid", "lname")

  test("fuzzy join: exact recall at radius 1 for sub/del/ins typos") {
    val dirty = Seq(
      (11L, "Customer#0000p0042"), // substitution of clean 1
      (12L, "Customer#00000043"),  // deletion of clean 2
      (13L, "Customer#0000009x99"), // insertion into clean 3
      (14L, "Customer#000000042"), // exact copy of clean 1
      (15L, "Supplier#000000xx2")  // TWO edits from clean 4: not found
    ).toDF("rid", "rname")
    val got = RecordLinkage.fuzzyJoin(clean, dirty,
      "lid", "rid", "lname", "rname")
      .select("lid", "rid", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // every planted radius-1 pair recovered, the radius-2 one is not;
    // 042-sub also matches nothing else, 042-exact matches at dist 0,
    // and clean 2's "Customer#000000042" is NOT within 1 of dirty 12's
    // "Customer#00000043" (one deletion + one substitution = 2)
    assert(got.contains((1L, 11L, 1L)))
    assert(got.contains((2L, 12L, 1L)))
    assert(got.contains((3L, 13L, 1L)))
    assert(got.contains((1L, 14L, 0L)))
    assert(!got.exists(_._2 == 15L), s"radius-2 typo matched: $got")
    // 43-del is also one deletion away from clean 1? "Customer#00000043"
    // vs "Customer#000000042": lengths 17 vs 18, but needs ins '0' AND
    // sub '3'->'2' = dist 2 -> correctly absent
    assert(!got.exists(p => p._1 == 1L && p._2 == 12L), got.toString)
  }

  test("fuzzy join: candidate generation is equi-join only, no cartesian") {
    val dirty = Seq((11L, "Customer#0000p0042")).toDF("rid", "rname")
    val plan = RecordLinkage.fuzzyJoin(clean, dirty,
      "lid", "rid", "lname", "rname")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("fuzzy join: symmetric coincidental neighbors are reported once each") {
    // two clean names one substitution apart, dirty = exact copies:
    // each dirty matches its own clean (dist 0) AND the neighbor
    // (dist 1) — four pairs, deterministically
    val near = Seq((1L, "Customer#000000042"), (2L, "Customer#000000043"))
      .toDF("lid", "lname")
    val copies = Seq((11L, "Customer#000000042"), (12L, "Customer#000000043"))
      .toDF("rid", "rname")
    val got = RecordLinkage.fuzzyJoin(near, copies,
      "lid", "rid", "lname", "rname")
    assert(got.count() === 4L)
    assert(got.filter(col("dist") === 0L).count() === 2L)
  }
}
