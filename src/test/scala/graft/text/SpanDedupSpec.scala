package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], spanTokens: Int = 2) =
    SpanDedup.dedupSpans(rows.toDF("doc_id", "text"), "doc_id", "text",
        spanTokens)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))

  test("first occurrence wins; later copies of a span are removed") {
    val got = run(Seq(
      1L -> "a b c d",   // spans: "a b", "c d"
      2L -> "c d e f",   // "c d" dup -> keeps "e f"
      3L -> "a b c d"))  // both spans dup -> doc drops
    assert(got === Seq(
      (1L, 2L, 2L, "a b c d"),
      (2L, 2L, 1L, "e f")))
  }

  test("within-doc repeats keep only the earliest position") {
    val got = run(Seq(4L -> "x y x y z"))
    // spans: "x y" (idx 0), "x y" (idx 1), "z" (idx 2, partial)
    assert(got === Seq((4L, 3L, 2L, "x y z")))
  }

  test("reassembly preserves span order and partial tails") {
    val got = run(Seq(5L -> "p q r s t"), spanTokens = 2)
    assert(got === Seq((5L, 3L, 3L, "p q r s t")))
  }

  test("empty docs produce no spans and drop out") {
    val got = run(Seq(6L -> "", 7L -> "a b"))
    assert(got === Seq((7L, 1L, 1L, "a b")))
  }

  test("ties on the same span break by (doc_id, span_idx)") {
    // span "k k" appears at (8,1) and (9,0): doc 8's position-1 copy
    // wins over doc 9's position-0 copy because doc_id orders first
    val got = run(Seq(8L -> "j j k k", 9L -> "k k m m"))
    assert(got === Seq((8L, 2L, 2L, "j j k k"), (9L, 2L, 1L, "m m")))
  }
}
