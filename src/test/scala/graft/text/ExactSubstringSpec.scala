package graft.text

import graft.SparkSpec

class ExactSubstringSpec extends SparkSpec {

  import spark.implicits._

  private val shared = "a1 a2 a3 a4 a5 a6 a7 a8" // 8 tokens

  test("misaligned shared run: excised from the later doc, kept in " +
    "the first; span dedup misses the same fixture") {
    val docs = Seq(
      (1L, s"u1 u2 $shared t1 t2"),
      // one-token prefix shift — span grid misaligned, run identical
      (2L, s"v1 $shared w1 w2 w3")).toDF("doc_id", "text")
    val r = ExactSubstring.dedupSubstrings(docs, "doc_id", "text", n = 8)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getString(3))).toMap
    assert(r(1L) === ((12L, 12L, s"u1 u2 $shared t1 t2")),
      "first occurrence keeps everything")
    assert(r(2L) === ((12L, 4L, "v1 w1 w2 w3")),
      "later doc loses exactly the shared run")
    // the approximate span form (non-overlapping 8-token grid) sees
    // no duplicate span in this fixture — each doc is a single grid
    // span pair with unique edges
    val spans = SpanDedup.dedupSpans(docs, "doc_id", "text", 8)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(spans(1L) === 2L && spans(2L) === 2L,
      "span dedup keeps all spans — the miss the exact form exists for")
  }

  test("run longer than n is excised in full (overlapping windows " +
    "union); within-doc repeats dedup too") {
    val run = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10" // 10 tokens > n=8
    val docs = Seq(
      (1L, s"x $run y"),
      (2L, s"z1 z2 z3 $run z4")).toDF("doc_id", "text")
    val r = ExactSubstring.dedupSubstrings(docs, "doc_id", "text", n = 8)
      .collect().map(x => x.getLong(0) -> x.getString(3)).toMap
    assert(r(2L) === "z1 z2 z3 z4", "whole 10-token run excised")
    // a doc repeating its own 8-token run keeps only the first copy
    val self = Seq((7L, s"$run p q $run")).toDF("doc_id", "text")
    val rs = ExactSubstring.dedupSubstrings(self, "doc_id", "text", 8)
      .collect().head
    assert(rs.getString(3) === s"$run p q")
  }

  test("short docs (< n tokens) pass through; fully-covered docs drop") {
    val docs = Seq(
      (1L, "only three tokens"),
      (2L, shared),
      (3L, shared)). // doc 3 is nothing but the duplicated run
      toDF("doc_id", "text")
    val r = ExactSubstring.dedupSubstrings(docs, "doc_id", "text", n = 8)
      .collect().map(x => x.getLong(0) -> x.getString(3)).toMap
    assert(r(1L) === "only three tokens")
    assert(r(2L) === shared, "global first copy survives")
    assert(!r.contains(3L), "fully-excised doc drops out")
  }
}
