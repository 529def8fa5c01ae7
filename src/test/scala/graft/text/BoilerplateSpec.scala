package graft.text

import graft.SparkSpec

class BoilerplateSpec extends SparkSpec {

  import spark.implicits._

  // 4-token spans keep the fixtures small
  private val banner = "b1 b2 b3 b4"

  test("a span frequent within its group is stripped from EVERY doc; " +
    "the same span in another group survives") {
    val docs = Seq(
      (1L, "s1", s"$banner u1 u2 u3 u4"),
      (2L, "s1", s"$banner v1 v2 v3 v4"),
      (3L, "s1", s"$banner w1 w2 w3 w4"),
      // same banner but a DIFFERENT source — df 1 there, survives
      (4L, "s2", s"$banner x1 x2 x3 x4"))
      .toDF("doc_id", "source", "text")
    val r = Boilerplate.stripFrequentSpans(docs, "doc_id", "text",
        "source", spanTokens = 4, minDf = 3)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getString(3))).toMap
    assert(r(1L) === ((2L, 1L, "u1 u2 u3 u4")),
      "the banner span is boilerplate — stripped, no surviving copy")
    assert(r(2L)._3 === "v1 v2 v3 v4" && r(3L)._3 === "w1 w2 w3 w4")
    assert(r(4L) === ((2L, 2L, s"$banner x1 x2 x3 x4")),
      "the same span is NOT boilerplate in a group where it is rare")
  }

  test("within-doc repetition does not inflate df; fully-boilerplate " +
    "docs drop") {
    val docs = Seq(
      // doc 1 repeats the span 3x internally — df is still 1
      (1L, "g", s"$banner $banner $banner"),
      (2L, "g", s"$banner a1 a2 a3 a4"),
      (3L, "g", s"$banner c1 c2 c3 c4"),
      (4L, "g", banner)) // with df=4 ≥ 3, this doc is ONLY boilerplate
      .toDF("doc_id", "source", "text")
    val r = Boilerplate.stripFrequentSpans(docs, "doc_id", "text",
        "source", spanTokens = 4, minDf = 4)
      .collect().map(x => x.getLong(0) -> x.getString(3)).toMap
    assert(!r.contains(1L) && !r.contains(4L),
      "docs consisting only of boilerplate drop out")
    assert(r(2L) === "a1 a2 a3 a4" && r(3L) === "c1 c2 c3 c4")
    // at minDf = 5 the df-4 banner is below threshold: everything kept
    val loose = Boilerplate.stripFrequentSpans(docs, "doc_id", "text",
        "source", spanTokens = 4, minDf = 5)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(loose(1L) === 3L && loose(4L) === 1L)
  }
}
