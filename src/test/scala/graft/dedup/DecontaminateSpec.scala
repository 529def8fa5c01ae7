package graft.dedup

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DecontaminateSpec extends SparkSpec {

  import spark.implicits._

  // Planted-overlap corpus: train docs 1/2 embed a verbatim 8-gram run
  // from the eval set, 3/4/5 share only shorter runs or nothing.
  private val evalSet = Seq(
    "the quick brown fox jumps over the lazy dog tonight",
    "benchmark questions must stay held out of training data"
  ).toDF("text")

  private val train = Seq(
    (1L, "prefix words then the quick brown fox jumps over the lazy dog and more"),
    (2L, "benchmark questions must stay held out of training data verbatim copy"),
    (3L, "the quick brown fox sat still"), // 4-token overlap only
    (4L, "completely unrelated text about spark catalyst expression codegen paths"),
    (5L, "")
  ).toDF("doc_id", "text")

  test("planted 8-gram overlap is dropped; clean and short-overlap docs kept") {
    val kept = Decontaminate.decontaminate(train, evalSet, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(3L, 4L, 5L))
    // output schema == input schema
    val out = Decontaminate.decontaminate(train, evalSet, "doc_id", "text")
    assert(out.schema === train.schema)
  }

  test("hashed path equals exact string-matching path on the real corpus") {
    val docs = Tables.documents(spark, sf001)
    val evalDocs = docs.filter(col("doc_id") < 100).select(col("text"))
    val trainDocs = docs.filter(col("doc_id") >= 100)
    val exact = Decontaminate.contaminatedIdsExact(trainDocs, evalDocs, "doc_id", "text")
    val hashed = Decontaminate.contaminatedIds(trainDocs, evalDocs, "doc_id", "text")
    assert(exact.exceptAll(hashed).count() === 0)
    assert(hashed.exceptAll(exact).count() === 0)
    assert(exact.count() > 0, "fixture corpus should contain real 8-gram overlap")
  }

  test("contamination score: planted overlap fractions, hashed == exact") {
    val scores = Decontaminate.contaminationScoreExact(
        train, evalSet, "doc_id", "text")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 1: 14 tokens → 7 distinct 8-grams, 3 of them inside the
    // planted eval run; doc 2: fully contained prefix run; doc 4: zero
    // overlap; docs 3 (< 8 tokens → 1 short gram... none matching) and
    // 5 (empty → no grams, drops out)
    val byId = scores.map(s => s._1 -> s).toMap
    assert(byId(1L)._3 > 0 && byId(1L)._3 < byId(1L)._2,
      s"doc 1 should be partially contaminated: ${byId(1L)}")
    assert(byId(2L)._3 > 0, s"doc 2 should overlap: ${byId(2L)}")
    assert(byId(4L)._3 === 0L, s"doc 4 must be clean: ${byId(4L)}")
    assert(!byId.contains(5L), "empty doc has no grams and must drop")
    // hashed production path computes identical rows on the real corpus
    val docs = Tables.documents(spark, sf001)
    val ev = docs.filter(col("doc_id") < 100).select(col("text"))
    val tr = docs.filter(col("doc_id") >= 100)
    val exact = Decontaminate.contaminationScoreExact(tr, ev, "doc_id", "text")
    val hashed = Decontaminate.contaminationScore(tr, ev, "doc_id", "text")
    assert(exact.exceptAll(hashed).count() === 0)
    assert(hashed.exceptAll(exact).count() === 0)
  }

  test("blank documents never count as contamination overlap") {
    val blanks = Seq((10L, ""), (11L, "   "), (12L, "real content here")).toDF("doc_id", "text")
    val blankEval = Seq("", "  ").toDF("text")
    // blank eval rows must not flag blank (or any) train docs
    val kept = Decontaminate.decontaminate(blanks, blankEval, "doc_id", "text")
    assert(kept.count() === 3)
  }

  test("eval side works with any schema (only the text column is read)") {
    val weirdEval = Seq(("x", 1, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("label", "rank", "text")
    val contaminated = Decontaminate.contaminatedIds(train, weirdEval, "doc_id", "text")
      .as[Long].collect().sorted
    assert(contaminated.toSeq === Seq(1L))
  }
}
