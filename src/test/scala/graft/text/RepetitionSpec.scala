package graft.text

import graft.SparkSpec

class RepetitionSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed fractions on crafted docs") {
    val docs = Seq(
      // 4 tokens, 2 distinct ("a"×3, "b") → dup_token 1−2/4=0.5, top 3/4
      // trigrams: [a a a, a a b] → 2 total, 2 distinct → dup_tri 0
      (1L, "a a a b"),
      // perfectly diverse: dup fractions 0, top 1/4
      (2L, "w x y z"),
      // pure repetition: "c c c c c c" → dup_token 1−1/6, trigrams
      // [c c c]×4 → dup_tri 1−1/4=0.75, top 1.0
      (3L, "c c c c c c"),
      // short doc (<3 tokens): single joined shingle → dup_tri 0
      (4L, "p q")
    ).toDF("doc_id", "text")
    val got = Repetition.stats(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got(1L) === ((4L, 0.5, 0.0, 0.75)))
    assert(got(2L) === ((4L, 0.0, 0.0, 0.25)))
    assert(got(3L) === ((6L, 0.833333, 0.75, 1.0)))
    assert(got(4L) === ((2L, 0.0, 0.0, 0.5)))
  }

  test("empty docs vanish; all fractions stay in [0,1] on the corpus") {
    val withEmpty = Seq((1L, "a b c d"), (2L, "   "), (3L, "")).toDF("doc_id", "text")
    assert(Repetition.stats(withEmpty, "doc_id", "text").count() === 1)
    val corpus = Repetition.stats(
      graft.Tables.documents(spark, sf0001), "doc_id", "text")
    import org.apache.spark.sql.functions.col
    val outOfRange = corpus.filter(
      col("dup_token_frac") < 0 || col("dup_token_frac") > 1 ||
      col("dup_trigram_frac") < 0 || col("dup_trigram_frac") > 1 ||
      col("top_token_frac") <= 0 || col("top_token_frac") > 1)
    assert(outOfRange.count() === 0)
  }
}
