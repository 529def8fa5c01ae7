package graft.text

import graft.SparkSpec

class ReadabilitySpec extends SparkSpec {

  import spark.implicits._

  private def score(text: String) =
    Readability.scores(Seq((1L, text)).toDF("doc_id", "text"),
      Seq("doc_id"), "text").collect()(0)

  test("hand-computed counts and scores on a two-sentence doc") {
    val r = score("The cat sat. The dog ran!")
    assert(r.getLong(1) === 6L, "words")
    assert(r.getLong(2) === 2L, "sentences")
    assert(r.getLong(3) === 6L, "syllables") // one vowel run per word
    // wps = 3, spw = 1
    val flesch = BigDecimal(206.835 - 1.015 * 3.0 - 84.6 * 1.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val fk = BigDecimal(0.39 * 3.0 + 11.8 * 1.0 - 15.59)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getDouble(4) === flesch)
    assert(r.getDouble(5) === fk)
  }

  test("vowel RUNS approximate syllables: beautiful = 3, not 5") {
    // b-eau-t-i-f-u-l: runs eau, i, u
    val r = score("beautiful")
    assert(r.getLong(1) === 1L && r.getLong(3) === 3L)
  }

  test("no terminal punctuation still counts one sentence; !?! is one run") {
    assert(score("wait what").getLong(2) === 1L)
    assert(score("no way!?! really?? yes.").getLong(2) === 3L)
  }

  test("wordless docs report null scores, not NaN") {
    for (t <- Seq("", "   ", "!!!")) {
      val r = score(t)
      assert(r.getLong(1) === 0L, s"words of '$t'")
      assert(r.isNullAt(4) && r.isNullAt(5), s"scores of '$t'")
    }
  }

  test("harder prose grades higher than simple prose") {
    val simple = score("The cat sat. The dog ran. We go out. It is fun.")
    val dense = score(
      "Notwithstanding considerable epistemological controversies, " +
        "contemporary institutional administration necessitates " +
        "comprehensive documentation requirements.")
    assert(dense.getDouble(5) > simple.getDouble(5),
      s"${dense.getDouble(5)} vs ${simple.getDouble(5)}")
    assert(dense.getDouble(4) < simple.getDouble(4))
  }
}
