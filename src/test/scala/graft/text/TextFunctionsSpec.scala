package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001).cache()

  test("charCount matches the fixture's n_chars column") {
    val bad = docs.filter(TextFunctions.charCount(col("text")) =!= col("n_chars"))
    assert(bad.count() === 0)
  }

  test("quality score stays in [0,1]") {
    val bad = docs.select(TextFunctions.qualityScore(col("text")).as("q"))
      .filter(col("q") < 0 || col("q") > 1)
    assert(bad.count() === 0)
  }

  test("langId returns a known lexicon language") {
    val langs = TextFunctions.stopwords.keySet
    val produced = docs.select(TextFunctions.langId(col("text")).as("l"))
      .distinct().collect().map(_.getString(0)).toSet
    assert(produced.subsetOf(langs))
  }

  test("shingles: n=1 equals tokens; window count is len-n+1") {
    import spark.implicits._
    val df = Seq("a b c d e").toDF("text")
    val row = df.select(
      size(TextFunctions.shingles(col("text"), 1)).as("s1"),
      size(TextFunctions.shingles(col("text"), 3)).as("s3"),
      size(TextFunctions.tokens(col("text"))).as("t")).collect()(0)
    assert(row.getInt(0) === row.getInt(2))
    assert(row.getInt(1) === row.getInt(2) - 2)
  }

  test("approxBpeCount >= wordCount (length surcharge only adds)") {
    val bad = docs.filter(
      TextFunctions.approxBpeCount(col("text")) < TextFunctions.wordCount(col("text")))
    assert(bad.count() === 0)
  }

  test("isCode demands BOTH symbol density and keyword evidence") {
    import spark.implicits._
    val docs = Seq(
      (1L, "def f(x) { return x; } import os; const y = [2];"), // code
      (2L, "a plain sentence about nothing in particular here"), // prose
      // math-heavy prose: symbols without keywords → NOT code
      (3L, "(a < b) = (c > d); [e] = {f}; (g) = (h); (i) < (j);"),
      // prose ABOUT code: keywords without symbols → NOT code
      (4L, "how to define a function and return a value or import one"))
      .toDF("doc_id", "text")
    val r = docs.select($"doc_id",
      TextFunctions.isCode($"text", symbolThreshold = 0.03).as("c"))
      .collect().map(x => x.getLong(0) -> x.getInt(1)).toMap
    assert(r === Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 0), r.toString)
    // doc 4 DOES carry keyword evidence ('return', 'import',
    // 'function') — proving the symbol gate alone rejected it
    val kw = docs.filter($"doc_id" === 4)
      .select(TextFunctions.codeKeywordHits($"text")).head.getLong(0)
    assert(kw >= 2, s"fixture must carry keyword evidence: $kw")
  }
}
