package graft.expressions

import graft.{SparkSpec, Tables}
import graft.text.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class CharNgramsSpec extends SparkSpec {

  /** The per-position substring composition the expression replaced. */
  private def composed(s: Column, n: Int): Column =
    when(length(s) < n, array())
      .otherwise(transform(sequence(lit(1), length(s) - (n - 1)),
        i => substring(s, i.cast("int"), lit(n))))

  test("native char n-grams match the composition on the corpus (n=1,3,5)") {
    val docs = Tables.documents(spark, sf0001)
      .select(lower(col("text")).as("lt"))
    for (n <- Seq(1, 3, 5)) {
      val bad = docs.select(
          TextFunctions.charNgrams(col("lt"), n).as("native"),
          composed(col("lt"), n).as("ref"))
        .filter(not(col("native") <=> col("ref")))
      assert(bad.count() === 0, s"mismatch at n=$n")
    }
  }

  test("edge cases: empty, shorter than n, exactly n, unicode, null") {
    import spark.implicits._
    val df = Seq(Some(""), Some("ab"), Some("abc"), Some("straße äö"),
        None).toDF("s")
    val rows = df.select(
        TextFunctions.charNgrams(col("s"), 3).as("n"),
        composed(col("s"), 3).as("c"))
      .collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null parity row $i")
      if (!r.isNullAt(0))
        assert(r.getSeq[String](0) === r.getSeq[String](1), s"row $i")
    }
    assert(rows(2).getSeq[String](0) === Seq("abc"))
  }

  test("graft_char_ngrams is SQL-callable via GraftExtensions") {
    val r = spark.sql("SELECT graft_char_ngrams('abcd', 2) AS g")
      .head().getSeq[String](0)
    assert(r === Seq("ab", "bc", "cd"))
  }
}
