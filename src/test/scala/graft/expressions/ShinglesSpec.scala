package graft.expressions

import graft.{SparkSpec, Tables}
import graft.text.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class ShinglesSpec extends SparkSpec {

  /** The built-in composition the native expression replaced — kept
    * here as the semantic reference. */
  private def composed(text: Column, n: Int): Column =
    if (n == 1) TextFunctions.tokens(text)
    else {
      val toks = TextFunctions.tokens(text)
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    }

  test("native shingles match the built-in composition on the corpus (n=1,2,3,5)") {
    val docs = Tables.documents(spark, sf0001)
    for (n <- Seq(1, 2, 3, 5)) {
      val bad = docs.select(
          TextFunctions.shingles(col("text"), n).as("native"),
          composed(col("text"), n).as("ref"))
        .filter(not(col("native") <=> col("ref")))
      assert(bad.count() === 0, s"mismatch at n=$n")
    }
  }

  test("edge cases: empty, whitespace-only, short, mixed-case, null") {
    import spark.implicits._
    val df = Seq(Some(""), Some("   \t\n "), Some("One"), Some("Two words"),
        Some("  A  B\tC  "), Some("ÄÖÜ Straße X"), None)
      .toDF("text")
    for (n <- Seq(1, 2, 3)) {
      val rows = df.select(
          TextFunctions.shingles(col("text"), n).as("native"),
          composed(col("text"), n).as("ref"))
        .collect()
      rows.zipWithIndex.foreach { case (r, i) =>
        assert(r.isNullAt(0) === r.isNullAt(1), s"null parity row $i n=$n")
        if (!r.isNullAt(0))
          assert(r.getSeq[String](0) === r.getSeq[String](1), s"row $i n=$n")
      }
    }
  }

  test("property: native == composition for 300 generated texts") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val vocab = Seq("The", "ügly", "a", "", "x", "\ttab", "word", "Zz9",
      "  ", "straße", "...", "O'Neil")
    val texts = Seq.fill(300)(
      Seq.fill(rng.nextInt(12))(vocab(rng.nextInt(vocab.size)))
        .mkString(" "))
    val df = texts.toDF("text")
    for (n <- 1 to 4) {
      val bad = df.select(
          TextFunctions.shingles(col("text"), n).as("native"),
          composed(col("text"), n).as("ref"))
        .filter(not(col("native") <=> col("ref")))
      assert(bad.count() === 0, s"mismatch at n=$n")
    }
  }

  test("graft_shingles is SQL-callable via GraftExtensions") {
    val r = spark.sql("SELECT graft_shingles('a b c d', 2) AS s")
      .head().getSeq[String](0)
    assert(r === Seq("a b", "b c", "c d"))
  }

  test("interpreted eval agrees with codegen") {
    import spark.implicits._
    val df = Seq("alpha beta gamma delta").toDF("text")
    val viaCodegen = df.select(TextFunctions.shingles(col("text"), 2))
      .head().getSeq[String](0)
    val interpreted = Shingles(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString("alpha beta gamma delta"),
        org.apache.spark.sql.types.StringType), 2)
      .eval(null).asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toObjectArray(org.apache.spark.sql.types.StringType).map(_.toString).toSeq
    assert(viaCodegen === interpreted)
  }
}
