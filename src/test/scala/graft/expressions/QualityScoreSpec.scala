package graft.expressions

import graft.{SparkSpec, Tables}
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class QualityScoreSpec extends SparkSpec {

  test("native quality score is BIT-identical to the composition on " +
    "the real corpus") {
    val docs = Tables.documents(spark, sf0001)
    val bad = docs.select(
        TextFunctions.qualityScore(col("text")).as("native"),
        TextFunctions.qualityScoreComposed(col("text")).as("ref"))
      .filter(not(col("native") <=> col("ref")))
    assert(bad.count() === 0)
  }

  test("edge cases: empty, whitespace-only, long-word, >2000 words, " +
    "unicode, supplementary plane, null") {
    import spark.implicits._
    val longDoc = Seq.fill(2100)("word").mkString(" ")
    val df = Seq(Some(""), Some("   \t\n "), Some("One"),
        Some("Two words here"), Some("a b c d e f g h"),
        Some("supercalifragilisticexpialidocious " * 3),
        Some(longDoc), Some("ÄÖÜ Straße älter höher"),
        Some("emoji 😀 token 😀😀"),
        None)
      .toDF("text")
    val rows = df.select(
        TextFunctions.qualityScore(col("text")).as("native"),
        TextFunctions.qualityScoreComposed(col("text")).as("ref"))
      .collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null parity row $i")
      if (!r.isNullAt(0))
        assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ===
          java.lang.Double.doubleToLongBits(r.getDouble(1)), s"row $i")
    }
  }

  test("property: native == composition bit-for-bit for 400 generated " +
    "texts") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val vocab = Seq("The", "ügly", "a", "x", "word", "Zz9", "straße",
      "...", "O'Neil", "loooooooooooooong", "b")
    val texts = Seq.fill(400)(
      Seq.fill(rng.nextInt(80))(vocab(rng.nextInt(vocab.size)))
        .mkString(" "))
    val bad = texts.toDF("text").select(
        TextFunctions.qualityScore(col("text")).as("native"),
        TextFunctions.qualityScoreComposed(col("text")).as("ref"))
      .filter(not(col("native") <=> col("ref")))
    assert(bad.count() === 0)
  }

  test("graft_quality_score is SQL-callable via GraftExtensions") {
    val r = spark.sql(
      "SELECT graft_quality_score('the quick brown fox jumps') AS q")
      .head().getDouble(0)
    // wc=5: lenScore=0.1, diversity=1.0, awl=4.2 → wlScore=1.0
    assert(r === math.floor((0.1 * 0.4 + 1.0 * 0.4 + 0.2) * 1e6 + 0.5) / 1e6
      || r === 0.64)
  }

  test("interpreted eval agrees with codegen") {
    import spark.implicits._
    val s = "alpha beta beta gamma looooooooooooooooooongword"
    val viaCodegen = Seq(s).toDF("text")
      .select(TextFunctions.qualityScore(col("text"))).head().getDouble(0)
    val interpreted = QualityScore(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType))
      .eval(null).asInstanceOf[Double]
    assert(java.lang.Double.doubleToLongBits(viaCodegen) ===
      java.lang.Double.doubleToLongBits(interpreted))
  }

  test("the scoring plan carries no higher-order-function nodes") {
    val plan = Tables.documents(spark, sf0001)
      .select(TextFunctions.qualityScore(col("text")).as("q"))
      .queryExecution.executedPlan.toString
    for (hof <- Seq("aggregate(", "transform(", "array_distinct(",
        "lambdafunction")) {
      assert(!plan.toLowerCase.contains(hof),
        s"quality-score plan must not interpret lambdas, found $hof:\n$plan")
    }
  }
}
