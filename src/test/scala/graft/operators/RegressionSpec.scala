package graft.operators

import graft.SparkSpec

class RegressionSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed fit on a perfect line plus one residual point") {
    // y = 2x + 1 at x = 1..4, then (5, 15) breaks the line by +4.
    val df = Seq((1.0, 3.0), (2.0, 5.0), (3.0, 7.0), (4.0, 9.0),
        (5.0, 15.0))
      .map { case (x, y) => (BigDecimal(x), BigDecimal(y)) }
      .toDF("x", "y")
    val r = Regression.ols(df, "x", "y").head
    // sums: n=5 sx=15 sy=39 sxx=55 sxy=145 syy=389
    // Sxx=10 Sxy=28 Syy=84.8 → slope 2.8, intercept 7.8−2.8·3=−0.6
    assert(r.getLong(0) === 5L)
    assert(math.abs(r.getDouble(1) - 2.8) < 1e-9, r.toString)
    assert(math.abs(r.getDouble(2) - (-0.6)) < 1e-9, r.toString)
    // R² = 784/848, s² = (84.8−2.8·28)/3 = 6.4/3, se = √(s²/10)
    assert(math.abs(r.getDouble(3) - 784.0 / 848.0) < 1e-6, r.toString)
    val se = math.sqrt(6.4 / 3.0 / 10.0)
    assert(math.abs(r.getDouble(4) - se) < 1e-6, r.toString)
    assert(math.abs(r.getDouble(5) - 2.8 / se) < 1e-4, r.toString)
  }

  test("perfect line: R2 = 1, se = 0; degenerate groups dropped") {
    val df = Seq(
      ("a", 1.0, 3.0), ("a", 2.0, 5.0), ("a", 3.0, 7.0),
      ("b", 2.0, 1.0), ("b", 2.0, 9.0), ("b", 2.0, 4.0), // zero x-var
      ("c", 1.0, 1.0), ("c", 2.0, 2.0))                  // n < 3
      .map { case (g, x, y) => (g, BigDecimal(x), BigDecimal(y)) }
      .toDF("g", "x", "y")
    val rows = Regression.ols(df, "x", "y", Seq("g")).collect()
    assert(rows.map(_.getString(0)).toSet === Set("a"))
    val a = rows.head
    assert(math.abs(a.getDouble(2) - 2.0) < 1e-9) // slope
    assert(math.abs(a.getDouble(4) - 1.0) < 1e-9) // r2
    assert(a.getDouble(5) === 0.0)                // se
    assert(a.isNullAt(6), "t is null on a perfect fit (se = 0)")
  }

  test("document chars-on-words slope is decisively positive") {
    val docs = graft.Tables.documents(spark, sf0001).select(
      graft.text.TextFunctions.wordCount(
        org.apache.spark.sql.functions.col("text")).as("x"),
      org.apache.spark.sql.functions.col("n_chars").as("y"))
    val r = Regression.ols(docs, "x", "y").head
    assert(r.getDouble(1) > 1, "chars per word must exceed 1")
    assert(r.getDouble(5) > 10, s"t should be decisive: ${r.getDouble(5)}")
    assert(r.getDouble(3) > 0.5 && r.getDouble(3) <= 1.0)
  }
}
