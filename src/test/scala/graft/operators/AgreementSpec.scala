package graft.operators

import graft.SparkSpec

class AgreementSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed κ: the textbook 2×2 table") {
    // 50 items: A=yes,B=yes 20; yes,no 5; no,yes 10; no,no 15
    // p_o = 35/50 = 0.7
    // p_e = (25/50)(30/50) + (25/50)(20/50) = 0.3 + 0.2 = 0.5
    // κ = (0.7 − 0.5)/0.5 = 0.4
    val rows = Seq.fill(20)(("yes", "yes")) ++ Seq.fill(5)(("yes", "no")) ++
      Seq.fill(10)(("no", "yes")) ++ Seq.fill(15)(("no", "no"))
    val r = Agreement.cohenKappa(rows.toDF("a", "b"), "a", "b").head()
    assert(r.getLong(0) === 50L)
    assert(r.getDouble(1) === 0.7)
    assert(r.getDouble(2) === 0.5)
    assert(r.getDouble(3) === 0.4)
  }

  test("perfect agreement → κ = 1; chance-level skew → κ ≈ 0") {
    val perfect = Seq.fill(30)(("x", "x")) ++ Seq.fill(10)(("y", "y"))
    val p = Agreement.cohenKappa(perfect.toDF("a", "b"), "a", "b").head()
    assert(p.getDouble(3) === 1.0)
    // both raters say "x" 90% of the time INDEPENDENTLY: agreement is
    // high (82%) but κ must strip it to ~0 — build the product table
    val skew = (for (i <- 0 until 100) yield {
      val a = if (i % 10 < 9) "x" else "y"
      val b = if ((i / 10) % 10 < 9) "x" else "y"
      (a, b)
    }).toDF("a", "b")
    val s = Agreement.cohenKappa(skew, "a", "b").head()
    assert(s.getDouble(1) >= 0.8)           // raw agreement flatters
    assert(math.abs(s.getDouble(3)) < 1e-6) // κ does not
  }

  test("constant labels on both sides (p_e = 1) guard to κ = 0") {
    val const = Seq.fill(10)(("x", "x")).toDF("a", "b")
    val r = Agreement.cohenKappa(const, "a", "b").head()
    assert(r.getDouble(2) === 1.0 && r.getDouble(3) === 0.0)
  }

  test("labels only one source uses contribute 0 chance mass, not a crash") {
    val rows = Seq(("x", "x"), ("x", "z"), ("y", "x")).toDF("a", "b")
    val r = Agreement.cohenKappa(rows, "a", "b").head()
    // p_o = 1/3; p_e = (2·2 + 1·0 + 0·1)/9 = 4/9
    assert(r.getDouble(1) === 0.333333)
    assert(r.getDouble(2) === 0.444444)
  }
}
