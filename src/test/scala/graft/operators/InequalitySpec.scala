package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class InequalitySpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed Gini; equality → 0; one-owns-all → (n−1)/n") {
    // x = 1,2,3,4: G = 2·(1+4+9+16)/(4·10) − 5/4 = 0.25
    val g = Inequality.gini(
      Seq(1.0, 2.0, 3.0, 4.0).toDF("v"), "v").head()
    assert(g.getLong(0) === 4L && g.getDouble(1) === 10.0)
    assert(g.getDouble(2) === 0.25)
    // perfect equality
    val eq = Inequality.gini(Seq.fill(5)(7.0).toDF("v"), "v").head()
    assert(eq.getDouble(2) === 0.0)
    // one unit owns everything: G = (n−1)/n = 0.8
    val one = Inequality.gini(
      (Seq.fill(4)(0.0) :+ 100.0).toDF("v"), "v").head()
    assert(one.getDouble(2) === 0.8)
  }

  test("ties are well-defined and per-group isolation holds") {
    val df = Seq(("a", 5.0), ("a", 5.0), ("a", 5.0),
      ("b", 1.0), ("b", 9.0)).toDF("g", "v")
    val out = Inequality.gini(df, "v", Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(out("a") === 0.0)   // all tied → perfect equality
    // b: x=1,9 → 2·(1+18)/(2·10) − 3/2 = 1.9 − 1.5 = 0.4
    assert(out("b") === 0.4)
    // layout determinism
    val again = Inequality.gini(df.repartition(7), "v", Seq("g"))
      .collect().map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(again === out)
  }

  test("zero-total group guards to 0, not NaN") {
    val z = Inequality.gini(Seq(0.0, 0.0).toDF("v"), "v").head()
    assert(z.getDouble(2) === 0.0)
  }
}
