package graft.operators

import graft.SparkSpec

class RankCorrelationSpec extends SparkSpec {

  import spark.implicits._

  test("monotone nonlinear relation scores exactly 1; reversed, -1") {
    // y = x³ is monotone but very non-linear: Pearson < 1, Spearman = 1
    val xs = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val df = xs.map(x => (x, x * x * x)).toDF("x", "y")
    val r = RankCorrelation.spearman(df, "x", "y").head
    assert(r.getLong(0) === 6L && r.getDouble(1) === 1.0, r.toString)
    val rev = RankCorrelation.spearman(
      xs.map(x => (x, -x * x * x)).toDF("x", "y"), "x", "y").head
    assert(rev.getDouble(1) === -1.0)
  }

  test("hand-computed rho with ties (average ranks)") {
    // x: 1,2,2,4  → ranks 1, 2.5, 2.5, 4
    // y: 10,20,30,30 → ranks 1, 2, 3.5, 3.5
    val df = Seq((1L, 10L), (2L, 20L), (2L, 30L), (4L, 30L))
      .toDF("x", "y")
    val r = RankCorrelation.spearman(df, "x", "y").head
    // Pearson over ranks: means 2.5/2.5; dx=(-1.5,0,0,1.5),
    // dy=(-1.5,-0.5,1,1); num=2.25+0+0+1.5=3.75
    // den=sqrt(4.5 * 4.5)=4.5 → rho = 0.833333
    assert(math.abs(r.getDouble(1) - 0.833333) < 1e-6, r.toString)
  }

  test("whale row cannot own the statistic the way it owns Pearson") {
    val base = (1 to 50).map(i => (i.toLong, (51 - i).toLong)) // perfect −1
    val whale = (1000000L, 1000000L) // one aligned outlier
    val df = (base :+ whale).toDF("x", "y")
    val rho = RankCorrelation.spearman(df, "x", "y").head.getDouble(1)
    // Pearson with the whale flips to ≈ +1; Spearman only moves by
    // one rank's worth
    assert(rho < -0.8, s"spearman stayed robust: $rho")
  }

  test("constant columns and tiny groups are dropped") {
    val df = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("a", 3L, 1L),
      ("b", 1L, 5L)).toDF("g", "x", "y")
    assert(RankCorrelation.spearman(df, "x", "y", Seq("g"))
      .collect().isEmpty)
  }
}
