package graft.operators

import graft.SparkSpec

class MetaAnalysisSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed pooling with heterogeneity") {
    // two unit-weight segments at 2 and 4: pooled 3, se √½,
    // Q = 1 + 1 = 2, df = 1 → I² = .5
    val df = Seq((2.0, 1.0), (4.0, 1.0)).toDF("e", "se")
    val r = MetaAnalysis.fixedEffect(df, "e", "se").head
    assert(r.getLong(0) === 2L)
    assert(math.abs(r.getDouble(1) - 3.0) < 1e-6, r.toString)
    assert(math.abs(r.getDouble(2) - math.sqrt(0.5)) < 1e-6)
    assert(math.abs(r.getDouble(4) - 2.0) < 1e-4, s"Q ${r.getDouble(4)}")
    assert(math.abs(r.getDouble(5) - 0.5) < 1e-4, s"I2 ${r.getDouble(5)}")
  }

  test("inverse-variance weighting pulls toward the precise segment") {
    // e=10 with se=0.1 vs e=0 with se=1: w = 100 vs 1 → pooled ≈ 9.9
    val df = Seq((10.0, 0.1), (0.0, 1.0)).toDF("e", "se")
    val r = MetaAnalysis.fixedEffect(df, "e", "se").head
    assert(math.abs(r.getDouble(1) - 1000.0 / 101.0) < 1e-3, r.toString)
  }

  test("homogeneous segments read I2 = 0; se<=0 rows are dropped") {
    val df = Seq((3.0, 1.0), (3.0, 1.0), (3.0, 1.0), (99.0, 0.0))
      .toDF("e", "se")
    val r = MetaAnalysis.fixedEffect(df, "e", "se").head
    assert(r.getLong(0) === 3L, "zero-se row must not poison the pool")
    assert(r.getDouble(1) === 3.0)
    assert(r.getDouble(5) === 0.0, s"I2 ${r.getDouble(5)}")
  }
}
