package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExperimentSpec extends SparkSpec {

  import spark.implicits._

  test("cuped: correlated covariate slashes variance; uncorrelated doesn't") {
    // y ≈ 2x + small deterministic wiggle → corr² ≈ 1 → big reduction
    val correlated = (1 to 400).map { i =>
      val x = BigDecimal(i)
      val y = BigDecimal(2 * i) + BigDecimal((i * 7919) % 11) // wiggle 0..10
      (x, y)
    }.toDF("x", "y")
      .select(col("x").cast("decimal(18,2)").as("x"),
        col("y").cast("decimal(18,2)").as("y"))
    val r = Experiment.cuped(correlated, "x", "y").collect()(0)
    assert(r.getLong(0) === 400L)
    assert(math.abs(r.getDouble(1) - 2.0) < 0.01, s"theta ${r.getDouble(1)}")
    assert(r.getDouble(4) > 99.0, s"reduction ${r.getDouble(4)}")
    // x independent of y (x cycles 0/1, y cycles with coprime period):
    // θ near 0, reduction near 0 — CUPED never hurts, and never lies
    val uncorrelated = (1 to 400).map(i =>
      (BigDecimal(i % 2), BigDecimal((i * 13) % 7))).toDF("x", "y")
      .select(col("x").cast("decimal(18,2)").as("x"),
        col("y").cast("decimal(18,2)").as("y"))
    val u = Experiment.cuped(uncorrelated, "x", "y").collect()(0)
    assert(u.getDouble(4) >= 0.0 && u.getDouble(4) < 5.0,
      s"uncorrelated reduction ${u.getDouble(4)}")
  }

  test("variantOf: deterministic, exhaustive, roughly balanced") {
    val keys = spark.range(0, 10000).toDF("k")
    val v = keys.select(Experiment.variantOf(col("k"),
        Seq("control", "treatment"), salt = 17).as("v"))
      .groupBy("v").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v.keySet === Set("control", "treatment"))
    assert(v.values.forall(n => n > 4500 && n < 5500), v.toString)
  }
}
