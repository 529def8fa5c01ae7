package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Trained nuisance models for the observational estimators, plus the
  * multi-covariate regression adjustment: the confounded fixture has
  * a LOGISTIC true propensity (so LR is correctly specified) and a
  * linear outcome surface (so the per-arm OLS is too) — the trained
  * estimators must recover the planted effect the naive difference
  * badly misses. */
class PropensitySpec extends SparkSpec {

  import spark.implicits._

  private val PlantedEffect = 5.0

  /** Confounded units: x drives BOTH treatment (logistic e(x)) and
    * outcome (+8x), so arms differ in x-mix. Deterministic hash
    * "uniforms" keep the fixture reproducible. */
  private lazy val confounded = (0 until 4000).map { i =>
    val x = (i % 100) / 100.0
    val e = 1.0 / (1.0 + math.exp(-(-1.0 + 2.0 * x)))
    val u = ((i * 2654435761L) % 1000003L).toDouble / 1000003.0
    val t = if (u < e) 1 else 0
    val noise = ((i * 40503L) % 997L).toDouble / 997.0 - 0.5
    val y = 2.0 + PlantedEffect * t + 8.0 * x + noise
    (i.toLong, t, y, x, x * x)
  }.toDF("id", "t", "y", "x1", "x2")

  private def naiveDiff: Double = {
    val m = confounded.groupBy("t").agg(avg("y")).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    m(1) - m(0)
  }

  test("trained-propensity IPW recovers the planted effect where the " +
    "naive difference fails") {
    val naiveBias = math.abs(naiveDiff - PlantedEffect)
    assert(naiveBias > 0.6,
      s"fixture premise: naive must be visibly biased, bias=$naiveBias")
    val r = Experiment.ipwAteTrained(confounded, "t", "y", Seq("x1"))
      .collect().head
    val ate = r.getDouble(2)
    assert(math.abs(ate - PlantedEffect) < 0.3,
      s"trained-e IPW must deconfound: ate=$ate (naive bias $naiveBias)")
    assert(math.abs(ate - PlantedEffect) < naiveBias / 2,
      "trained-e IPW must beat naive by at least 2x")
  }

  test("calibrated trained propensity stays within the recovery band") {
    val r = Experiment.ipwAteTrained(confounded, "t", "y", Seq("x1"),
      calibrate = true).collect().head
    val ate = r.getDouble(2)
    assert(math.abs(ate - PlantedEffect) < 0.4,
      s"calibrated trained-e IPW drifted: $ate")
  }

  test("fully-trained AIPW (LR propensity + per-arm exact-moment OLS) " +
    "recovers the effect tightly — the outcome model is correctly " +
    "specified, so the doubly-robust estimate leans on it") {
    val r = Experiment.aipwAteTrained(confounded, "t", "y", Seq("x1"))
      .collect().head
    val ate = r.getDouble(2)
    assert(math.abs(ate - PlantedEffect) < 0.15,
      s"trained AIPW must be near-exact here: $ate")
  }

  test("scorePropensity's e_hat approximates the true logistic e(x)") {
    val model = Experiment.fitPropensity(confounded, "t", Seq("x1"))
    val scored = Experiment.scorePropensity(confounded, Seq("x1"), model)
    val maxErr = scored
      .select(max(abs(col("e_hat") -
        lit(1.0) / (lit(1.0) + exp(-(lit(-1.0) + lit(2.0) * col("x1")))))))
      .collect().head.getDouble(0)
    assert(maxErr < 0.05, s"LR should recover the true logistic: $maxErr")
  }

  test("regressionAdjust with k=1 reproduces cuped; two correlated " +
    "covariates reduce variance at least as much as the best single") {
    // y depends on BOTH covariates → the pair explains more than
    // either alone; decimals on a 2-dp grid (the cuped contract)
    val perUnit = (0 until 2000).map { i =>
      val x1 = (i % 50).toDouble
      val x2 = ((i * 7) % 31).toDouble
      val noise = ((i * 104729L) % 211L).toDouble / 211.0 - 0.5
      (BigDecimal(x1).setScale(2), BigDecimal(x2).setScale(2),
        BigDecimal(3.0 * x1 + 2.0 * x2 + noise)
          .setScale(2, BigDecimal.RoundingMode.HALF_UP))
    }.toDF("x1", "x2", "y")
    val c1 = Experiment.cuped(perUnit, "x1", "y").collect().head
    val r1 = Experiment.regressionAdjust(perUnit, Seq("x1"), "y")
      .collect().head
    assert(math.abs(r1.getAs[Double]("theta_1")
      - c1.getAs[Double]("theta")) < 1e-6)
    assert(math.abs(r1.getAs[Double]("var_y_adj")
      - c1.getAs[Double]("var_y_adj")) < 1e-4,
      s"k=1 must reproduce cuped: $r1 vs $c1")
    val r2 = Experiment.regressionAdjust(perUnit, Seq("x1", "x2"), "y")
      .collect().head
    val red1 = r1.getAs[Double]("var_reduction_pct")
    val c2 = Experiment.cuped(perUnit, "x2", "y").collect().head
    val redSingleBest = math.max(red1, c2.getAs[Double]("var_reduction_pct"))
    val red2 = r2.getAs[Double]("var_reduction_pct")
    assert(red2 >= redSingleBest - 1e-9,
      s"two covariates must not lose to one: $red2 < $redSingleBest")
    assert(red2 > redSingleBest + 1.0,
      s"on this fixture the pair should clearly win: $red2 vs $redSingleBest")
    // the learned coefficients recover the planted surface
    assert(math.abs(r2.getAs[Double]("theta_1") - 3.0) < 0.05)
    assert(math.abs(r2.getAs[Double]("theta_2") - 2.0) < 0.05)
  }

  test("regressionAdjust rejects collinear covariates loudly") {
    val perUnit = (0 until 100).map { i =>
      val x = (i % 10).toDouble
      (BigDecimal(x).setScale(2), BigDecimal(2.0 * x).setScale(2),
        BigDecimal(x + 1.0).setScale(2))
    }.toDF("x1", "x2", "y")
    intercept[IllegalArgumentException] {
      Experiment.regressionAdjust(perUnit, Seq("x1", "x2"), "y")
    }
  }
}
