package graft.ml

import graft.SparkSpec
import graft.functions.Noise
import org.apache.spark.sql.functions._

/** The reference's value proposition: an RBM exploits cross-column
  * structure, so on correlated data its fills should beat the
  * column mean. Deterministic (seeded) — not a flaky statistical test.
  */
class ImputationQualitySpec extends SparkSpec {

  test("RBM imputation beats mean imputation on correlated bimodal data") {
    import spark.implicits._
    // two strongly-coupled columns driven by a hidden binary factor
    val n = 2000
    val base = spark.range(1, n + 1).toDF("id")
      .withColumn("hidden", (Noise.hashNoise(col("id"), 77) > 0.5).cast("int"))
      .withColumn("a",
        col("hidden") * 600.0 + 200.0 + Noise.hashNoise(col("id"), 78) * 30.0)
      .withColumn("b",
        col("hidden") * 600.0 + 200.0 + Noise.hashNoise(col("id"), 79) * 30.0)
      .drop("hidden")
    val truth = base.select(col("id"), col("a").as("a_true"))
    val withMissing = Noise.injectMissing(base, "a", "id", salt = 80, frac = 0.15)

    val model = new RbmImputer()
      .setNumericCols(Seq("a", "b")).setKeyCol("id")
      .setNHidden(8).setMaxEpochs(40).setBatchSize(32)
      .setLearnRate(0.5).setDropoutFraction(0.0)
      .fit(withMissing)
    val imputed = model.transform(withMissing)

    val meanA = withMissing.agg(avg("a")).collect()(0).getDouble(0)
    val errs = imputed.join(truth, "id")
      .join(withMissing.select(col("id"), col("a").as("a_masked")), "id")
      .filter(col("a_masked").isNull)
      .agg(
        avg(abs(col("a") - col("a_true"))).as("rbm_err"),
        avg(abs(lit(meanA) - col("a_true"))).as("mean_err"))
      .collect()(0)
    val (rbmErr, meanErr) = (errs.getDouble(0), errs.getDouble(1))
    // mean-impute error ≈ 300 (bimodal); the RBM sees `b` and should
    // land on the right mode most of the time
    assert(rbmErr < meanErr * 0.75,
      s"RBM err $rbmErr not clearly better than mean err $meanErr")
  }
}
