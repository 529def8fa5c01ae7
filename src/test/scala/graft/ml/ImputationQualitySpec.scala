package graft.ml

import graft.SparkSpec
import graft.functions.Noise
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's value proposition: an RBM exploits cross-column
  * structure, so on correlated data its fills should beat the
  * column mean. Deterministic (seeded) — not a flaky statistical test.
  */
class ImputationQualitySpec extends SparkSpec {

  // two strongly-coupled columns driven by a hidden binary factor
  private lazy val base: DataFrame = {
    val n = 2000
    spark.range(1, n + 1).toDF("id")
      .withColumn("hidden", (Noise.hashNoise(col("id"), 77) > 0.5).cast("int"))
      .withColumn("a",
        col("hidden") * 600.0 + 200.0 + Noise.hashNoise(col("id"), 78) * 30.0)
      .withColumn("b",
        col("hidden") * 600.0 + 200.0 + Noise.hashNoise(col("id"), 79) * 30.0)
      .drop("hidden")
  }
  private lazy val truth = base.select(col("id"), col("a").as("a_true"))
  private lazy val withMissing =
    Noise.injectMissing(base, "a", "id", salt = 80, frac = 0.15).cache()

  // the local fit is used by BOTH tests (quality bar + distributed
  // parity) — memoized so the 40-epoch training runs once
  private lazy val localErrors: (Double, Double) = fillErrors("local")

  /** Mean abs error of the model's fills on the masked cells, plus the
    * mean-impute error on the same cells. */
  private def fillErrors(backendName: String): (Double, Double) = {
    val model = new RbmImputer()
      .setNumericCols(Seq("a", "b")).setKeyCol("id")
      .setNHidden(8).setMaxEpochs(40).setBatchSize(32)
      .setLearnRate(0.5).setDropoutFraction(0.0)
      .setBackend(backendName)
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
    (errs.getDouble(0), errs.getDouble(1))
  }

  test("RBM imputation beats mean imputation on correlated bimodal data") {
    val (rbmErr, meanErr) = localErrors
    // mean-impute error ≈ 300 (bimodal); the RBM sees `b` and should
    // land on the right mode most of the time
    assert(rbmErr < meanErr * 0.75,
      s"RBM err $rbmErr not clearly better than mean err $meanErr")
  }

  test("distributed backend converges to the same imputation quality as local") {
    // the treeAggregate backend is what 100 TB actually runs — it must
    // reach the quality bar on its own, not just compile. Not
    // bit-equality (different batch partitioning → different CD-1
    // trajectories); SAME quality: both clearly beat mean impute, and
    // neither is far worse than the other.
    val (localErr, meanErr) = localErrors
    val (distErr, _) = fillErrors("distributed")
    assert(distErr < meanErr * 0.75,
      s"distributed RBM err $distErr not clearly better than mean err $meanErr")
    assert(distErr < localErr * 1.5 && localErr < distErr * 1.5,
      s"backends diverged in quality: local=$localErr distributed=$distErr")
  }
}
