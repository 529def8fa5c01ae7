package graft.ml

import graft.{SparkSpec, Tables}
import graft.functions.Noise
import org.apache.spark.sql.functions._

class RbmTunerSpec extends SparkSpec {

  private lazy val withMissing = {
    val base = Tables.customer(spark, sf0001)
    Noise.injectMissing(
      Noise.injectMissing(base, "c_acctbal", "c_custkey", salt = 21, frac = 0.10),
      "c_mktsegment", "c_custkey", salt = 22, frac = 0.10).cache()
  }

  private def imputer = new RbmImputer()
    .setNumericCols(Seq("c_acctbal"))
    .setCategoricalCols(Seq("c_mktsegment"))
    .setKeyCol("c_custkey")
    .setMaxEpochs(8)

  test("tuner scores every candidate and refits the argmin") {
    val grid = Seq(
      RbmTuner.Candidate(4, 0.1, 32, 0.0),
      RbmTuner.Candidate(16, 0.3, 32, 0.5))
    val report = RbmTuner.fitTuned(imputer, withMissing, grid, tuneEpochs = 3)
    assert(report.scores.size === 2)
    assert(report.scores.forall(_._2 >= 0.0))
    assert(report.best === report.scores.minBy(_._2)._1)
    val out = report.model.transform(withMissing)
    assert(out.filter(col("c_acctbal").isNull || col("c_mktsegment").isNull)
      .count() === 0)
  }

  test("distributed backend trains and imputes with same invariants") {
    val model = imputer.setBackend("distributed").setMaxEpochs(6)
      .setLearnRate(0.5).fit(withMissing)
    assert(model.epochErrors.nonEmpty)
    val out = model.transform(withMissing).cache()
    assert(out.filter(col("c_acctbal").isNull || col("c_mktsegment").isNull)
      .count() === 0)
    // known cells unchanged
    val joined = out.as("i").join(withMissing.as("m"), "c_custkey")
    assert(joined.filter(col("m.c_acctbal").isNotNull &&
      col("i.c_acctbal") =!= col("m.c_acctbal")).count() === 0)
    // validation error should improve over training on this easy data
    assert(model.epochErrors.min <= model.epochErrors.head + 1e-12)
  }
}
