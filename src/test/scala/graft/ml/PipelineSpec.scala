package graft.ml

import graft.{SparkSpec, Tables}
import graft.functions.Noise
import org.apache.spark.ml.Pipeline
import org.apache.spark.sql.functions._

/** RbmImputer must compose as a standard MLlib Pipeline stage — the
  * "MLlib pipeline for RBM-based imputation" contract from
  * BASELINE.json's spark_approach. */
class PipelineSpec extends SparkSpec {

  test("RbmImputer composes inside org.apache.spark.ml.Pipeline") {
    val withMissing = Noise.injectMissing(
      Tables.customer(spark, sf0001), "c_acctbal", "c_custkey", 21, 0.10)
    val imputer = new RbmImputer()
      .setNumericCols(Seq("c_acctbal"))
      .setKeyCol("c_custkey")
      .setMaxEpochs(5)
    val pipeline = new Pipeline().setStages(Array(imputer))
    val model = pipeline.fit(withMissing)
    val out = model.transform(withMissing)
    assert(out.filter(col("c_acctbal").isNull).count() === 0)
    assert(out.schema === withMissing.schema)
    // params survive the pipeline copy machinery
    val stage = model.stages(0).asInstanceOf[RbmImputerModel]
    assert(stage.getOrDefault(stage.keyCol) === "c_custkey")
  }
}
