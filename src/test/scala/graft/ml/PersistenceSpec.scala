package graft.ml

import graft.{SparkSpec, Tables}
import graft.functions.Noise
import org.apache.spark.sql.functions._

class PersistenceSpec extends SparkSpec {

  private lazy val withMissing = Noise.injectMissing(
    Noise.injectMissing(Tables.customer(spark, sf0001), "c_acctbal",
      "c_custkey", 21, 0.10),
    "c_mktsegment", "c_custkey", 22, 0.10).cache()

  private def imputer = new RbmImputer()
    .setNumericCols(Seq("c_acctbal"))
    .setCategoricalCols(Seq("c_mktsegment"))
    .setKeyCol("c_custkey").setMaxEpochs(5)

  test("save/load round-trip: loaded model transforms identically") {
    val model = imputer.fit(withMissing)
    val dir = java.nio.file.Files.createTempDirectory("rbm_model").toString
    model.save(s"$dir/m")
    val loaded = RbmImputerModel.load(spark, s"$dir/m")
    val a = model.transform(withMissing).orderBy("c_custkey").collect()
    val b = loaded.transform(withMissing).orderBy("c_custkey").collect()
    assert(a.toSeq === b.toSeq)
    assert(loaded.layout === model.layout)
    assert(loaded.weights.w === model.weights.w)
  }

  test("model and estimator survive MLlib Pipeline persistence") {
    import org.apache.spark.ml.{Pipeline, PipelineModel}
    val dir = java.nio.file.Files.createTempDirectory("rbm_pipe").toString

    // unfitted pipeline: estimator is DefaultParamsWritable
    val pipe = new Pipeline().setStages(Array(imputer))
    pipe.write.overwrite().save(s"$dir/pipe")
    val loadedPipe = Pipeline.load(s"$dir/pipe")
    val stage = loadedPipe.getStages(0).asInstanceOf[RbmImputer]
    assert(stage.getOrDefault(stage.numericCols).toSeq === Seq("c_acctbal"))

    // fitted pipeline: model round-trips through PipelineModel.load,
    // which resolves RbmImputerModel reflectively from our metadata
    val pm = pipe.fit(withMissing)
    pm.write.overwrite().save(s"$dir/pm")
    val loadedPm = PipelineModel.load(s"$dir/pm")
    val a = pm.transform(withMissing).orderBy("c_custkey").collect()
    val b = loadedPm.transform(withMissing).orderBy("c_custkey").collect()
    assert(a.toSeq === b.toSeq)
  }
}
