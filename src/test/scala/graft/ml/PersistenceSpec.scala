package graft.ml

import graft.{SparkSpec, Tables}
import graft.functions.Noise
import org.apache.spark.sql.functions._

class PersistenceSpec extends SparkSpec {

  test("save/load round-trip: loaded model transforms identically") {
    val withMissing = Noise.injectMissing(
      Noise.injectMissing(Tables.customer(spark, sf0001), "c_acctbal",
        "c_custkey", 21, 0.10),
      "c_mktsegment", "c_custkey", 22, 0.10).cache()
    val model = new RbmImputer()
      .setNumericCols(Seq("c_acctbal"))
      .setCategoricalCols(Seq("c_mktsegment"))
      .setKeyCol("c_custkey").setMaxEpochs(5)
      .fit(withMissing)
    val dir = java.nio.file.Files.createTempDirectory("rbm_model").toString
    model.save(s"$dir/m")
    val loaded = RbmImputerModel.load(spark, s"$dir/m")
    val a = model.transform(withMissing).orderBy("c_custkey").collect()
    val b = loaded.transform(withMissing).orderBy("c_custkey").collect()
    assert(a.toSeq === b.toSeq)
    assert(loaded.layout === model.layout)
    assert(loaded.weights.w === model.weights.w)
  }
}
