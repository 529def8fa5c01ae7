package graft.impute

import graft.{SparkSpec, Tables}
import graft.functions.Noise
import graft.ml.RbmCore
import org.apache.spark.sql.functions._

class SegmentedImputeSpec extends SparkSpec {

  private lazy val customer = Tables.customer(spark, sf0001).cache()

  test("per-segment mean: imputed value equals that segment's known mean") {
    val out = SegmentedImpute.meanBySegment(customer, "c_acctbal",
      "c_mktsegment", "c_custkey", salt = 31).cache()
    assert(out.filter(col("c_acctbal").isNull).count() === 0)
    // recompute expected per-segment means independently
    val mask = Noise.missingMask(col("c_custkey"), 31, 0.10)
    val means = customer.filter(!mask)
      .groupBy("c_mktsegment").agg(avg("c_acctbal").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val imputedRows = out.join(customer.filter(mask).select("c_custkey"), "c_custkey")
      .select("c_mktsegment", "c_acctbal").collect()
    imputedRows.foreach { r =>
      assert(math.abs(r.getDouble(1) - means(r.getString(0))) < 1e-6,
        s"segment ${r.getString(0)}: ${r.getDouble(1)} vs ${means(r.getString(0))}")
    }
  }

  test("per-segment rbm: executor-side fit fills all gaps within range") {
    val withMissing = Noise.injectMissing(customer, "c_acctbal", "c_custkey",
      salt = 31, frac = 0.10)
    val out = SegmentedImpute.rbmBySegment(withMissing, "c_acctbal",
      "c_mktsegment", "c_custkey", RbmCore.Config(nHidden = 4, maxEpochs = 5)).cache()
    assert(out.count() === customer.count())
    assert(out.filter(col("c_acctbal").isNull).count() === 0)
    val Array(mn, mx) = customer.agg(min("c_acctbal"), max("c_acctbal"))
      .collect()(0).toSeq.map(_.asInstanceOf[Double]).toArray
    assert(out.filter(col("c_acctbal") < mn || col("c_acctbal") > mx).count() === 0)
    // known cells unchanged
    val joined = out.as("i").join(withMissing.as("m"), "c_custkey")
    assert(joined.filter(col("m.c_acctbal").isNotNull &&
      col("i.c_acctbal") =!= col("m.c_acctbal")).count() === 0)
  }

  test("clean() facade imputes both declared columns") {
    val withMissing = Noise.injectMissing(
      Noise.injectMissing(customer, "c_acctbal", "c_custkey", 21, 0.10),
      "c_mktsegment", "c_custkey", 22, 0.10)
    val out = graft.Clean.clean(withMissing, Seq("c_acctbal"),
      Seq("c_mktsegment"), keyCol = "c_custkey", maxEpochs = 5)
    assert(out.filter(col("c_acctbal").isNull || col("c_mktsegment").isNull)
      .count() === 0)
    assert(out.schema.fieldNames.toSeq === customer.schema.fieldNames.toSeq)
  }
}
