package graft.impute

import graft.{SparkSpec, Tables}
import graft.functions.Noise
import org.apache.spark.sql.functions._

/** Reference-contract invariants (SURVEY §5.1 i–iv) for the M1 slice. */
class MeanImputeSpec extends SparkSpec {

  private lazy val customer = Tables.customer(spark, sf0001).cache()
  private lazy val imputed =
    MeanImpute.imputeNumeric(customer, "c_acctbal", "c_custkey", salt = 1).cache()

  test("no missing values remain in the imputed column") {
    assert(imputed.filter(col("c_acctbal").isNull || isnan(col("c_acctbal"))).count() === 0)
  }

  test("originally-known cells are unchanged") {
    val mask = Noise.missingMask(col("c_custkey"), 1, 0.10)
    val known = customer.filter(!mask).select("c_custkey", "c_acctbal")
    val after = imputed.as("i").join(known.as("k"), "c_custkey")
      .filter(col("i.c_acctbal") =!= col("k.c_acctbal"))
    assert(after.count() === 0)
  }

  test("imputed cells land inside the observed [min, max] range") {
    val mask = Noise.missingMask(col("c_custkey"), 1, 0.10)
    val Array(mn, mx) = customer.filter(!mask)
      .agg(min("c_acctbal"), max("c_acctbal")).collect()(0)
      .toSeq.map(_.asInstanceOf[Double]).toArray
    val bad = imputed.filter(mask)
      .filter(col("c_acctbal") < mn || col("c_acctbal") > mx)
    assert(bad.count() === 0)
  }

  test("schema, column order and row count are preserved") {
    assert(imputed.schema.fieldNames.toSeq === customer.schema.fieldNames.toSeq)
    assert(imputed.count() === customer.count())
  }

  test("the missingness mask hits roughly the requested fraction") {
    val n = customer.count().toDouble
    val hit = customer.filter(Noise.missingMask(col("c_custkey"), 1, 0.10)).count()
    assert(hit / n > 0.04 && hit / n < 0.20, s"fraction ${hit / n}")
  }
}
