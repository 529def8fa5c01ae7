package graft.ml

import graft.{SparkSpec, Tables}
import graft.functions.Noise
import org.apache.spark.sql.functions._

/** Reference-contract invariants (SURVEY §5.1 i–v) for the full
  * Estimator/Model imputation pipeline on real test data. */
class RbmImputerSpec extends SparkSpec {

  private lazy val withMissing = {
    val base = Tables.customer(spark, sf0001)
    Noise.injectMissing(
      Noise.injectMissing(base, "c_acctbal", "c_custkey", salt = 21, frac = 0.10),
      "c_mktsegment", "c_custkey", salt = 22, frac = 0.10).cache()
  }

  private lazy val imputed = {
    val imputer = new RbmImputer()
      .setNumericCols(Seq("c_acctbal"))
      .setCategoricalCols(Seq("c_mktsegment"))
      .setKeyCol("c_custkey")
      .setNHidden(8).setMaxEpochs(10).setBatchSize(32)
    imputer.fit(withMissing).transform(withMissing).cache()
  }

  test("no nulls remain in the imputed columns") {
    assert(imputed.filter(col("c_acctbal").isNull || isnan(col("c_acctbal")) ||
      col("c_mktsegment").isNull).count() === 0)
  }

  test("originally-known cells are unchanged") {
    val joined = imputed.as("i")
      .join(withMissing.as("m"), "c_custkey")
    val numBad = joined.filter(col("m.c_acctbal").isNotNull &&
      col("i.c_acctbal") =!= col("m.c_acctbal")).count()
    val catBad = joined.filter(col("m.c_mktsegment").isNotNull &&
      col("i.c_mktsegment") =!= col("m.c_mktsegment")).count()
    assert(numBad === 0 && catBad === 0)
  }

  test("imputed categoricals come from the original category set") {
    val cats = Tables.customer(spark, sf0001)
      .select("c_mktsegment").distinct().collect().map(_.getString(0)).toSet
    val produced = imputed.select("c_mktsegment").distinct()
      .collect().map(_.getString(0)).toSet
    assert(produced.subsetOf(cats), s"unexpected categories ${produced -- cats}")
  }

  test("imputed numerics land inside the observed [min,max]") {
    val row = withMissing.agg(min("c_acctbal"), max("c_acctbal")).collect()(0)
    val (mn, mx) = (row.getDouble(0), row.getDouble(1))
    assert(imputed.filter(col("c_acctbal") < mn || col("c_acctbal") > mx).count() === 0)
  }

  test("schema and row count preserved") {
    assert(imputed.schema.fieldNames.toSeq ===
      withMissing.schema.fieldNames.toSeq)
    assert(imputed.count() === withMissing.count())
  }
}
