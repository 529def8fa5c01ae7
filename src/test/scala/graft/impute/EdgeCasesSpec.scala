package graft.impute

import graft.{SparkSpec, Tables}
import graft.ml.RbmImputer
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: constant columns, empty frames, and
  * fully-null columns must not crash and must keep the invariants. */
class EdgeCasesSpec extends SparkSpec {

  private def imputer = new RbmImputer()
    .setNumericCols(Seq("c_acctbal")).setKeyCol("c_custkey").setMaxEpochs(3)

  test("constant numeric column: imputed cells get the constant back") {
    val df = Tables.customer(spark, sf0001)
      .withColumn("c_acctbal",
        when(pmod(col("c_custkey"), lit(10)) === 0, lit(null))
          .otherwise(lit(42.5)))
    val out = imputer.fit(df).transform(df)
    assert(out.filter(col("c_acctbal").isNull).count() === 0)
    assert(out.filter(col("c_acctbal") =!= 42.5).count() === 0)
  }

  test("empty input: fit and transform survive, return empty") {
    val df = Tables.customer(spark, sf0001).filter(lit(false))
    val out = imputer.fit(df).transform(df)
    assert(out.count() === 0)
    assert(out.schema.fieldNames.toSeq ===
      Tables.customer(spark, sf0001).schema.fieldNames.toSeq)
  }

  test("fully-null numeric column: output is defined (no nulls, finite)") {
    val df = Tables.customer(spark, sf0001)
      .withColumn("c_acctbal", lit(null).cast("double"))
    val out = imputer.fit(df).transform(df)
    assert(out.filter(col("c_acctbal").isNull || isnan(col("c_acctbal")))
      .count() === 0)
  }
}
