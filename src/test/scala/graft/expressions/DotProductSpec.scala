package graft.expressions

import graft.{SparkSpec, Tables}
import graft.similarity.Cosine
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkSpec {

  test("native dot matches the built-in composition bit-for-bit") {
    val emb = Tables.embeddings(spark, sf0001)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val reference =
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
    val bad = emb.select(
        Cosine.dot(col("v"), col("v")).as("native"), reference.as("ref"))
      .filter(col("native") =!= col("ref"))
    assert(bad.count() === 0)
  }

  test("graft_dot is SQL-callable via GraftExtensions") {
    import spark.implicits._
    val r = Seq((Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0))).toDF("a", "b")
      .selectExpr("graft_dot(a, b) AS d").head().getDouble(0)
    assert(r === 32.0)
  }

  test("null semantics match the zip_with composition: any null or length mismatch → null") {
    import spark.implicits._
    val df = Seq(
      (Some(Seq(Some(1.0), None, Some(3.0))), Some(Seq(Some(2.0), Some(2.0), Some(2.0)))),
      (None, Some(Seq(Some(1.0)))),
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(1.0)))), // length mismatch
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0), Some(4.0))))).toDF("a", "b")
    val out = df.select(Cosine.dot(col("a"), col("b")).as("d")).collect()
    assert(out(0).isNullAt(0), "null element must poison the dot product")
    assert(out(1).isNullAt(0), "null array")
    assert(out(2).isNullAt(0), "length mismatch")
    assert(out(3).getDouble(0) === 11.0)
  }

  test("nullable even with non-nullable children: literal-array length mismatch and null element → NULL") {
    // literal arrays are non-nullable children; without `nullable = true`
    // codegen drops the isNull slot and the mismatch surfaces as 0.0
    val mismatch = spark.range(1)
      .select(Cosine.dot(array(lit(1.0), lit(2.0)), array(lit(3.0))).as("d"))
      .collect()(0)
    assert(mismatch.isNullAt(0), "length mismatch over literals must be NULL")
    val nullElem = spark.range(1)
      .select(Cosine.dot(
        array(lit(1.0), lit(null).cast("double")),
        array(lit(3.0), lit(4.0))).as("d"))
      .collect()(0)
    assert(nullElem.isNullAt(0), "null element over literals must be NULL")
  }

  test("interpreted eval agrees with codegen") {
    import spark.implicits._
    val df = Seq((Seq(0.5, -1.5, 2.0), Seq(1.0, 2.0, -0.25))).toDF("a", "b")
    val viaCodegen = df.select(Cosine.dot(col("a"), col("b"))).head().getDouble(0)
    val e = DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(0.5, -1.5, 2.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1.0, 2.0, -0.25),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null).asInstanceOf[Double] === viaCodegen)
  }
}
