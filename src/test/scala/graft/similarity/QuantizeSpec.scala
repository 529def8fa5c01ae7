package graft.similarity

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class QuantizeSpec extends SparkSpec {

  test("codes stay in int8 range and error is bounded by scale/2 per element") {
    val q = Quantize.scalarQuantize(Tables.embeddings(spark, sf0001), "embedding")
    val v = col("embedding").cast("array<double>")
    val recon = Quantize.dequantize(col("q"), col("q_scale"))
    val checked = q.select(
      array_max(transform(col("q"), x => abs(x))).as("max_code"),
      array_max(zip_with(v, recon, (x, r) => abs(x - r))).as("max_err"),
      (col("q_scale") * 0.5 + lit(1e-12)).as("bound"))
    assert(checked.filter(col("max_code") > 127).count() === 0)
    assert(checked.filter(col("max_err") > col("bound")).count() === 0)
  }

  test("zero vectors quantize to zeros with scale 0") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.0, 0.0, 0.0)), (2L, Seq(1.0, -2.0, 0.5)))
      .toDF("vec_id", "embedding")
    val out = Quantize.scalarQuantize(df, "embedding")
      .orderBy("vec_id").collect()
    assert(out(0).getDouble(out(0).fieldIndex("q_scale")) === 0.0)
    assert(out(0).getSeq[Long](out(0).fieldIndex("q")) === Seq(0L, 0L, 0L))
    // max|x| maps to ±127 exactly
    assert(out(1).getSeq[Long](out(1).fieldIndex("q")).min === -127L)
  }

  test("dequantize(quantize(v)) preserves cosine ranking on a sample") {
    val emb = Tables.embeddings(spark, sf0001)
      .filter(col("vec_id") < 50)
    val q = Quantize.scalarQuantize(emb, "embedding")
      .withColumn("recon", Quantize.dequantize(col("q"), col("q_scale")))
    // top-1 neighbor of each vector computed on raw vs reconstructed
    def top1(vecCol: String): org.apache.spark.sql.DataFrame = {
      val l = q.select(col("vec_id").as("a"), col(vecCol).cast("array<double>").as("va"))
      val r = q.select(col("vec_id").as("b"), col(vecCol).cast("array<double>").as("vb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("a")).orderBy(col("score").desc, col("b").asc)
      l.join(r, col("a") =!= col("b"))
        .withColumn("score", Cosine.cosine(col("va"), col("vb")))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") === 1).select("a", "b")
    }
    val agreement = top1("embedding").as("x")
      .join(top1("recon").as("y"), Seq("a", "b"), "inner").count()
    assert(agreement >= 45, s"int8 top-1 agreement too low: $agreement/50")
  }
}
