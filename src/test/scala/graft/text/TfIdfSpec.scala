package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.ml.linalg.{SparseVector => MlSparseVector, Vector => MlVector}
import org.apache.spark.sql.functions._

class TfIdfSpec extends SparkSpec {

  test("tf-idf: shape, sparsity, and rare>common weighting") {
    val docs = Tables.documents(spark, sf0001)
    val (out, idfModel) = TfIdf.transform(docs, "text", numFeatures = 1 << 12)
    assert(out.count() === docs.count())
    val row = out.select("tfidf").head().getAs[MlVector](0)
    assert(row.size === (1 << 12))
    assert(row.isInstanceOf[MlSparseVector])
    // a token present in every doc gets (near-)minimal idf
    val idf = idfModel.idf.toArray
    val nonZero = idf.filter(_ > 0)
    assert(nonZero.nonEmpty)
    assert(idf.min >= 0.0 && nonZero.max > nonZero.min,
      "idf should spread between common and rare terms")
  }

  test("exact tf-idf: counts match hand computation, rare>common per doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "banana banana date")).toDF("doc_id", "text")
    val out = TfIdf.exact(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    // tf: raw in-doc count; df: docs containing the term; N = 3
    assert(out((1L, "apple")) ===
      ((2L, 1L, math.round(2 * math.log(4.0 / 2.0) * 1e6) / 1e6)))
    assert(out((2L, "cherry"))._2 === 1L)
    assert(out((3L, "banana"))._1 === 2L)
    // banana is in every doc → idf ln(4/4)=0 → tfidf 0 everywhere
    assert(out((1L, "banana"))._3 === 0.0)
    // within doc 1, the rarer term outweighs the universal one
    assert(out((1L, "apple"))._3 > out((1L, "banana"))._3)
    // one row per (doc, distinct term)
    assert(out.size === 6)
  }
}
