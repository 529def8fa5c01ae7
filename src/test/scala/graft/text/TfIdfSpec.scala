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
}
