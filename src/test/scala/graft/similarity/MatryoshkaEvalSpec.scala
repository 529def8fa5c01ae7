package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MatryoshkaEvalSpec extends SparkSpec {

  import spark.implicits._

  test("a matryoshka-shaped fixture reads recall 1.0 at every prefix") {
    // information concentrated in dim 0: prefixes preserve the full
    // ranking exactly
    val vecs = (1 to 20).map(i =>
      (i.toLong, Array(i.toFloat, 0.001f * i, 0.0001f * i, 0f)))
      .toDF("vec_id", "embedding")
    val r = MatryoshkaEval.truncationRecall(vecs, "vec_id", "embedding",
      col("vec_id") <= 3, dims = Seq(1, 2), fullDim = 4, k = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(1L) === 1.0 && r(2L) === 1.0, r.toString)
  }

  test("information hidden in the tail dims breaks short prefixes") {
    // first dim identical everywhere; all signal lives in dims 2-4 →
    // dim-1 search is blind (every prefix cosine ties at 1.0, ranks
    // collapse to id order) while dim-4 matches truth by definition
    val vecs = (1 to 30).map { i =>
      (i.toLong, Array(1f, math.sin(i * 1.7).toFloat,
        math.cos(i * 2.3).toFloat, math.sin(i * 0.9).toFloat))
    }.toDF("vec_id", "embedding")
    val r = MatryoshkaEval.truncationRecall(vecs, "vec_id", "embedding",
      col("vec_id") <= 5, dims = Seq(1, 4), fullDim = 4, k = 5)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r(4L) === 1.0, "full dim IS the truth")
    assert(r(1L) < 0.8, s"blind prefix must lose recall: ${r(1L)}")
  }

  test("curve on the embeddings table is monotone-ish and bounded") {
    val r = MatryoshkaEval.truncationRecall(
      graft.Tables.embeddings(spark, sf0001), "vec_id", "embedding",
      col("vec_id") < 20, dims = Seq(8, 16, 32), fullDim = 64, k = 10)
      .collect().map(x => x.getLong(0) -> x.getDouble(2)).toMap
    assert(r.values.forall(v => v >= 0 && v <= 1))
    assert(r(32L) >= r(8L) - 0.05,
      s"longer prefixes shouldn't be much worse: $r")
  }
}
