package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EmbeddingDriftSpec extends SparkSpec {

  import spark.implicits._

  private def toF(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("planted per-dim shift recovered exactly; identical snapshots " +
    "read cosine 1.0 / shift 0") {
    val a = Seq(toF(1, 2), toF(3, 2), toF(5, 2)).toDF("v") // means (3, 2)
    val b = a.select(transform(col("v"),
      x => x.cast("double") + lit(0.5)).as("v"))           // means (3.5, 2.5)
    val pd = EmbeddingDrift.perDim(a, b, "v").collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(pd(0L).getDouble(2) === 3.0 && pd(0L).getDouble(5) === 3.5)
    assert(pd(0L).getDouble(7) === 0.5 && pd(1L).getDouble(7) === 0.5)
    // population variance of (1,3,5) = 8/3 → 2.666667 on the 6-dp grid
    assert(pd(0L).getDouble(3) === math.floor(8.0 / 3.0 * 1e6 + 0.5) / 1e6)
    assert(pd(1L).getDouble(3) === 0.0) // constant dim
    val sum = EmbeddingDrift.summary(
      EmbeddingDrift.perDim(a, b, "v")).collect().head
    assert(sum.getLong(0) === 2L)
    // shift L2 = sqrt(0.5^2 + 0.5^2) = sqrt(0.5) ≈ 0.707107
    assert(math.abs(sum.getDouble(2) - math.sqrt(0.5)) < 1e-5)
    val same = EmbeddingDrift.summary(
      EmbeddingDrift.perDim(a, a, "v")).collect().head
    assert(same.getDouble(1) === 1.0 && same.getDouble(2) === 0.0)
  }

  test("a rotated mean direction lowers the cosine below 1") {
    val a = Seq(toF(1, 0), toF(1, 0)).toDF("v")  // mean (1, 0)
    val b = Seq(toF(0, 1), toF(0, 1)).toDF("v")  // mean (0, 1) — orthogonal
    val s = EmbeddingDrift.summary(
      EmbeddingDrift.perDim(a, b, "v")).collect().head
    assert(s.getDouble(1) === 0.0, "orthogonal means → cosine 0")
  }
}
