package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HardNegativesSpec extends SparkSpec {

  import spark.implicits._

  // Two labels on a plane: label 0 near the x-axis, label 1 near the
  // y-axis, except id 5 — label 1 but almost on the x-axis: the hard
  // negative every label-0 anchor must surface first.
  private def fixture = Seq(
    (1L, Array(1.0f, 0.0f), 0),
    (2L, Array(0.95f, 0.05f), 0),
    (3L, Array(0.0f, 1.0f), 1),
    (4L, Array(0.1f, 0.9f), 1),
    (5L, Array(0.9f, 0.1f), 1))
    .toDF("vec_id", "embedding", "label")

  test("the cross-label near-duplicate is mined first") {
    val r = HardNegatives.mine(fixture, "vec_id", "embedding", "label",
      col("vec_id") === 1L, k = 3).collect()
    assert(r.length === 3)
    assert(r.map(_.getLong(5)).toSeq === Seq(1L, 2L, 3L))
    // rank 1 must be id 5 (cos ≈ 0.994), not the easy negatives 3, 4
    assert(r.head.getLong(1) === 5L, r.mkString(";"))
    assert(r.head.getInt(3) === 1)
    val scores = r.map(_.getDouble(4))
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
  }

  test("same-label rows are never negatives; anchors can self-appear never") {
    val r = HardNegatives.mine(fixture, "vec_id", "embedding", "label",
      col("label") === 0, k = 5).collect()
    assert(r.forall(x => x.getInt(2) != x.getInt(3)))
    assert(r.forall(x => x.getLong(0) != x.getLong(1)))
    // both anchors mined, each sees all 3 label-1 rows
    assert(r.groupBy(_.getLong(0)).view.mapValues(_.length).toMap ===
      Map(1L -> 3, 2L -> 3))
  }

  test("anchor bound is enforced") {
    val e = intercept[IllegalArgumentException] {
      HardNegatives.mine(fixture, "vec_id", "embedding", "label",
        lit(true), k = 1, maxAnchors = 2)
    }
    assert(e.getMessage.contains("maxAnchors"))
  }

  test("embeddings table: ranks dense, scores in [-1, 1]") {
    val r = HardNegatives.mine(graft.Tables.embeddings(spark, sf0001),
      "vec_id", "embedding", "label",
      pmod(col("vec_id"), lit(50)) === 0, k = 5).collect()
    assert(r.nonEmpty)
    assert(r.forall(x => x.getDouble(4) >= -1.0 && x.getDouble(4) <= 1.0))
    r.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(5)).sorted.toSeq ===
        (1L to rows.length.toLong))
    }
  }
}
