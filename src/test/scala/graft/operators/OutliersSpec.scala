package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OutliersSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed d2 on an axis-aligned cloud with one planted outlier") {
    // 8 corner-ish points with unit-ish spread plus one far point: for a
    // diagonal covariance, d2 = sum((x-mu)^2/var_i) — computable by hand.
    val base = Seq(
      (1L, 1, -1.0, -1.0, -1.0), (2L, 1, -1.0, -1.0, 1.0),
      (3L, 1, -1.0, 1.0, -1.0), (4L, 1, -1.0, 1.0, 1.0),
      (5L, 1, 1.0, -1.0, -1.0), (6L, 1, 1.0, -1.0, 1.0),
      (7L, 1, 1.0, 1.0, -1.0), (8L, 1, 1.0, 1.0, 1.0),
      (9L, 1, 9.0, 0.0, 0.0))
    val df = base.toDF("id", "ln", "x1", "x2", "x3")
      .select($"id", $"ln",
        $"x1".cast("decimal(12,2)").as("x1"),
        $"x2".cast("decimal(12,2)").as("x2"),
        $"x3".cast("decimal(12,2)").as("x3"))
    val r = Outliers.mahalanobis3(df, Seq("x1", "x2", "x3"),
      Seq("id", "ln"), k = 9)
      .collect().map(x => x.getLong(0) ->
        (x.getDouble(2), x.getLong(3), x.getLong(4))).toMap
    // moments: n=9, mean=(1,0,0), var1=(89−81/9)/8=10, var2=var3=1,
    // covariances 0 (cross sums vanish by symmetry)
    // → d2(9) = (9−1)²/10 = 6.4
    assert(math.abs(r(9L)._1 - 6.4) < 1e-5, r(9L).toString)
    assert(r(9L)._3 === 1L, "planted outlier must rank first")
    assert(r(9L)._2 === 0L, "6.4 is under the chi2 crit")
    // x1=−1 corners: d2 = 4/10 + 1 + 1 = 2.4
    assert(math.abs(r(1L)._1 - 2.4) < 1e-5, r(1L).toString)
  }

  test("flag fires above the threshold and ranks deterministically") {
    val rows = (1 to 200).map(i => (i.toLong, 1,
      BigDecimal((i % 10).toDouble), BigDecimal(((i * 3) % 10).toDouble),
      BigDecimal(((i * 7) % 10).toDouble))) :+
      (999L, 1, BigDecimal(1000.0), BigDecimal(-1000.0), BigDecimal(1000.0))
    val df = rows.toDF("id", "ln", "x1", "x2", "x3")
    val top = Outliers.mahalanobis3(df, Seq("x1", "x2", "x3"),
      Seq("id", "ln"), k = 5, chi2Crit = 16.266236).collect()
    assert(top.head.getLong(0) === 999L)
    assert(top.head.getLong(3) === 1L, "extreme point must be flagged")
    assert(top.map(_.getLong(4)).toSeq === Seq(1L, 2L, 3L, 4L, 5L))
  }

  test("top-k output on lineitem is bounded and sane at sf0.001") {
    val li = graft.Tables.lineitem(spark, sf0001).select(
      col("l_orderkey"), col("l_linenumber"),
      col("l_quantity").cast("decimal(12,2)").as("x1"),
      col("l_extendedprice").cast("decimal(12,2)").as("x2"),
      col("l_discount").cast("decimal(12,2)").as("x3"))
    val r = Outliers.mahalanobis3(li, Seq("x1", "x2", "x3"),
      Seq("l_orderkey", "l_linenumber"), k = 50).collect()
    assert(r.length === 50)
    val d2s = r.map(_.getDouble(2))
    assert(d2s.zip(d2s.tail).forall { case (a, b) => a >= b }, "sorted desc")
    assert(d2s.forall(v => v > 0 && !v.isNaN && !v.isInfinite))
  }
}
