package graft.similarity

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  import spark.implicits._

  private def toF(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray

  test("covarianceExact: hand-computed 2-d covariance") {
    // points (1,2), (3,6), (5,10): var(x) = 4, cov = 8, var(y) = 16
    val df = Seq(toF(1, 2), toF(3, 6), toF(5, 10)).toDF("v")
    val r = Pca.covarianceExact(df, "v").collect()
      .map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getLong(2), x.getDouble(3))).toMap
    assert(r((0L, 0L)) === ((3L, 4.0)), r.toString)
    assert(r((0L, 1L)) === ((3L, 8.0)), r.toString)
    assert(r((1L, 1L)) === ((3L, 16.0)), r.toString)
    assert(r.size === 3) // upper triangle only
  }

  test("jacobiEigen: hand 2x2 — eigenvalues {3, 1}, vectors (1,±1)/√2") {
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val pairs = vals.zipWithIndex.sortBy(-_._1)
    assert(math.abs(pairs(0)._1 - 3.0) < 1e-12)
    assert(math.abs(pairs(1)._1 - 1.0) < 1e-12)
    val top = Array(vecs(0)(pairs(0)._2), vecs(1)(pairs(0)._2))
    assert(math.abs(math.abs(top(0)) - 1.0 / math.sqrt(2)) < 1e-12)
    assert(math.abs(top(0) - top(1)) < 1e-12) // (1,1) direction
  }

  test("fit recovers a planted dominant axis; components orthonormal; " +
    "trace preserved") {
    // spread 10x along (1,1,0,0)/√2, 1x along (0,0,1,-1)/√2, plus a
    // mean; 210 = 2·lcm(21,5) completes both phase cycles, so the two
    // planted axes are EXACTLY decorrelated (CRT: each (t, u) pair
    // appears equally often and E[t] = 0)
    val rows = (1 to 210).map { i =>
      val t = (i % 21) - 10     // -10..10
      val u = (i % 5) - 2       // -2..2
      toF(5 + t * 1.0, 5 + t * 1.0, u * 0.5, -u * 0.5)
    }
    val df = rows.toDF("v")
    val m = Pca.fit(df, "v", k = 4)
    // dominant axis ≈ (1,1,0,0)/√2 (sign-pinned positive)
    val c0 = m.components(0)
    assert(math.abs(c0(0) - 1 / math.sqrt(2)) < 1e-6, c0.mkString(","))
    assert(math.abs(c0(1) - 1 / math.sqrt(2)) < 1e-6)
    assert(math.abs(c0(2)) < 1e-6 && math.abs(c0(3)) < 1e-6)
    // eigenvalues descending, sum ≈ trace
    assert(m.eigenvalues.zip(m.eigenvalues.tail)
      .forall { case (a, b) => a >= b - 1e-12 })
    assert(math.abs(m.eigenvalues.sum - m.totalVariance) < 1e-9)
    // orthonormal components
    for (a <- m.components; b <- m.components) {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val want = if (a eq b) 1.0 else 0.0
      assert(math.abs(dot - want) < 1e-9)
    }
    // fit's covariance path ≡ the exact-decimal covariance eigensolve
    val dim = 4
    val cov = Array.ofDim[Double](dim, dim)
    Pca.covarianceExact(df, "v").collect().foreach { r =>
      val (i, j) = (r.getLong(0).toInt, r.getLong(1).toInt)
      cov(i)(j) = r.getDouble(3); cov(j)(i) = r.getDouble(3)
    }
    val m2 = Pca.fromCovariance(m.mean, cov, 4)
    m.eigenvalues.zip(m2.eigenvalues).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-4, s"$a vs $b") }
  }

  test("project ≡ driver matmul; the mean projects to the zero vector") {
    val rows = (1 to 50).map(i =>
      (i.toLong, toF(i % 7, (i * 3) % 5, (i * 11) % 13, i % 2)))
    val df = rows.toDF("vec_id", "v")
    val m = Pca.fit(df, "v", k = 3)
    val got = Pca.project(df, "v", m, Seq("vec_id"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    rows.foreach { case (id, v) =>
      val want = m.components.map { w =>
        var s = 0.0
        var j = 0
        while (j < v.length) { s += w(j) * (v(j) - m.mean(j)); j += 1 }
        s
      }
      got(id).zip(want).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"id $id: $a vs $b") }
    }
    val meanRow = Seq((0L, m.mean.map(_.toFloat))).toDF("vec_id", "v")
    val z = Pca.project(meanRow, "v", m, Seq("vec_id"))
      .collect()(0).getSeq[Double](1)
    // mean-as-floats reintroduces float rounding — near-zero, not exact
    assert(z.forall(math.abs(_) < 1e-4), z.mkString(","))
  }

  test("PC1 score variance ≈ the top eigenvalue") {
    val rows = (1 to 300).map(i => toF((i % 21) - 10, ((i * 7) % 11) - 5))
    val df = rows.toDF("v")
    val m = Pca.fit(df, "v", k = 2)
    val scores = Pca.project(df, "v", m, Nil)
      .select(element_at(col("pc"), 1).as("s")).collect().map(_.getDouble(0))
    val n = scores.length
    val mu = scores.sum / n
    val v = scores.map(s => (s - mu) * (s - mu)).sum / (n - 1)
    assert(math.abs(v - m.eigenvalues(0)) / m.eigenvalues(0) < 1e-6,
      s"$v vs ${m.eigenvalues(0)}")
  }
}
