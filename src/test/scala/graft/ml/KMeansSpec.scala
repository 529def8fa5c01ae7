package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {

  import spark.implicits._

  /** Driver-side reference Lloyd: same arithmetic, same order — the
    * distributed fit must reproduce it BIT-exactly (integer-grid sums
    * are order-insensitive; per-row distance folds run left-to-right
    * like the zip_with/aggregate expression). */
  private def refFit(vecs: Seq[(Long, Array[Long])], k: Int, iters: Int)
      : (Map[Long, Long], Array[Array[Double]]) = {
    var cents: Array[Array[Double]] =
      vecs.sortBy(_._1).take(k).map(_._2.map(_.toDouble)).toArray
    var assign = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      def d2(q: Array[Long], c: Array[Double]): Double = {
        var acc = 0.0; var i = 0
        while (i < q.length) {
          val t = (q(i).toDouble - c(i)) * (q(i).toDouble - c(i))
          acc += t; i += 1
        }
        acc
      }
      assign = vecs.map { case (id, q) =>
        id -> cents.indices.minBy(i => (d2(q, cents(i)), i)).toLong
      }.toMap
      val next = cents.map(_.clone())
      cents.indices.foreach { c =>
        val members = vecs.filter(v => assign(v._1) == c)
        if (members.nonEmpty) {
          next(c).indices.foreach { d =>
            next(c)(d) = members.map(_._2(d)).sum.toDouble / members.size
          }
        }
      }
      cents = next
    }
    (assign, cents)
  }

  private def quantized(sf: String): Seq[(Long, Array[Long])] =
    graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), KMeansLloyd.quantize(col("embedding")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toSeq

  test("distributed fit ≡ driver reference, bit-exact (sf0.001)") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val model = KMeansLloyd.fit(emb, "vec_id", "embedding", k = 4, iters = 3)
    val got = KMeansLloyd.transform(emb, "vec_id", "embedding", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (refAssign, refCents) = refFit(quantized(sf0001), 4, 3)
    // reference's final assignment is from iteration `iters`; transform
    // re-assigns against the FINAL centroids — recompute the reference
    // the same way
    val finalRef = quantized(sf0001).map { case (id, q) =>
      def d2(c: Array[Double]): Double = {
        var acc = 0.0; var i = 0
        while (i < q.length) {
          val t = (q(i).toDouble - c(i)) * (q(i).toDouble - c(i))
          acc += t; i += 1
        }
        acc
      }
      id -> refCents.indices.minBy(i => (d2(refCents(i)), i)).toLong
    }.toMap
    assert(model.centroids.length === 4)
    model.centroids.zip(refCents).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq) // bit equality, element-wise
    }
    assert(got === finalRef)
    assert(refAssign.values.toSet.size > 1, "degenerate single cluster")
  }

  test("assignments are layout-invariant (repartitioned corpus)") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val m1 = KMeansLloyd.fit(emb, "vec_id", "embedding", k = 4, iters = 3)
    val m2 = KMeansLloyd.fit(emb.repartition(7), "vec_id", "embedding",
      k = 4, iters = 3)
    m1.centroids.zip(m2.centroids).foreach { case (a, b) =>
      assert(a.toSeq === b.toSeq)
    }
  }

  test("inertia is non-increasing across iterations") {
    val emb = graft.Tables.embeddings(spark, sf001)
    val model = KMeansLloyd.fit(emb, "vec_id", "embedding", k = 8, iters = 5)
    val in = model.inertia
    assert(in.length === 5)
    assert(in.sliding(2).forall(w => w(1) <= w(0) * (1 + 1e-12)),
      s"inertia increased: $in")
    assert(in.last < in.head, "no improvement at all over 5 iterations")
  }

  test("tie-break to lower cluster id; empty cluster keeps its centroid") {
    val df = Seq(
      (0L, Array(5.0f)), (1L, Array(5.0f)), (2L, Array(9.0f)))
      .toDF("id", "v")
    val model = KMeansLloyd.fit(df, "id", "v", k = 3, iters = 2)
    val assign = KMeansLloyd.transform(df, "id", "v", model)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ids 0 and 1 are identical → both tie between centroids 0 and 1,
    // resolve to 0; cluster 1 goes empty and must keep centroid 5.0
    assert(assign === Map(0L -> 0L, 1L -> 0L, 2L -> 2L))
    assert(model.centroids(1).head === 5000000.0)
  }

  test("assignExact: d2 is exact integer arithmetic and min over centroids") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val init = KMeansLloyd.initialCentroids(emb, "vec_id", "embedding", 4)
    assert(init.length === 4 && init.head.length === 64)
    val rows = KMeansLloyd.assignExact(emb, "vec_id", "embedding", init)
      .collect()
    // the centroid vectors themselves must assign to themselves at d2=0
    val ids = emb.select("vec_id").orderBy("vec_id").limit(4)
      .collect().map(_.getLong(0))
    ids.zipWithIndex.foreach { case (id, i) =>
      val r = rows.find(_.getLong(0) == id).get
      assert(r.getLong(1) === i.toLong && r.getLong(2) === 0L)
    }
    assert(rows.forall(_.getLong(2) >= 0L))
  }
}
