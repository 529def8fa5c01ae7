package graft.ml

import graft.SparkSpec

class ClusterQualitySpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed silhouette on two tight, well-separated clusters") {
    // centroids land at (0.99, 0) and (0, 0.99) after the fit; every
    // point sits 0.01 from its own centroid and ~1.4 from the other.
    val df = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.98f, 0.0f)), (4L, Array(0.0f, 0.98f)))
      .toDF("vec_id", "embedding")
    val model = KMeansLloyd.fit(df, "vec_id", "embedding", k = 2, iters = 3)
    val r = ClusterQuality.silhouette(df, "vec_id", "embedding", model)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3))).toMap
    // a = 0.01 everywhere; b ∈ {√1.9801, √1.9405} ≈ 1.40716/1.39302 →
    // s = (b − a)/b ∈ [0.99282, 0.99290] for every point
    assert(r.keySet === Set(0L, 1L, -1L))
    Seq(0L, 1L, -1L).foreach { c =>
      assert(r(c)._2 > 0.9928 && r(c)._2 < 0.9930, s"$c: ${r(c)}")
      assert(r(c)._3 > 0.9928 && r(c)._3 < 0.9930, s"$c: ${r(c)}")
      assert(r(c)._3 <= r(c)._2 + 1e-9, "min <= mean")
    }
    assert(r(-1L)._1 === 4L)
    assert(r(0L)._1 === 2L && r(1L)._1 === 2L)
  }

  test("boundary points score near zero; good clusters score high") {
    val tight = (1 to 20).map(i =>
      (i.toLong, Array((if (i % 2 == 0) 1.0f else -1.0f), 0.0f)))
    val df = tight.toDF("vec_id", "embedding")
    val model = KMeansLloyd.fit(df, "vec_id", "embedding", k = 2, iters = 3)
    val all = ClusterQuality.silhouette(df, "vec_id", "embedding", model)
      .filter($"cluster" === -1L).head
    assert(all.getDouble(2) > 0.99, s"identical points per side: $all")
  }

  test("embeddings clusters are coherent (global mean > 0)") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val model = KMeansLloyd.fit(emb, "vec_id", "embedding", k = 8,
      iters = 5)
    val rows = ClusterQuality.silhouette(emb, "vec_id", "embedding", model)
      .collect()
    assert(rows.length >= 3)
    val all = rows.find(_.getLong(0) == -1L).get
    assert(all.getLong(1) === emb.count())
    assert(all.getDouble(2) > 0, s"k-means must beat random: $all")
    rows.foreach(x => assert(x.getDouble(3) >= -1 && x.getDouble(2) <= 1))
  }
}
