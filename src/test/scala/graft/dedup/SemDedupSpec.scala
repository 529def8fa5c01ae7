package graft.dedup

import graft.SparkSpec

class SemDedupSpec extends SparkSpec {

  import spark.implicits._

  // Two well-separated direction clusters; ids 1 and 2 seed k-means
  // (first-k init) so the fit lands one centroid in each.
  //   A: 1=(1,0,0,0)  3=(.98,.02,0,0)  5=(.9,.1,0,0)
  //   B: 2=(0,1,0,0)  4=(0,.97,.03,0)
  // cos(1,3) ≈ 0.99980, cos(2,4) ≈ 0.99952, every other pair < 0.999.
  private def fixture = Seq(
    (1L, Array(1.0f, 0f, 0f, 0f)),
    (2L, Array(0f, 1.0f, 0f, 0f)),
    (3L, Array(0.98f, 0.02f, 0f, 0f)),
    (4L, Array(0f, 0.97f, 0.03f, 0f)),
    (5L, Array(0.9f, 0.1f, 0f, 0f)))
    .toDF("vec_id", "embedding")

  test("pairs: only the planted within-cluster duplicates survive tau") {
    val p = SemDedup.pairs(fixture, "vec_id", "embedding",
      k = 2, tau = 0.999)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(p === Set((1L, 3L), (2L, 4L)), p.toString)
  }

  test("dedup keeps the farthest-from-centroid member, ties to min id") {
    val kept = SemDedup.dedup(fixture, "vec_id", "embedding",
      k = 2, tau = 0.999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // cluster A centroid ≈ (.96,.04): d²(1)=.0032 > d²(3)=.0008 → keep 1.
    // cluster B centroid = (0,.985,.015): d²(2) = d²(4) → tie → keep 2.
    assert(kept === Set(1L, 2L, 5L), kept.toString)
  }

  test("no two kept rows are near-duplicates within a cluster") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val kept = SemDedup.dedup(emb, "vec_id", "embedding", k = 8,
      tau = 0.45).select($"vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty && kept.size <= emb.count())
    val p = SemDedup.pairs(emb, "vec_id", "embedding", k = 8, tau = 0.45)
      .collect().map(x => (x.getLong(0), x.getLong(1)))
    val bothKept = p.filter { case (a, b) => kept(a) && kept(b) }
    assert(bothKept.isEmpty, s"kept near-dup pairs: ${bothKept.take(5)}")
    // and dedup actually removed something on this data
    assert(kept.size < emb.count(), "fixture data contains near-dups")
  }
}
