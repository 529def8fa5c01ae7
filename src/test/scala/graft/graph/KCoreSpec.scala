package graft.graph

import graft.SparkSpec

class KCoreSpec extends SparkSpec {

  import spark.implicits._

  test("peel cascade: the tail chain unravels, the triangle survives") {
    // triangle 1-2-3 plus tail 3-4-5: dropping 5 (deg 1) exposes 4,
    // dropping 4 leaves the triangle as the whole 2-core
    val e = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
      .toDF("a", "b")
    val core = KCore.kCore(e, k = 2)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(core === Map(1L -> 2L, 2L -> 2L, 3L -> 2L), core.toString)
  }

  test("no k-core: the near-clique collapses completely at k = 3") {
    // 4-clique minus one edge: degrees 3,3,2,2 — peeling 3 and 4
    // leaves 1-2 at degree 1, which then falls too
    val e = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L))
      .toDF("a", "b")
    assert(KCore.kCore(e, k = 3).collect().isEmpty)
    // but the full 4-clique IS a 3-core
    val clique = e.union(Seq((3L, 4L)).toDF("a", "b"))
    assert(KCore.kCore(clique, k = 3).count() === 4)
  }

  test("k = 1 keeps every non-isolated node; monotone in k") {
    val e = Triangles.coOccurrenceEdges(
      graft.Tables.lineitem(spark, sf0001)
        .filter(org.apache.spark.sql.functions.col("l_quantity") >= 45),
      "l_orderkey", "l_partkey")
    val n1 = KCore.kCore(e, k = 1).count()
    val n2 = KCore.kCore(e, k = 2).count()
    val n3 = KCore.kCore(e, k = 3).count()
    val allNodes = e.select("a").union(e.select("b")).distinct().count()
    assert(n1 === allNodes)
    assert(n1 >= n2 && n2 >= n3, s"$n1 >= $n2 >= $n3")
  }

  test("hitting maxIter before the fixed point throws instead of " +
    "returning a truncated core") {
    import spark.implicits._
    // path 1-2-3-4 at k=2 needs two peel rounds to reach the (empty)
    // fixed point; maxIter=1 must fail loudly. Forced onto the
    // distributed rounds — the driver path always reaches the fixed
    // point, which is the other half of this contract.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("a", "b")
    val ex = intercept[IllegalStateException] {
      KCore.kCore(edges, k = 2, maxIter = 1, smallGraphMaxEdges = 0)
        .collect()
    }
    assert(ex.getMessage.contains("maxIter"))
  }

  test("small-graph driver peel ≡ distributed rounds") {
    val e = Triangles.coOccurrenceEdges(
      graft.Tables.lineitem(spark, sf0001)
        .filter(org.apache.spark.sql.functions.col("l_quantity") >= 40),
      "l_orderkey", "l_partkey")
    for (k <- Seq(1, 2, 3)) {
      val drv = KCore.kCore(e, k)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      val dist = KCore.kCore(e, k, smallGraphMaxEdges = 0)
        .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
      assert(drv === dist, s"k=$k driver/distributed cores differ")
    }
  }
}
