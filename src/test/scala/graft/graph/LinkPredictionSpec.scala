package graft.graph

import graft.SparkSpec

class LinkPredictionSpec extends SparkSpec {

  import spark.implicits._

  // Path + hub fixture:
  //   1−2, 2−3, 1−4, 3−4  (a 4-cycle: every node deg 2)
  //   plus hub 9 linked to 1,2,3,4 (deg 4)
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (1L, 4L), (3L, 4L),
    (1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L))
    .toDF("a", "b")

  test("hand-computed AA: cycle diagonals share two deg-3 ends + the hub") {
    val r = LinkPrediction.adamicAdar(edges, k = 10)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getLong(2), x.getDouble(3), x.getLong(4))).toMap
    // non-adjacent pairs: (1,3) via {2,4,9}, (2,4) via {1,3,9}.
    // All nodes 1..4 have deg 3 (two cycle edges + hub), hub deg 4.
    val aa = 2.0 / math.log(3.0) + 1.0 / math.log(4.0)
    assert(r.keySet === Set((1L, 3L), (2L, 4L)))
    assert(r((1L, 3L))._1 === 3L)
    assert(math.abs(r((1L, 3L))._2 - aa) < 1e-5, r.toString)
    assert(math.abs(r((2L, 4L))._2 - aa) < 1e-5)
    // deterministic tie-break: (1,3) before (2,4)
    assert(r((1L, 3L))._3 === 1L && r((2L, 4L))._3 === 2L)
  }

  test("maxDeg excludes hub centers from the evidence") {
    val r = LinkPrediction.adamicAdar(edges, k = 10, maxDeg = 3)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        (x.getLong(2), x.getDouble(3))).toMap
    // hub 9 (deg 4) can no longer center wedges: cn drops to 2,
    // aa to 2/ln(3)
    assert(r((1L, 3L))._1 === 2L)
    assert(math.abs(r((1L, 3L))._2 - 2.0 / math.log(3.0)) < 1e-5)
  }

  test("adjacent pairs are never predicted; deg-1 leaves are safe") {
    val withLeaf = edges.union(Seq((4L, 77L)).toDF("a", "b"))
    val r = LinkPrediction.adamicAdar(withLeaf, k = 100).collect()
    val pairs = r.map(x => (x.getLong(0), x.getLong(1))).toSet
    val e = Set((1L, 2L), (2L, 3L), (1L, 4L), (3L, 4L),
      (1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L), (4L, 77L))
    assert(pairs.intersect(e).isEmpty, s"adjacent pairs leaked: $pairs")
    // leaf 77 shares center 4 with 1, 3, 9 → appears as an endpoint
    assert(pairs.exists { case (u, v) => u == 77L || v == 77L })
  }

  test("co-purchase graph at sf0.001: ranked, bounded, positive") {
    val e = Triangles.coOccurrenceEdges(
      graft.Tables.lineitem(spark, sf0001)
        .filter($"l_quantity" >= 45), "l_orderkey", "l_partkey")
    val r = LinkPrediction.adamicAdar(e, k = 20).collect()
    assert(r.length <= 20 && r.nonEmpty)
    val aas = r.map(_.getDouble(3))
    assert(aas.zip(aas.tail).forall { case (x, y) => x >= y })
    assert(aas.forall(_ > 0))
  }
}
