package graft.graph

import graft.SparkSpec

class ModularitySpec extends SparkSpec {

  import spark.implicits._

  // two triangles joined by one bridge: the canonical modular graph
  private def edges = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L),
    (4L, 5L), (5L, 6L), (4L, 6L),
    (3L, 4L)).toDF("a", "b")

  test("hand-computed Q on two bridged triangles") {
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("node", "label")
    val r = Modularity.modularity(edges, labels)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))
      .toMap
    // m = 7; community 10: m_c = 3, d_c = 7 → 3/7 − (7/14)² = .178571
    assert(r(10L)._1 === 3L && r(10L)._2 === 3L && r(10L)._3 === 7L)
    assert(math.abs(r(10L)._4 - (3.0 / 7 - 0.25)) < 1e-6, r.toString)
    // symmetric for 20; total Q = 2·.178571 = .357143 — real structure
    assert(math.abs(r(-1L)._4 - 2 * (3.0 / 7 - 0.25)) < 1e-6)
  }

  test("the all-one-community partition scores exactly zero") {
    val labels = (1L to 6L).map(n => (n, 99L)).toDF("node", "label")
    val r = Modularity.modularity(edges, labels)
      .collect().map(x => x.getLong(0) -> x.getDouble(4)).toMap
    // m_c = m and d_c = 2m → Q = 1 − 1 = 0: no structure credit for
    // not partitioning at all
    assert(r(-1L) === 0.0, r.toString)
  }

  test("a bad partition scores below the good one (and below zero)") {
    val good = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("node", "label")
    // adversarial: split each triangle across communities
    val bad = Seq((1L, 10L), (2L, 20L), (3L, 10L),
      (4L, 20L), (5L, 10L), (6L, 20L)).toDF("node", "label")
    def q(l: org.apache.spark.sql.DataFrame) =
      Modularity.modularity(edges, l)
        .filter($"label" === -1L).head.getDouble(4)
    assert(q(good) > q(bad), s"${q(good)} vs ${q(bad)}")
    assert(q(bad) < 0.0, s"anti-community partition: ${q(bad)}")
  }
}
