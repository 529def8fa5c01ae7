package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class PageRankSpec extends SparkSpec {

  import spark.implicits._

  private val Scale = 1000000000000L

  /** Independent driver-side reference: same integer-grid recurrence,
    * computed with plain Scala maps. */
  private def reference(edges: Seq[(Int, Int, Long)], iters: Int,
                        scale: Long = Scale, dn: Long = 85,
                        dd: Long = 100): Map[Int, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct.sorted
    val outw = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val base = scale / nodes.size
    val teleport = ((dd - dn) * base) / dd
    var rank = nodes.map(_ -> base).toMap
    for (_ <- 1 to iters) {
      val contrib = edges
        .map { case (s, t, w) => t -> (rank(s) * w) / outw(s) }
        .groupBy(_._1).map { case (t, cs) => t -> cs.map(_._2).sum }
      rank = nodes.map(v => v -> (teleport + (dn * contrib.getOrElse(v, 0L)) / dd)).toMap
    }
    rank
  }

  private def run(edges: Seq[(Int, Int, Long)], iters: Int): Map[Int, Long] =
    PageRank.ranks(edges.toDF("src", "dst", "w"), iters)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap

  // a small asymmetric weighted graph with a dangling node (4 has no
  // out-edges) and a pure source (0 has no in-edges)
  private val g = Seq(
    (0, 1, 3L), (0, 2, 1L), (1, 2, 2L), (2, 1, 1L),
    (2, 3, 1L), (3, 4, 5L), (1, 4, 1L))

  test("matches the driver-side integer reference bit-exactly") {
    for (iters <- Seq(0, 1, 3))
      assert(run(g, iters) === reference(g, iters), s"iters=$iters")
  }

  test("zero iterations: uniform base rank for every node") {
    val r = run(g, 0)
    assert(r.values.toSet === Set(Scale / 5))
  }

  test("mass is conserved up to truncation: sum ≤ scale, each ≥ teleport floor") {
    val r = run(g, 3)
    assert(r.values.sum <= Scale)
    val teleport = ((100L - 85L) * (Scale / 5)) / 100L
    assert(r.values.forall(_ >= teleport))
    // the pure source holds exactly the teleport floor after ≥1 iter
    assert(r(0) === teleport)
  }

  test("a hub every node links to outranks the spokes") {
    val star = (1 to 6).map(i => (i, 0, 1L)) ++ Seq((0, 1, 1L))
    val r = run(star, 3)
    assert((1 to 6).forall(i => r(0) > r(i)))
  }

  test("layout-invariant: repartitioned edge frame gives identical ranks") {
    val df = g.toDF("src", "dst", "w")
    val a = PageRank.ranks(df, 3).collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val b = PageRank.ranks(df.repartition(7), 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(a === b)
  }

  test("small-graph driver path ≡ distributed rounds") {
    val df = g.toDF("src", "dst", "w")
    for (iters <- Seq(0, 1, 3, 5)) {
      val drv = PageRank.ranks(df, iters)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
      val dist = PageRank.ranks(df, iters, smallGraphMaxEdges = 0)
        .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
      assert(drv === dist, s"iters=$iters driver/distributed differ")
    }
  }

  test("driver path ≡ distributed on null-weight edges (null products " +
    "contribute nothing, endpoints still count as nodes)") {
    val e = Seq((1, 2, Some(3L)), (2, 3, None), (3, 1, Some(2L)),
      (4, 1, Some(1L)), (4, 5, None)).toDF("src", "dst", "w")
    val drv = PageRank.ranks(e, 3)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    val dist = PageRank.ranks(e, 3, smallGraphMaxEdges = 0)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(drv === dist, "null-weight semantics must match")
    assert(drv.keySet === Set(1, 2, 3, 4, 5),
      "null-weight edges still contribute their endpoints as nodes")
  }

  test("oracle SQL text unrolls the requested iteration count") {
    val sql = PageRank.sqlRanks("SELECT 1 AS src, 2 AS dst, 1 AS w", 3)
    assert(sql.contains("r3") && sql.contains("c3") && !sql.contains("c4"))
    assert(sql.trim.endsWith("FROM r3"))
  }
}
