package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TrianglesSpec extends SparkSpec {

  import spark.implicits._

  private def statsOf(edges: Seq[(Long, Long)]) =
    Triangles.stats(edges.toDF("a", "b")).collect()(0)

  test("known graphs: K4, path, star, star+closure") {
    // K4: 4 triangles, 6 edges, wedges = 4·C(3,2) = 12, cc = 1
    val k4 = statsOf(Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L)))
    assert((k4.getLong(0), k4.getLong(1), k4.getLong(2), k4.getLong(3))
      === ((4L, 6L, 12L, 4L)))
    assert(k4.getDouble(4) === 1.0)
    // path 1-2-3-4: 0 triangles, 2 wedges
    val path = statsOf(Seq((1L,2L),(2L,3L),(3L,4L)))
    assert(path.getLong(3) === 0L && path.getLong(2) === 2L)
    assert(path.getDouble(4) === 0.0)
    // star (hub 1, leaves 2..5): 0 triangles, C(4,2)=6 wedges — the
    // degree orientation points every edge INTO the hub, so the hub
    // contributes zero oriented wedges (the explosion-avoidance)
    val star = statsOf(Seq((1L,2L),(1L,3L),(1L,4L),(1L,5L)))
    assert(star.getLong(3) === 0L && star.getLong(2) === 6L)
    // close one leaf pair: exactly 1 triangle
    val closed = statsOf(Seq((1L,2L),(1L,3L),(1L,4L),(1L,5L),(2L,3L)))
    assert(closed.getLong(3) === 1L)
  }

  test("co-occurrence edges: normalized, distinct, within-group only") {
    val inc = Seq((10L, 3L), (10L, 1L), (10L, 2L), (20L, 1L), (20L, 2L),
      (30L, 9L), (10L, 1L)) // duplicate incidence collapses
      .toDF("g", "i")
    val e = Triangles.coOccurrenceEdges(inc, "g", "i")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // group 10 → pairs of {1,2,3}; group 20 → (1,2) again (deduped)
    assert(e === Set((1L,2L), (1L,3L), (2L,3L)))
    assert(e.forall { case (a, b) => a < b })
  }

  test("perNode: K4 corners each on 3 triangles with local cc 1; leaf closure") {
    val k4 = Triangles.perNode(
        Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(k4.keySet === Set(1L, 2L, 3L, 4L))
    assert(k4.values.forall(_ == (3L, 1.0)))
    // star + one closed leaf pair: hub has 1 triangle over C(4,2)=6
    // wedges (local cc 1/6 ≈ spam-hub shape); closed leaves cc 1
    val closed = Triangles.perNode(
        Seq((1L,2L),(1L,3L),(1L,4L),(1L,5L),(2L,3L)).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(3))).toMap
    assert(closed(1L) === ((1L, 0.166667)))
    assert(closed(2L) === ((1L, 1.0)) && closed(3L) === ((1L, 1.0)))
    assert(!closed.contains(4L) && !closed.contains(5L))
  }

  test("matches the naive count on the real co-purchase graph") {
    val li = graft.Tables.lineitem(spark, sf0001)
      .filter(col("l_quantity") >= 45)
    val edges = Triangles.coOccurrenceEdges(li, "l_orderkey", "l_partkey")
      .localCheckpoint()
    val oriented = Triangles.stats(edges).collect()(0).getLong(3)
    // naive a<b<c three-way join on the same edges
    val e1 = edges.select(col("a"), col("b"))
    val naive = e1.as("e1")
      .join(e1.as("e2"), col("e2.a") === col("e1.b"))
      .join(e1.as("e3"), col("e3.a") === col("e1.a") && col("e3.b") === col("e2.b"))
      .count()
    assert(oriented === naive)
  }
}
