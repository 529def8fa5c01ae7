package graft.graph

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LabelPropagationSpec extends SparkSpec {

  import spark.implicits._

  private def labelsOf(edges: Seq[(Long, Long, Long)], rounds: Int) =
    LabelPropagation.communities(edges.toDF("src", "dst", "w"), rounds)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two triangles over a weak bridge pool into two communities") {
    // strong triangles {1,2,3} and {4,5,6}, bridge 3–4 with weight 1
    val tri = Seq((1L, 2L, 10L), (2L, 3L, 10L), (1L, 3L, 10L),
      (4L, 5L, 10L), (5L, 6L, 10L), (4L, 6L, 10L), (3L, 4L, 1L))
    val l = labelsOf(tri, rounds = 4)
    assert(l.keySet === Set(1L, 2L, 3L, 4L, 5L, 6L))
    assert(Set(l(1L), l(2L), l(3L)).size === 1, l.toString)
    assert(Set(l(4L), l(5L), l(6L)).size === 1, l.toString)
    assert(l(1L) !== l(4L), s"bridge merged the communities: $l")
  }

  test("isolated pair oscillates deterministically under synchronous " +
    "updates") {
    val pair = Seq((1L, 2L, 1L))
    assert(labelsOf(pair, 1) === Map(1L -> 2L, 2L -> 1L))
    assert(labelsOf(pair, 2) === Map(1L -> 1L, 2L -> 2L))
  }

  test("ties break to the smallest label; zero rounds = identity") {
    // node 3 sees labels 1 and 2 with equal weight → takes 1
    val v = Seq((1L, 3L, 5L), (2L, 3L, 5L))
    val l = labelsOf(v, 1)
    assert(l(3L) === 1L, l.toString)
    val id = labelsOf(v, 0)
    assert(id === Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("adaptive small-graph driver path produces EXACTLY the " +
    "distributed labels") {
    val edges = ((1 to 80).map(i =>
      ((i % 17).toLong, ((i * 11 + 3) % 17).toLong, (i % 4 + 1).toLong))
      .filter { case (a, b, _) => a != b }) ++ Seq((3L, 3L, 2L))
    for (rounds <- Seq(0, 1, 3, 4)) {
      val drv = LabelPropagation.communities(
        edges.toDF("src", "dst", "w"), rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dist = LabelPropagation.communities(
        edges.toDF("src", "dst", "w"), rounds, checkpointEvery = 4,
        smallGraphMax = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(drv === dist, s"driver != distributed at rounds=$rounds")
    }
  }

  test("layout invariance: repartitioned edges give identical labels") {
    val edges = (1 to 60).map(i =>
      ((i % 12).toLong, ((i * 7) % 12).toLong, (i % 5 + 1).toLong))
      .filter { case (a, b, _) => a != b }
    val a = LabelPropagation.communities(edges.toDF("src", "dst", "w"), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = LabelPropagation.communities(
      edges.toDF("src", "dst", "w").repartition(13), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a === b)
  }
}
