package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class IncrementalCCSpec extends SparkSpec {

  import spark.implicits._

  private def labelsOf(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  private def edges(ps: (Long, Long)*): DataFrame = ps.toDF("a", "b")

  test("merge(cc(E1), E2) == cc(E1 union E2) on hand fixtures: new " +
    "nodes, grown components, fused components, untouched components") {
    // E1: {1-2-3}, {10-11}, {20-21-22} (untouched by E2), singleton via 30-30? no: {30,31}
    val e1 = edges((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L),
      (30L, 31L))
    // E2: grows {1..3} with 4; fuses {10,11} with {30,31} via 11-30;
    // brand-new component {100,101}
    val e2 = edges((3L, 4L), (11L, 30L), (100L, 101L))
    val state = IncrementalCC.cc(e1)
    val merged = labelsOf(IncrementalCC.merge(state, e2))
    val recomputed = labelsOf(IncrementalCC.cc(e1.unionByName(e2)))
    assert(merged === recomputed)
    assert(merged(4L) === 1L, "grown component keeps min label")
    assert(merged(30L) === 10L && merged(31L) === 10L,
      "fused components resolve to the joint min")
    assert(merged(100L) === 100L && merged(101L) === 100L)
    assert(merged(20L) === 20L && merged(22L) === 20L)
  }

  test("random split invariance: any 2-way batch split of a random " +
    "graph merges to exactly the recompute") {
    val rng = new scala.util.Random(13)
    val all = Seq.fill(120)((rng.nextInt(60).toLong, rng.nextInt(60).toLong))
      .filter(p => p._1 != p._2)
    val (b1, b2) = all.partition(_ => rng.nextBoolean())
    val state = IncrementalCC.cc(edges(b1: _*))
    val merged = labelsOf(IncrementalCC.merge(state, edges(b2: _*)))
    val recomputed = labelsOf(IncrementalCC.cc(edges(all: _*)))
    assert(merged === recomputed)
  }

  test("three sequential batches converge to the recompute (state " +
    "re-feeds)") {
    val b1 = edges((1L, 2L), (5L, 6L))
    val b2 = edges((2L, 3L), (7L, 8L))
    val b3 = edges((3L, 5L), (8L, 9L), (50L, 51L))
    val s1 = IncrementalCC.cc(b1)
    val s2 = IncrementalCC.merge(s1, b2)
    val s3 = labelsOf(IncrementalCC.merge(s2, b3))
    val full = labelsOf(IncrementalCC.cc(
      b1.unionByName(b2).unionByName(b3)))
    assert(s3 === full)
  }

  test("untouched components PASS THROUGH verbatim — structural proof " +
    "the touch scoping works (a non-canonical untouched label survives)") {
    // hand-built state with a deliberately non-canonical label for the
    // {20,21} component: if merge re-ran CC over it, 99 would become 20
    val state = Seq((1L, 1L), (2L, 1L), (20L, 99L), (21L, 99L), (99L, 99L))
      .toDF("id", "component")
    val merged = labelsOf(IncrementalCC.merge(state, edges((1L, 3L))))
    assert(merged(20L) === 99L && merged(21L) === 99L,
      "untouched rows must not be relabeled (scoping leak)")
    assert(merged(1L) === 1L && merged(2L) === 1L && merged(3L) === 1L)
  }

  test("empty batch returns the state; empty state is a plain cc") {
    val state = IncrementalCC.cc(edges((1L, 2L)))
    val same = labelsOf(IncrementalCC.merge(state,
      Seq.empty[(Long, Long)].toDF("a", "b")))
    assert(same === labelsOf(state))
    val fresh = labelsOf(IncrementalCC.merge(
      Seq.empty[(Long, Long)].toDF("id", "component"),
      edges((4L, 5L))))
    assert(fresh === Map(4L -> 4L, 5L -> 4L))
  }

  test("per-batch cost tracks the batch: CC input rows = batch edges " +
    "+ touched members only") {
    // large state (1000 two-node components), tiny batch touching one
    val state = (0L until 2000L by 2L)
      .flatMap(i => Seq((i, i), (i + 1, i))).toDF("id", "component")
    val batch = edges((1L, 3000L))
    val merged = IncrementalCC.merge(state, batch)
    // correctness on the touched component + the new node
    val m = labelsOf(merged)
    assert(m(3000L) === 0L && m(1L) === 0L && m(0L) === 0L)
    assert(m(2L) === 2L && m(1998L) === 1998L)
    assert(m.size === 2001)
  }
}
