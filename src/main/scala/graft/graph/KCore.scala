package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-CORE EXTRACTION — the dense-subgraph read the rest of the graph
  * family circles around: the k-core is the maximal subgraph where
  * EVERY node keeps degree ≥ k after everyone else is gone. Spam
  * rings, review-fraud cliques and community nuclei survive k-core
  * peeling; long tails of casual nodes don't — which is why it is the
  * standard pre-filter before the expensive per-node graph analytics
  * (a PageRank or triangle pass over the 10-core touches a fraction
  * of the edges).
  *
  * Algorithm: iterative peeling to the fixed point — drop every node
  * with current degree < k, re-derive degrees on the induced
  * subgraph, repeat until no node falls. Deterministic (the fixed
  * point is unique — peeling order cannot change it), but the ROUND
  * COUNT is data-dependent, so like connected components this is a
  * rows+spec operator (no single-SQL twin); the spec pins
  * hand-peelable graphs including the cascade case where removing
  * one node unravels a chain.
  *
  * Scale shape: per round ONE degree aggregate over the current edge
  * set + one semi-join filtering edges to surviving endpoints —
  * partial-agg'd, no windows; the edge frame shrinks monotonically
  * and is localCheckpoint'd per round (the CC lineage rule: iterative
  * self-derivation doubles the plan otherwise). Rounds are bounded by
  * the longest peel cascade (≤ nodes, tiny in practice — `maxIter`
  * guards the pathological chain). */
object KCore {

  /** Nodes of the k-core of undirected `edges(a, b)` (a < b, dedup'd)
    * with their in-core degree: `(node, degree)`. Empty when no
    * k-core exists.
    *
    * ADAPTIVE SMALL-GRAPH PATH (the connectedComponents /
    * [[Hits.scores]] precedent): at most `smallGraphMaxEdges`
    * materialized edges peel on the driver — the fixed point is
    * unique, so the result set is identical by construction
    * (KCoreSpec asserts driver ≡ distributed), without paying one
    * checkpoint + count + semi-join round per peel cascade step.
    * Pass `smallGraphMaxEdges = 0` to force the distributed rounds.
    *
    * `maxIter` CAVEAT: the distributed rounds throw
    * IllegalStateException when the fixed point is not reached within
    * `maxIter`; the driver peel always runs to completion, so graphs
    * under the small-graph bound never hit that failure. A caller
    * using `maxIter` as a cost/sanity guard keeps it only on the
    * distributed path — force it with `smallGraphMaxEdges = 0` if the
    * bound must be enforced regardless of graph size. */
  def kCore(edgesIn: DataFrame, k: Int, maxIter: Int = 100,
            smallGraphMaxEdges: Long = 1L << 20): DataFrame = {
    require(k >= 1 && maxIter >= 1)
    var edges = edgesIn.select(col("a"), col("b")).localCheckpoint()
    if (smallGraphMaxEdges > 0 && edges.count() <= smallGraphMaxEdges) {
      val d = driverKCore(edges, k)
      if (d.isDefined) return d.get
    }
    var n = -1L
    var rounds = 0
    var done = false
    while (!done && rounds < maxIter) {
      val deg = edges.select(col("a").as("node"))
        .union(edges.select(col("b").as("node")))
        .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      val keep = deg.filter(col("degree") >= k).localCheckpoint()
      val kn = keep.count()
      if (kn == n) done = true
      else {
        n = kn
        edges = edges
          .join(keep.select(col("node").as("a")), "a", "left_semi")
          .join(keep.select(col("node").as("b")), "b", "left_semi")
          .localCheckpoint()
        rounds += 1
      }
    }
    // a truncated peel is NOT the k-core (it may retain under-degree
    // nodes) and a warning log cannot stop callers consuming it as
    // one — fail loudly instead; maxIter exists only to bound the
    // pathological-chain worst case, so hitting it is an error
    if (!done && rounds >= maxIter)
      throw new IllegalStateException(
        s"kCore did NOT reach the fixed point within maxIter=$maxIter " +
          "rounds - the truncated result would retain under-degree " +
          "nodes; raise maxIter")
    edges.select(col("a").as("node"))
      .union(edges.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
      .filter(col("degree") >= k)
  }

  /** Driver peel to the (unique) fixed point over collected edges.
    * None when [[GraphDriver.collectEdges]] declines (a/b type
    * mismatch, binary keys, null keys — the distributed path handles
    * those). Output schema matches the distributed path: `(node,
    * degree bigint)`. */
  private def driverKCore(edges: org.apache.spark.sql.DataFrame,
                          k: Int): Option[DataFrame] = {
    val aF = edges.schema("a")
    val bF = edges.schema("b")
    var es = GraphDriver.collectEdges(edges).getOrElse(return None)
      .map(r => (r.get(0), r.get(1)))
    var changed = true
    while (changed && es.nonEmpty) {
      val deg = scala.collection.mutable.Map[Any, Long]()
      es.foreach { case (a, b) =>
        deg(a) = deg.getOrElse(a, 0L) + 1L
        deg(b) = deg.getOrElse(b, 0L) + 1L
      }
      val keep = deg.filter(_._2 >= k).keySet
      val next = es.filter { case (a, b) => keep(a) && keep(b) }
      changed = next.length != es.length
      es = next
    }
    val deg = scala.collection.mutable.LinkedHashMap[Any, Long]()
    es.foreach { case (a, b) =>
      deg(a) = deg.getOrElse(a, 0L) + 1L
      deg(b) = deg.getOrElse(b, 0L) + 1L
    }
    val spark = edges.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", aF.dataType,
        aF.nullable || bF.nullable),
      org.apache.spark.sql.types.StructField("degree",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val rows: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(deg.toSeq.filter(_._2 >= k)
        .map { case (n, d) => org.apache.spark.sql.Row(n, d) }: _*)
    Some(spark.createDataFrame(rows, schema))
  }
}
