package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DISTRIBUTED TRIANGLE COUNTING — the graph-health primitive behind
  * community detection, link-spam screens and co-occurrence cluster
  * scoring: how many closed triples does the graph contain, and how
  * does that compare to its open wedges (the global clustering
  * coefficient)?
  *
  * The algorithm is the DEGREE-ORIENTED join (Cohen's MapReduce
  * triangle counting / the "compact-forward" family): orient every
  * undirected edge from its lower-(degree, id) endpoint to the higher
  * one, build wedges only from ORIENTED out-neighbors, and close each
  * wedge with one oriented edge lookup. Each triangle is counted
  * exactly once (its three nodes have a unique (deg, id) order), and —
  * the scale point — out-degree under degree orientation is bounded by
  * O(√E), so the wedge join materializes Σ outdeg² = O(E^1.5) rows
  * instead of the naive Σ deg², which a single celebrity node turns
  * into deg² ≈ E² (the wedge explosion every naive triangle query dies
  * of; a power-law hub of degree 10⁶ yields 10¹² naive wedges but at
  * most ~E oriented ones).
  *
  * Everything is exact integer counting + one final double division,
  * so the whole summary sits under the bit-exact DuckDB oracle (which
  * computes the naive a<b<c form — equality IS the once-per-triangle
  * proof executed).
  *
  * Scale shape: degree agg (one shuffle of E), two broadcast-or-hash
  * joins to attach orientation keys, the wedge self-join on the source
  * node (the O(E^1.5) bound above), and a final equi-join on (v, w)
  * pairs. No windows, no collect.
  */
object Triangles {

  /** Undirected co-occurrence edges from (group, item) incidence: one
    * `(a, b)` row per unordered item pair sharing ≥1 group, a < b.
    * Pair fan-out is C(items-per-group, 2) — bounded by the caller's
    * group semantics (orders hold ≤7 parts; for unbounded groups cap
    * upstream the way TopPerGroup caps domains). */
  def coOccurrenceEdges(df: DataFrame, groupCol: String,
                        itemCol: String): DataFrame = {
    val it = df.select(col(groupCol).as("__g"), col(itemCol).as("__i"))
      .distinct()
    val l = it.select(col("__g"), col("__i").as("__ia"))
    val r = it.select(col("__g").as("__g2"), col("__i").as("__ib"))
    l.join(r, col("__g") === col("__g2") && col("__ia") < col("__ib"))
      .select(col("__ia").as("a"), col("__ib").as("b"))
      .distinct()
  }

  /** Per-node triangle membership + LOCAL clustering coefficient
    * (tri / C(deg, 2), 6-dp) for every node on ≥1 triangle — the
    * node-level view behind community seeds and link-spam scores
    * (spam hubs have huge degree and near-zero local cc). Same
    * oriented wedge join as [[stats]]; each closed wedge credits its
    * THREE corners via one explode, then a hash agg on node.
    *
    * PRECONDITION (shared with [[stats]]): node ids must be integers
    * in `[0, 2³²)` — the orientation key packs (deg, id) into one
    * BIGINT as `deg·2³² + id`, which silently mis-orders for negative
    * or ≥2³² ids (wrong orientation double- or zero-counts triangles
    * with no error). Densify larger/negative id spaces first
    * (`dense_rank` over distinct nodes is one window). */
  def perNode(edges: DataFrame): DataFrame = {
    val closed = closedWedges(edges)
    val deg = degrees(edges)
    closed
      .select(explode(array(col("u"), col("x"), col("y"))).as("v"))
      .groupBy(col("v")).agg(count(lit(1)).as("n_triangles"))
      .join(deg, "v")
      .withColumn("local_cc", round(
        col("n_triangles").cast("double") /
          (col("deg") * (col("deg") - 1) / 2).cast("double"), 6))
  }

  private def degrees(edges: DataFrame): DataFrame =
    edges.select(col("a").as("v"))
      .unionAll(edges.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))

  /** Closed oriented wedges `(u, x, y)` — one row per triangle (the
    * semi close is exact because edges are distinct). Orientation
    * order: (deg, id) packed into one BIGINT — valid while deg < 2³¹
    * and 0 ≤ id < 2³²; callers with larger id spaces densify first. */
  private def closedWedges(edges: DataFrame): DataFrame = {
    val keyed = degrees(edges).select(col("v"),
      (col("deg") * lit(4294967296L) + col("v")).as("ord"))
    val e = edges
      .join(keyed.select(col("v").as("a"), col("ord").as("__oa")), "a")
      .join(keyed.select(col("v").as("b"), col("ord").as("__ob")), "b")
    val oriented = e.select(
        when(col("__oa") < col("__ob"), col("a")).otherwise(col("b")).as("u"),
        when(col("__oa") < col("__ob"), col("b")).otherwise(col("a")).as("w"),
        greatest(col("__oa"), col("__ob")).as("__ow"))
      .localCheckpoint() // feeds the wedge join twice + the closing join
    oriented.select(col("u"), col("w").as("x"), col("__ow").as("__ox"))
      .join(oriented.select(col("u"), col("w").as("y"), col("__ow").as("__oy")),
        "u")
      .filter(col("__ox") < col("__oy"))
      .join(oriented.select(col("u").as("x"), col("w").as("y")), Seq("x", "y"),
        "left_semi")
      .select(col("u"), col("x"), col("y"))
  }

  /** One-row graph summary over normalized distinct edges `(a, b)`,
    * a < b: `n_nodes, n_edges, n_wedges, n_triangles,
    * clustering_coeff` (= 3T / wedges, 6-dp; 0 for wedge-free graphs).
    * PRECONDITION: node ids in `[0, 2³²)` — see [[perNode]]. */
  def stats(edges: DataFrame): DataFrame = {
    val deg = degrees(edges)
    val triangles = closedWedges(edges)
      .agg(count(lit(1)).as("n_triangles"))
    val base = edges.agg(count(lit(1)).as("n_edges"))
    val degStats = deg.agg(count(lit(1)).as("n_nodes"),
      sum(col("deg") * (col("deg") - 1) / 2).as("n_wedges"))
    base.crossJoin(degStats).crossJoin(triangles)
      .select(col("n_nodes"), col("n_edges"),
        col("n_wedges").cast("bigint").as("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0,
          round(lit(3.0) * col("n_triangles").cast("double")
            / col("n_wedges").cast("double"), 6))
          .otherwise(lit(0.0)).as("clustering_coeff"))
  }
}
