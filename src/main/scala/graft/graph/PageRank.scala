package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** WEIGHTED PAGERANK — iterative link-graph centrality, the canonical
  * "importance" signal for crawl curation (rank domains / pages before
  * sampling a training corpus) and the repo's first genuinely iterative
  * graph operator (connected components exist; this adds fixed-point
  * value propagation).
  *
  * Determinism (SURVEY §5.3): every rank lives on an integer grid —
  * `scale` micro-units of probability mass (default 1e12) — and every
  * update is pure BIGINT arithmetic: per-edge contribution
  * `(rank(src) * w) DIV outWeight(src)`, damped update
  * `teleport + (dampNumer * Σcontrib) DIV dampDenom`. Integer division
  * truncates identically in Spark (`DIV`) and DuckDB (`//`, both
  * operands non-negative), and BIGINT sums are order-insensitive, so a
  * fixed iteration count is bit-portable across engines and layouts —
  * no float fixed-point tolerance anywhere.
  *
  * Overflow bounds (64-bit safe by construction): rank ≤ scale = 1e12,
  * so `rank * w` needs `w ≤ 9.2e18 / 1e12 ≈ 9.2e6`. Callers with hotter
  * edges pre-aggregate or down-scale weights (rank only depends on
  * per-source weight *proportions*, so dividing all of a source's
  * weights by a common factor is semantics-preserving).
  *
  * Scale shape (100 TB): the edge list is the big table; ranks and
  * out-weights are #nodes-sized. Each iteration is one equi-join of
  * edges⋈ranks⋈outw on `src` (AQE broadcasts the rank side while it
  * fits; at web scale all three can be pre-partitioned on `src` so the
  * join is co-located and only the dst-aggregation shuffles) followed by
  * one partial-aggregated `groupBy(dst)`. The corpus-sized edge frame is
  * never windowed, never collected; per iteration exactly one shuffle of
  * #edges rows (the contribution agg) plus a #nodes-sized left join.
  * The edge derivation is materialized once (`localCheckpoint`) so
  * iterations re-read the materialized edge table instead of re-running
  * the upstream joins, and rank lineage is flattened every
  * `checkpointEvery` iterations.
  *
  * Dangling semantics: nodes with no out-edges absorb mass (the
  * standard simplified formulation — their rank is not redistributed);
  * nodes with no in-edges settle at the teleport floor. Total mass is
  * therefore ≤ scale and the ordering — the signal users consume — is
  * unaffected.
  */
object PageRank {

  /** Iterate weighted PageRank over `edges(src, dst, w)`.
    * Returns one row per node: (node, pr_rank) with pr_rank in
    * [0, scale] micro-units.
    *
    * ADAPTIVE SMALL-GRAPH PATH (the [[Hits.scores]] /
    * connectedComponents precedent): at most `smallGraphMaxEdges`
    * materialized edges iterate on the driver — every update is an
    * order-insensitive BIGINT sum and a truncating division, so the
    * driver loop is the distributed rounds' bit-exact twin
    * (PageRankSpec asserts equality) without `iterations × (2 joins +
    * 1 agg)` scheduler round-trips over tiny frames. Pass
    * `smallGraphMaxEdges = 0` to force the distributed rounds. */
  def ranks(edgesIn: DataFrame, iterations: Int,
            scale: Long = 1000000000000L,
            dampNumer: Long = 85, dampDenom: Long = 100,
            checkpointEvery: Int = 8,
            smallGraphMaxEdges: Long = 1L << 20): DataFrame = {
    require(iterations >= 0 && scale > 0 && dampDenom > 0 &&
      dampNumer >= 0 && dampNumer <= dampDenom && checkpointEvery > 0)
    // localCheckpoint the edge frame (and the #nodes-sized outw/nodes
    // derived from it) ONCE: without it every iteration re-executes the
    // caller's whole edge derivation — the executed query plan showed 5
    // redundant corpus-join re-runs before this materialization.
    val edges = edgesIn.select(col("src"), col("dst"),
      col("w").cast("long").as("w")).localCheckpoint()
    if (smallGraphMaxEdges > 0 && edges.count() <= smallGraphMaxEdges) {
      val d = driverRanks(edges, iterations, scale, dampNumer, dampDenom)
      if (d.isDefined) return d.get
    }
    val outw = edges.groupBy("src").agg(sum("w").as("ow")).localCheckpoint()
    val nodes = edges.select(col("src").as("node"))
      .union(edges.select(col("dst").as("node"))).distinct()
      .localCheckpoint()
    // n is a scalar (node count) — one tiny job, then pure driver-side
    // BIGINT constants identical to the oracle's subquery arithmetic.
    val n = nodes.count()
    require(n > 0, "PageRank over an empty edge set")
    val base = scale / n
    val teleport = ((dampDenom - dampNumer) * base) / dampDenom
    var ranks = nodes.withColumn("pr_rank", lit(base))
    for (i <- 1 to iterations) {
      val contrib = edges
        .join(ranks.withColumnRenamed("node", "src")
          .withColumnRenamed("pr_rank", "__r"), "src")
        .join(outw, "src")
        .groupBy(col("dst").as("node"))
        .agg(sum(expr("(__r * w) DIV ow")).as("__c"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"($dampNumer * coalesce(__c, 0L)) DIV $dampDenom"))
            .as("pr_rank"))
      // flatten the rank frame's own lineage on long runs (each
      // iteration otherwise nests the previous iteration's plan)
      if (i % checkpointEvery == 0 && i < iterations)
        ranks = ranks.localCheckpoint()
    }
    ranks
  }

  /** The driver twin of the distributed rounds — collected edges, the
    * SAME arithmetic: `(rank(src)·w) quot ow(src)` summed per dst in
    * Long (order-insensitive), `teleport + (dampNumer·Σ) quot
    * dampDenom`, add/multiplyExact so overflow fails loudly exactly
    * where ANSI does on the distributed path. A null-weight edge
    * contributes to NOTHING except node membership — the distributed
    * twin's `sum` skips the null product and `sum(w)` the null weight
    * (and a src with only null-weight edges has null outWeight, so
    * every product through it is null). None when the edge set is
    * empty or [[GraphDriver.collectEdges]] declines (type mismatch /
    * binary keys / null keys). */
  private def driverRanks(edges: DataFrame, iterations: Int, scale: Long,
                          dampNumer: Long, dampDenom: Long)
      : Option[DataFrame] = {
    val rows = GraphDriver.collectEdges(edges).getOrElse(return None)
    if (rows.isEmpty) return None
    val srcF = edges.schema("src")
    val dstF = edges.schema("dst")
    val all = rows.map(r =>
      (r.get(0), r.get(1), if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val nodes: Array[Any] =
      (all.map(_._1) ++ all.map(_._2)).distinct.toArray
    val es = all.collect { case (s, d, Some(w)) => (s, d, w) }
    val ow = scala.collection.mutable.Map[Any, Long]()
    es.foreach { case (s, _, w) =>
      ow(s) = Math.addExact(ow.getOrElse(s, 0L), w) }
    val n = nodes.length.toLong
    val base = scale / n
    val teleport = ((dampDenom - dampNumer) * base) / dampDenom
    var ranks = nodes.map(nd => nd -> base).toMap
    for (_ <- 1 to iterations) {
      val contrib = scala.collection.mutable.Map[Any, Long]()
      es.foreach { case (s, d, w) =>
        contrib(d) = Math.addExact(contrib.getOrElse(d, 0L),
          Math.multiplyExact(ranks(s), w) / ow(s)) }
      ranks = nodes.map(nd =>
        nd -> (teleport +
          Math.multiplyExact(dampNumer,
            contrib.getOrElse(nd, 0L)) / dampDenom)).toMap
    }
    val spark = edges.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("node", srcF.dataType,
        srcF.nullable || dstF.nullable),
      org.apache.spark.sql.types.StructField("pr_rank",
        org.apache.spark.sql.types.LongType, nullable = true)))
    val out: java.util.List[org.apache.spark.sql.Row] =
      java.util.Arrays.asList(nodes.map(nd =>
        org.apache.spark.sql.Row(nd, ranks(nd))): _*)
    Some(spark.createDataFrame(out, schema))
  }

  /** DuckDB twin: the same BIGINT iteration unrolled as a WITH chain.
    * `edgesSql` must produce columns (src, dst, w BIGINT). */
  def sqlRanks(edgesSql: String, iterations: Int,
               scale: Long = 1000000000000L,
               dampNumer: Long = 85, dampDenom: Long = 100): String = {
    val base = s"($scale // cnt)"
    val teleport = s"((($dampDenom - $dampNumer) * $base) // $dampDenom)"
    // every sum is CAST back to BIGINT: DuckDB widens sum(BIGINT) to
    // HUGEINT, which the driver would see as a schema/type mismatch
    val head = s"""
      WITH edges AS ($edgesSql),
      outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow
               FROM edges GROUP BY 1),
      nodes AS (SELECT src AS node FROM edges
                UNION SELECT dst AS node FROM edges),
      nn AS (SELECT CAST(count(*) AS BIGINT) AS cnt FROM nodes),
      r0 AS (SELECT node, $base AS pr_rank FROM nodes CROSS JOIN nn)"""
    val iters = (1 to iterations).map { i =>
      s"""
      c$i AS (SELECT e.dst AS node,
                CAST(sum((r.pr_rank * e.w) // o.ow) AS BIGINT) AS c
              FROM edges e JOIN r${i - 1} r ON e.src = r.node
              JOIN outw o ON e.src = o.src GROUP BY 1),
      r$i AS (SELECT nodes.node,
                CAST($teleport + ($dampNumer * COALESCE(c$i.c, 0))
                  // $dampDenom AS BIGINT) AS pr_rank
              FROM nodes CROSS JOIN nn
              LEFT JOIN c$i ON nodes.node = c$i.node)"""
    }.mkString(",")
    val withChain = if (iterations > 0) s"$head,$iters" else head
    s"$withChain SELECT node, pr_rank FROM r$iterations"
  }
}
