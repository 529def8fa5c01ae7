package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LABEL PROPAGATION communities — the graph family's clustering
  * member next to [[PageRank]] (importance), connected components
  * (reachability) and [[Triangles]] (density): nodes adopt the label
  * carrying the most incident edge weight, and after a few rounds
  * labels pool inside densely-connected groups — the crawl-curation
  * question "which domains form one content community" that
  * components (everything touching anything) answer too coarsely.
  *
  * Deterministic SYNCHRONOUS variant (classic async LPA is
  * order-dependent by construction — useless under an oracle):
  * l₀(v) = v; each round every node simultaneously takes
  *
  *   l_{r+1}(v) = argmax_label Σ_{(v,u) ∈ E} w(v,u)·[l_r(u) = label]
  *
  * with ties to the SMALLEST label and isolated nodes keeping their
  * own. All scores are BIGINT sums and the argmax is a lexicographic
  * (score DESC, label ASC) struct max — bit-portable, so a FIXED
  * round count unrolls into plain SQL ([[sqlCommunities]], the
  * [[PageRank.sqlRanks]] convention). Synchronous LPA can oscillate
  * on bipartite shapes; a fixed round budget makes the output
  * well-defined either way (the spec pins a 2-cycle fixture).
  *
  * Scale shape: the mirrored edge list is the big table,
  * materialized ONCE (`localCheckpoint` — the connected-components
  * lesson: iterative lineage re-analysis goes super-linear); each
  * round is one edges⋈labels equi-join (labels are #nodes-sized; AQE
  * broadcasts while they fit), one partial-aggregated
  * groupBy(node, label), one argmax agg, one #nodes-sized left join.
  * Nothing is collected; label lineage flattens every
  * `checkpointEvery` rounds. */
object LabelPropagation {

  /** Run `rounds` synchronous updates over `edgesIn(src, dst, w)`
    * (treated UNDIRECTED — edges are mirrored; `w` BIGINT-castable).
    * Returns one row per node: `(node, label)`. */
  def communities(edgesIn: DataFrame, rounds: Int,
                  checkpointEvery: Int = 4): DataFrame =
    communities(edgesIn, rounds, checkpointEvery, 1L << 16)

  /** [[communities]] with an explicit small-graph bound (the
    * [[Louvain.refineWeighted]] adaptive precedent: below it the
    * fixed rounds run as one driver computation instead of ~3
    * distributed stages each — pure latency at bench scale; pass 0
    * to force the distributed path; LabelPropagationSpec pins driver
    * ≡ distributed). */
  def communities(edgesIn: DataFrame, rounds: Int, checkpointEvery: Int,
                  smallGraphMax: Long): DataFrame = {
    require(rounds >= 0 && checkpointEvery > 0)
    val e0 = edgesIn.select(col("src").cast("bigint").as("src"),
      col("dst").cast("bigint").as("dst"), col("w").cast("bigint").as("w"))
      .localCheckpoint()
    if (e0.count() <= smallGraphMax) {
      val spark = edgesIn.sparkSession
      import spark.implicits._
      return communitiesDriver(e0.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq, rounds)
        .toDF("node", "label")
    }
    val und = e0.unionByName(e0.select(col("dst").as("src"),
      col("src").as("dst"), col("w"))).localCheckpoint()
    val nodes = und.select(col("src").as("node")).distinct()
      .localCheckpoint()
    var labels = nodes.withColumn("label", col("node"))
    var r = 0
    while (r < rounds) {
      val scores = und
        .join(labels.select(col("node").as("__n"), col("label")),
          col("dst") === col("__n"))
        .groupBy(col("src").as("node"), col("label"))
        .agg(sum(col("w")).as("__s"))
      // argmax by (score DESC, label ASC): lexicographic struct max
      // over (s, −label), negated back out
      val best = scores.groupBy(col("node"))
        .agg(max(struct(col("__s").as("s"),
          (-col("label")).as("nl"))).as("__m"))
        .select(col("node"), (-col("__m.nl")).as("__new"))
      labels = labels.join(best, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__new"), col("label")).as("label"))
      r += 1
      if (r % checkpointEvery == 0) labels = labels.localCheckpoint()
    }
    labels
  }

  /** Driver twin of the distributed round loop — identical mirror /
    * score / (score DESC, label ASC) argmax arithmetic over scala
    * maps; nodes with no best row keep their label (the left-join
    * coalesce). */
  private def communitiesDriver(edges: Seq[(Long, Long, Long)],
                                rounds: Int): Seq[(Long, Long)] = {
    val und = edges.flatMap(e =>
      Seq((e._1, e._2, e._3), (e._2, e._1, e._3)))
    val nodes = und.map(_._1).distinct
    var labels = nodes.map(n => n -> n).toMap
    for (_ <- 0 until rounds) {
      val scores = scala.collection.mutable.Map.empty[(Long, Long), Long]
      und.foreach { case (src, dst, w) =>
        val l = labels(dst)
        scores((src, l)) = scores.getOrElse((src, l), 0L) + w
      }
      val best = scores.toSeq.groupBy(_._1._1).map { case (n, rows) =>
        // lexicographic max over (s, -label): max score, tie → min label
        n -> rows.map { case ((_, l), s) => (s, -l) }.max._2 * -1L
      }
      labels = labels.map { case (n, l) => n -> best.getOrElse(n, l) }
    }
    labels.toSeq
  }

  /** DuckDB twin of [[communities]] — the fixed round count unrolled
    * into CTEs, identical mirror/score/argmax arithmetic. `edgesSql`
    * must select `(src, dst, w)` BIGINTs. */
  def sqlCommunities(edgesSql: String, rounds: Int): String = {
    val head = s"""
      WITH e0 AS ($edgesSql),
      und AS (SELECT src, dst, w FROM e0
              UNION ALL SELECT dst AS src, src AS dst, w FROM e0),
      nodes AS (SELECT DISTINCT src AS node FROM und),
      l0 AS (SELECT node, node AS label FROM nodes)"""
    val iters = (1 to rounds).map { i =>
      s"""
      s$i AS (SELECT u.src AS node, l.label,
                CAST(sum(u.w) AS BIGINT) AS s
              FROM und u JOIN l${i - 1} l ON u.dst = l.node
              GROUP BY 1, 2),
      b$i AS (SELECT node, max({'s': s, 'nl': -label}) AS m
              FROM s$i GROUP BY 1),
      l$i AS (SELECT p.node,
                CAST(COALESCE(-(b.m).nl, p.label) AS BIGINT) AS label
              FROM l${i - 1} p LEFT JOIN b$i b ON p.node = b.node)"""
    }.mkString(",")
    val chain = if (rounds > 0) s"$head,$iters" else head
    s"$chain SELECT node, label FROM l$rounds"
  }
}
