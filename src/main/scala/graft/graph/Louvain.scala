package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LOUVAIN ONE-LEVEL REFINEMENT — the modularity-IMPROVING member the
  * graph family was missing: [[LabelPropagation]] emits labels,
  * [[Modularity]] only SCORES them; this operator greedily moves
  * nodes between communities while the move's modularity gain is
  * positive (the local-move phase of Blondel et al. 2008 — one level,
  * no graph coarsening, which is where most of Louvain's Q gain
  * comes from on small-diameter graphs).
  *
  * Gain arithmetic, exact integers only: moving node i into community
  * c (after removal from its own) changes Q by
  *
  *   ΔQ ∝ score(c) = 2m·k_{i,c} − k_i·d_{c∖i}
  *
  * (k_{i,c} = i's edges into c, d_c = Σ degree of c's members, the
  * (2m²) denominator dropped as common). i moves to the argmax
  * candidate — neighbor communities ∪ its own — iff that score
  * STRICTLY beats staying (ties keep the current label; among equal
  * winners the SMALLEST label wins via the [[LabelPropagation]]
  * lexicographic struct-max). Everything is BIGINT, so a fixed sweep
  * count unrolls bit-exactly into the DuckDB oracle ([[sqlRefine]]).
  * Overflow bound: |2m·k_{i,c}| needs m·k < 4.6e18 — down-sample
  * degrees far above any corpus graph here.
  *
  * DETERMINISTIC PARALLEL SCHEDULE: classic Louvain is sequential
  * (order-dependent); a synchronous everyone-moves sweep can
  * oscillate two adjacent nodes past each other. Each sweep therefore
  * moves only nodes of one id-PARITY (even sweeps move even ids, odd
  * sweeps odd) — a fixed 2-coloring that keeps most move pairs
  * non-simultaneous and makes the schedule engine-independent. The
  * strict-gain rule + staggering give monotone Q on every fixture and
  * the trade graph (LouvainSpec pins Q ≥ label-prop's and Q ≥ the
  * input labeling's); the guarantee is EMPIRICAL, not structural —
  * same-parity adjacent moves can in principle interleave, which a
  * fixed-dataflow (oracle-able) variant cannot fully exclude.
  *
  * Scale shape: per sweep ONE edges⋈labels equi-join (k_{i,c} — the
  * only corpus-sized shuffle), one labels⋈degrees hash agg (d_c,
  * community-axis), one candidate-axis join + struct-argmax, one
  * #nodes-sized label update. Degrees and the mirrored edge list are
  * computed once and localCheckpoint'd; label lineage flattens per
  * sweep. No windows, no collect. */
object Louvain {

  /** Refine `labels(node, label)` over undirected distinct
    * `edges(a, b)` (a ≠ b; dedup'd — the [[Modularity]] input
    * convention) through `sweeps` parity-staggered local-move rounds.
    * Node ids must be non-negative integers (the parity schedule).
    * Returns `(node, label)` for every labeled node. */
  def refine(edges: DataFrame, labels: DataFrame, sweeps: Int): DataFrame = {
    require(sweeps >= 1, "sweeps must be >= 1")
    val e = edges.select(col("a").cast("bigint").as("a"),
      col("b").cast("bigint").as("b")).localCheckpoint()
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    val deg = sym.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("k")).localCheckpoint()
    val m = e.count()
    require(m > 0, "louvain over an empty edge set")
    var lab = labels.select(col("node").cast("bigint").as("node"),
      col("label").cast("bigint").as("label")).localCheckpoint()
    for (sweep <- 0 until sweeps) {
      val parity = sweep % 2
      // community degree sums under the current labeling
      val dC = lab.join(deg, "node")
        .groupBy(col("label").as("c")).agg(sum(col("k")).as("dc"))
      // i's edge count into each neighbor community
      val kic = sym
        .join(lab.select(col("node").as("dst0"), col("label").as("c")),
          col("b") === col("dst0"))
        .groupBy(col("a").as("node"), col("c"))
        .agg(count(lit(1)).as("kic"))
      // candidates = neighbor communities ∪ own (kic 0 when unlinked)
      val cand = kic
        .unionByName(lab.select(col("node"), col("label").as("c"),
          lit(0L).as("kic")))
        .groupBy(col("node"), col("c")).agg(max(col("kic")).as("kic"))
      val scored = cand
        .join(lab.select(col("node"), col("label").as("cur")), "node")
        .join(deg, "node")
        .join(dC, "c")
        .select(col("node"), col("c"), col("cur"),
          (lit(2L * m) * col("kic") - col("k") *
            (col("dc") - when(col("c") === col("cur"), col("k"))
              .otherwise(lit(0L)))).as("score"))
      val best = scored.groupBy(col("node"))
        .agg(max(struct(col("score").as("s"), (-col("c")).as("nl")))
            .as("__m"),
          max(when(col("c") === col("cur"), col("score"))).as("__curs"))
        .select(col("node"), (-col("__m.nl")).as("__best"),
          col("__m.s").as("__bs"), col("__curs"))
      lab = lab.join(best, Seq("node"), "left")
        .select(col("node"),
          when(((col("node") % 2) + 2) % 2 === parity &&
              col("__bs") > col("__curs"), col("__best"))
            .otherwise(col("label")).as("label"))
        .localCheckpoint()
    }
    lab
  }

  /** DuckDB twin of [[refine]] — the fixed sweeps unrolled as CTEs,
    * identical candidate/score/argmax arithmetic. `edgesSql` must
    * select distinct undirected `(a, b)`; `labelsSql` → `(node,
    * label)` BIGINTs. */
  def sqlRefine(edgesSql: String, labelsSql: String, sweeps: Int): String = {
    require(sweeps >= 1)
    val head = s"""
      WITH e AS MATERIALIZED ($edgesSql),
      sym AS MATERIALIZED (SELECT a, b FROM e UNION ALL SELECT b AS a, a AS b FROM e),
      deg AS MATERIALIZED (SELECT a AS node, CAST(count(*) AS BIGINT) AS k
              FROM sym GROUP BY a),
      mm AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
      l0 AS MATERIALIZED (SELECT CAST(node AS BIGINT) AS node,
                    CAST(label AS BIGINT) AS label FROM ($labelsSql))"""
    val iters = (0 until sweeps).map { i =>
      val p = i % 2
      val j = i + 1
      s"""
      dc$j AS MATERIALIZED (SELECT l.label AS c, CAST(sum(d.k) AS BIGINT) AS dc
               FROM l$i l JOIN deg d ON l.node = d.node GROUP BY 1),
      kic$j AS MATERIALIZED (SELECT s.a AS node, lb.label AS c,
                  CAST(count(*) AS BIGINT) AS kic
                FROM sym s JOIN l$i lb ON s.b = lb.node GROUP BY 1, 2),
      cand$j AS MATERIALIZED (SELECT node, c, CAST(max(kic) AS BIGINT) AS kic FROM (
                   SELECT node, c, kic FROM kic$j
                   UNION ALL
                   SELECT node, label AS c, CAST(0 AS BIGINT) FROM l$i)
                 GROUP BY node, c),
      sc$j AS MATERIALIZED (SELECT cd.node, cd.c, cur.label AS cur,
                 2 * mm.m * cd.kic - d.k * (dc$j.dc -
                   CASE WHEN cd.c = cur.label THEN d.k ELSE 0 END) AS score
               FROM cand$j cd
               JOIN l$i cur ON cd.node = cur.node
               JOIN deg d ON cd.node = d.node
               JOIN dc$j ON cd.c = dc$j.c
               CROSS JOIN mm),
      b$j AS MATERIALIZED (SELECT node, max({'s': score, 'nl': -c}) AS mb,
                max(CASE WHEN c = cur THEN score END) AS curs
              FROM sc$j GROUP BY node),
      l$j AS MATERIALIZED (SELECT cur.node,
                CAST(CASE WHEN ((cur.node % 2) + 2) % 2 = $p
                            AND (b$j.mb).s > b$j.curs
                     THEN -(b$j.mb).nl ELSE cur.label END AS BIGINT) AS label
              FROM l$i cur LEFT JOIN b$j ON cur.node = b$j.node)"""
    }.mkString(",")
    s"$head,$iters SELECT node, label FROM l$sweeps"
  }
}
