package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MODULARITY — the number that says whether a community partition
  * MEANS anything:
  *
  *   Q = Σ_c [ m_c/m − (d_c/2m)² ]
  *
  * (Newman–Girvan) — each community's within-edge share minus the
  * share a degree-preserving random graph would give it by luck.
  * Q ≈ 0: the "communities" are noise; Q ≳ 0.3: real structure. The
  * quality gate over [[LabelPropagation]]'s output (LPA happily emits
  * labels on structureless graphs — this is the read that says
  * whether to believe them), and the objective Louvain-style methods
  * climb.
  *
  * Determinism/scale: m, m_c, d_c are exact integer aggregates (one
  * edge scan joined to the node→label map on both endpoints, one
  * degree agg); each community's contribution is one fixed IEEE
  * sequence quantized to the 1e-9 grid so the total is an exact
  * BIGINT sum — order-free in both engines. Output one row per
  * community `(label, n_nodes, m_within, d_total, q_contrib (6dp))`
  * plus the `label = -1` TOTAL row (the silhouette convention). */
object Modularity {

  /** `edges(a, b)` undirected (a < b, dedup'd); `labels(node, label)`
    * with label integral. Unlabeled endpoints are excluded from both
    * m and the community sums (document upstream coverage). */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val la = labels.select(col("node").as("a"), col("label").as("__la"))
    val lb = labels.select(col("node").as("b"), col("label").as("__lb"))
    // materialized once: tagged is consumed by the m count, the
    // within-community histogram AND both sides of the degree union —
    // unchecked, the edges⋈labels⋈labels subtree executed up to 6×
    // inside one plan (d108's executed plan read 121 Exchanges). The
    // count() below was already a full materialization of the subtree;
    // the checkpoint makes it the ONLY one.
    val tagged = edges.join(la, "a").join(lb, "b").localCheckpoint()
    val m = tagged.count()
    require(m > 0, "modularity over an empty labeled edge set")
    val within = tagged.filter(col("__la") === col("__lb"))
      .groupBy(col("__la").as("label"))
      .agg(count(lit(1)).as("m_within"))
    val deg = tagged.select(col("a").as("node"), col("__la").as("label"))
      .union(tagged.select(col("b").as("node"), col("__lb").as("label")))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("d_total"),
        countDistinct(col("node")).as("n_nodes"))
    def d(c: Column) = c.cast("double")
    val md = lit(m.toDouble)
    val q = d(col("m_within")) / md -
      (d(col("d_total")) / (lit(2.0) * md)) *
        (d(col("d_total")) / (lit(2.0) * md))
    // community-axis frame, referenced by the per-community output AND
    // the total row — materialized so the aggregation subtree runs once
    val perC = deg.join(within, Seq("label"), "left")
      .select(col("label"), col("n_nodes"),
        coalesce(col("m_within"), lit(0L)).as("m_within"),
        col("d_total"),
        floor((d(coalesce(col("m_within"), lit(0L))) / md -
          (d(col("d_total")) / (lit(2.0) * md)) *
            (d(col("d_total")) / (lit(2.0) * md))) * lit(1e9) + lit(0.5))
          .cast("bigint").as("__q9"))
      .localCheckpoint()
    val total = perC.agg(sum(col("n_nodes")).as("n_nodes"),
      sum(col("m_within")).as("m_within"),
      sum(col("d_total")).as("d_total"),
      sum(col("__q9")).as("__q9"))
      .select(lit(-1L).as("label"), col("n_nodes"), col("m_within"),
        col("d_total"), col("__q9"))
    perC.select(col("label"), col("n_nodes"), col("m_within"),
        col("d_total"), col("__q9"))
      .union(total)
      .select(col("label"), col("n_nodes"), col("m_within"),
        col("d_total"),
        round(col("__q9").cast("double") / lit(1e9), 6).as("q_contrib"))
  }

  /** DuckDB twin of [[modularity]]: `edgesSql` → `(a, b)`,
    * `labelsSql` → `(node, label)`. */
  def sqlModularity(edgesSql: String, labelsSql: String): String = s"""
    WITH e AS ($edgesSql), lab AS ($labelsSql),
    tagged AS (
      SELECT e.a, e.b, la.label AS la, lb.label AS lb
      FROM e JOIN lab la ON e.a = la.node JOIN lab lb ON e.b = lb.node
    ), m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM tagged),
    win AS (
      SELECT la AS label, CAST(count(*) AS BIGINT) AS m_within
      FROM tagged WHERE la = lb GROUP BY la
    ), deg AS (
      SELECT label, CAST(count(*) AS BIGINT) AS d_total,
        CAST(count(DISTINCT node) AS BIGINT) AS n_nodes
      FROM (SELECT a AS node, la AS label FROM tagged
            UNION ALL SELECT b AS node, lb AS label FROM tagged)
      GROUP BY label
    ), perc AS (
      SELECT deg.label, deg.n_nodes,
        coalesce(win.m_within, 0) AS m_within, deg.d_total,
        CAST(floor((CAST(coalesce(win.m_within, 0) AS DOUBLE)
            / CAST(m.m AS DOUBLE)
          - (CAST(deg.d_total AS DOUBLE) / (2.0e0 * CAST(m.m AS DOUBLE)))
            * (CAST(deg.d_total AS DOUBLE)
               / (2.0e0 * CAST(m.m AS DOUBLE)))) * 1e9 + 0.5e0)
          AS BIGINT) AS q9
      FROM deg LEFT JOIN win USING (label), m)
    SELECT label, n_nodes, m_within, d_total,
      round(CAST(q9 AS DOUBLE) / 1e9, 6) AS q_contrib
    FROM perc
    UNION ALL
    SELECT CAST(-1 AS BIGINT) AS label, CAST(sum(n_nodes) AS BIGINT),
      CAST(sum(m_within) AS BIGINT), CAST(sum(d_total) AS BIGINT),
      round(CAST(sum(q9) AS DOUBLE) / 1e9, 6)
    FROM perc"""
}
