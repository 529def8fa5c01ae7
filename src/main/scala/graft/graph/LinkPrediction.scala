package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** LINK PREDICTION — score non-adjacent node pairs by shared
  * neighborhood: common-neighbor count and Adamic–Adar
  *
  *   AA(u,v) = Σ_{z ∈ N(u) ∩ N(v)} 1/ln(deg z)
  *
  * (Adamic & Adar 2003) — the standard "which edge forms next" /
  * "which items should co-sell" readout over the same co-occurrence
  * graphs the triangle and community operators consume. The 1/ln
  * weight is the whole point: a shared niche neighbor (deg 3) is
  * strong evidence, a shared hub (deg 10⁵) is nearly none.
  *
  * Scale shape (100 TB): wedge enumeration through the CENTER node —
  * join the neighbor list with itself on z — materializes Σ deg(z)²
  * rows, the hub explosion every naive wedge query dies of; `maxDeg`
  * caps it by excluding hub CENTERS from wedge generation (documented
  * semantics: common neighbors of degree > maxDeg contribute nothing
  * — under the 1/ln weight they contributed ≤ 1/ln(maxDeg) anyway).
  * After the cap: one degree agg, one self-join bounded by
  * Σ_{deg≤cap} deg² ≤ maxDeg·E, a pair hash agg, an anti-join against
  * existing edges, and a sort+limit top-k. No windows over the corpus
  * axis, nothing quadratic in nodes.
  *
  * Determinism (bit-exact oracle): each wedge's weight is quantized
  * to the 1e-9 integer grid (floor-portable), so per-pair sums are
  * exact BIGINTs — immune to summation order in both engines — and
  * the top-k ranks on (exact sum desc, u, v), a total order. */
object LinkPrediction {

  /** Top-`k` non-adjacent pairs by Adamic–Adar over undirected edges
    * `(a, b)` (a < b, deduplicated — [[Triangles.coOccurrenceEdges]]'
    * shape). Output: `(u, v, cn, aa (6 dp), rank)`. */
  def adamicAdar(edges: DataFrame, k: Int = 50, maxDeg: Int = 1000):
      DataFrame = {
    require(k >= 1 && maxDeg >= 2)
    val nbr = edges.select(col("a").as("z"), col("b").as("x"))
      .union(edges.select(col("b").as("z"), col("a").as("x")))
    val deg = nbr.groupBy(col("z")).agg(count(lit(1)).as("__deg"))
    // deg-1 nodes can't center a wedge; excluding them also keeps the
    // 1/ln(deg) weight finite before the self-join evaluates it
    val centered = nbr.join(deg, "z")
      .filter(col("__deg") >= 2 && col("__deg") <= maxDeg)
    val w = floor(lit(1e9) / log(col("__deg").cast("double")) + lit(0.5))
      .cast("bigint")
    val wedges = centered
      .select(col("z"), col("x").as("u"), w.as("__w"))
      .join(centered.select(col("z"), col("x").as("v")), "z")
      .filter(col("u") < col("v"))
    val scored = wedges.groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("cn"), sum(col("__w")).as("__aa"))
      .join(edges, col("u") === col("a") && col("v") === col("b"),
        "left_anti")
    import org.apache.spark.sql.expressions.Window
    val ranked = scored
      .orderBy(col("__aa").desc, col("u"), col("v")).limit(k)
    ranked
      .withColumn("rank", row_number().over(
        Window.orderBy(col("__aa").desc, col("u"), col("v")))
        .cast("bigint"))
      .select(col("u"), col("v"), col("cn"),
        round(col("__aa").cast("double") / lit(1e9), 6).as("aa"),
        col("rank"))
  }

  /** DuckDB twin of [[adamicAdar]]: `edgesSql` must select `(a, b)`
    * with a < b, deduplicated. */
  def sqlAdamicAdar(edgesSql: String, k: Int = 50, maxDeg: Int = 1000):
      String = s"""
    WITH e AS ($edgesSql), nbr AS (
      SELECT a AS z, b AS x FROM e UNION ALL SELECT b AS z, a AS x FROM e
    ), deg AS (
      SELECT z, CAST(count(*) AS BIGINT) AS dg FROM nbr GROUP BY z
    ), centered AS (
      SELECT nbr.z, nbr.x,
        CAST(floor(1e9 / ln(CAST(dg AS DOUBLE)) + 0.5e0) AS BIGINT) AS w
      FROM nbr JOIN deg ON nbr.z = deg.z WHERE dg >= 2 AND dg <= $maxDeg
    ), wedges AS (
      SELECT c1.x AS u, c2.x AS v, c1.w
      FROM centered c1 JOIN centered c2 ON c1.z = c2.z AND c1.x < c2.x
    ), scored AS (
      SELECT u, v, CAST(count(*) AS BIGINT) AS cn, sum(w) AS aa9
      FROM wedges GROUP BY u, v
    ), nonadj AS (
      SELECT s.* FROM scored s
      WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.a = s.u AND e.b = s.v)
    ), ranked AS (
      SELECT u, v, cn, round(CAST(aa9 AS DOUBLE) / 1e9, 6) AS aa,
        CAST(row_number() OVER (ORDER BY aa9 DESC, u, v) AS BIGINT) AS rank
      FROM nonadj)
    SELECT * FROM ranked WHERE rank <= $k"""
}
