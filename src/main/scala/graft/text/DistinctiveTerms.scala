package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DISTINCTIVE TERMS per group — "what vocabulary sets this source /
  * language / domain apart from the rest of the corpus": the weighted
  * log-odds-ratio with an informative Dirichlet prior (Monroe,
  * Colaresi & Quinn 2008, "Fightin' Words"), the published fix for
  * both raw-count ranking (dominated by stopwords) and plain TF-IDF
  * (dominated by one-off rare terms). For term w in group g vs the
  * REST of the corpus r:
  *
  *   α_w = α₀·c_w/N          (prior mass ∝ corpus frequency)
  *   δ = ln((y_g+α_w)/(n_g+α₀−y_g−α_w)) − ln((y_r+α_w)/(n_r+α₀−y_r−α_w))
  *   z = δ / √(1/(y_g+α_w) + 1/(y_r+α_w))
  *
  * The prior shrinks rare-term odds toward the corpus rate, so a term
  * must be both FREQUENT and SKEWED to score — exactly the corpus-
  * curation question ("which tokens mark this crawl source as
  * boilerplate?").
  *
  * Determinism & scale: one tokenize+explode scan, a (group, term)
  * hash agg, a term-totals equi-join (vocabulary-sized), group totals
  * broadcast; every z is one fixed IEEE sequence from exact BIGINT
  * counts (the lns are BM25's libm-1-ulp class, unobservable under
  * the 6-dp round), and the per-group top-k ranks over the VOCABULARY
  * axis, not corpus rows. Terms are ranked by the raw double (ties by
  * term) so both engines cut the same top-k. Only terms OCCURRING in
  * the group are scored (y_g ≥ 1, documented). */
object DistinctiveTerms {

  /** Top-`k` distinctive terms per `groupCol`. Output: `(groupCol,
    * term, y_g, z (6dp), rank)`. */
  def distinctiveTerms(docs: DataFrame, groupCol: String, textCol: String,
                       k: Int = 10, alpha0: Double = 100.0): DataFrame = {
    require(k >= 1 && alpha0 > 0)
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col(groupCol).as("g"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val byGT = toks.groupBy(col("g"), col("term"))
      .agg(count(lit(1)).as("y_g"))
    val byT = byGT.groupBy(col("term")).agg(sum(col("y_g")).as("c_w"))
    val byG = byGT.groupBy(col("g")).agg(sum(col("y_g")).as("n_g"))
    val grand = byG.agg(sum(col("n_g")).as("n_tot"))
    def d(c: Column) = c.cast("double")
    val aw = lit(alpha0) * d(col("c_w")) / d(col("n_tot"))
    val yr = d(col("c_w")) - d(col("y_g"))
    val nr = d(col("n_tot")) - d(col("n_g"))
    val num1 = d(col("y_g")) + aw
    val den1 = d(col("n_g")) + lit(alpha0) - d(col("y_g")) - aw
    val num2 = yr + aw
    val den2 = nr + lit(alpha0) - yr - aw
    val delta = log(num1 / den1) - log(num2 / den2)
    val z = delta / sqrt(lit(1.0) / num1 + lit(1.0) / num2)
    val wRank = Window.partitionBy(col("g"))
      .orderBy(col("__z").desc, col("term"))
    byGT.join(byT, "term")
      .join(broadcast(byG), "g")
      .crossJoin(broadcast(grand))
      .withColumn("__z", z)
      .withColumn("rank", row_number().over(wRank).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("g").as(groupCol), col("term"), col("y_g"),
        round(col("__z"), 6).as("z"), col("rank"))
  }

  /** DuckDB twin of [[distinctiveTerms]]: `docsSql` must select
    * `(g, toks)` with `toks` the token list. */
  def sqlDistinctiveTerms(docsSql: String, groupOut: String,
                          k: Int = 10, alpha0: Double = 100.0): String = {
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val aw = s"($alpha0 * ${d("c_w")} / ${d("n_tot")})"
    val yr = s"(${d("c_w")} - ${d("y_g")})"
    val nr = s"(${d("n_tot")} - ${d("n_g")})"
    val num1 = s"(${d("y_g")} + $aw)"
    val den1 = s"(${d("n_g")} + $alpha0 - ${d("y_g")} - $aw)"
    val num2 = s"($yr + $aw)"
    val den2 = s"($nr + $alpha0 - $yr - $aw)"
    val z = s"""((ln($num1 / $den1) - ln($num2 / $den2))
      / sqrt(1.0e0 / $num1 + 1.0e0 / $num2))"""
    s"""
    WITH tk AS (
      SELECT g, unnest(toks) AS term FROM ($docsSql)
    ), bygt AS (
      SELECT g, term, CAST(count(*) AS BIGINT) AS y_g
      FROM tk GROUP BY g, term
    ), byt AS (
      SELECT term, CAST(sum(y_g) AS BIGINT) AS c_w FROM bygt GROUP BY term
    ), byg AS (
      SELECT g, CAST(sum(y_g) AS BIGINT) AS n_g FROM bygt GROUP BY g
    ), grand AS (
      SELECT CAST(sum(n_g) AS BIGINT) AS n_tot FROM byg
    ), scored AS (
      SELECT g, term, y_g, $z AS zr
      FROM bygt JOIN byt USING (term) JOIN byg USING (g), grand
    ), ranked AS (
      SELECT g, term, y_g, zr,
        CAST(row_number() OVER (PARTITION BY g
          ORDER BY zr DESC, term) AS BIGINT) AS rank
      FROM scored)
    SELECT g AS $groupOut, term, y_g, round(zr, 6) AS z, rank
    FROM ranked WHERE rank <= $k"""
  }
}
