package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** ZIPF'S-LAW FIT — the corpus-health diagnostic behind "does this
  * crawl slice look like natural language": natural text follows
  * freq ∝ rank^(−s) with s ≈ 1; heavy boilerplate/duplication bends
  * the curve (|slope| drifts up, R² drops), machine-generated token
  * soup flattens it. One number pair (slope, R²) per corpus slice,
  * read next to the vocab-drift and repetition rows before a training
  * mix is signed off.
  *
  * Fit: OLS of ln(freq) on ln(rank) over the top-`n` terms. Ranking
  * by (count desc, term) is a total order; each per-term product
  * (x, y, xy, x²,…) is rounded to 6 dp into DECIMAL(18,6) before the
  * sum — the repo's standard exact, order-insensitive fold — and the
  * closed-form slope/intercept/R² are one fixed double sequence from
  * those exact sums. Scale shape: one tokenize scan + a term hash
  * agg; the rank window and the fit run over the top-`n` TERM axis
  * (model-sized), never corpus rows. */
object ZipfFit {

  /** One row: `(n_terms, slope (6dp), intercept (6dp), r2 (6dp))`. */
  def fit(docs: DataFrame, textCol: String, topN: Int = 500): DataFrame = {
    require(topN >= 3)
    import org.apache.spark.sql.expressions.Window
    val counts = docs.select(
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("c"))
    val wRank = Window.orderBy(col("c").desc, col("term"))
    def d6(c: Column) = round(c, 6).cast("decimal(18,6)")
    val ranked = counts
      .withColumn("r", row_number().over(wRank).cast("bigint"))
      .filter(col("r") <= topN)
      .withColumn("x", log(col("r").cast("double")))
      .withColumn("y", log(col("c").cast("double")))
    val sums = ranked.agg(
      count(lit(1)).as("n_terms"),
      sum(d6(col("x"))).as("sx"), sum(d6(col("y"))).as("sy"),
      sum(d6(col("x") * col("y"))).as("sxy"),
      sum(d6(col("x") * col("x"))).as("sxx"),
      sum(d6(col("y") * col("y"))).as("syy"))
    def d(c: Column) = c.cast("double")
    val n = d(col("n_terms"))
    val covN = n * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val varXN = n * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val varYN = n * d(col("syy")) - d(col("sy")) * d(col("sy"))
    // uniform counts make varYN exactly 0 (identical rounded y's fold
    // to n²y² − n²y²) — guard the 0/0 to 0 rather than NaN
    val slope = when(varXN === 0, lit(0.0)).otherwise(covN / varXN)
    val intercept = (d(col("sy")) - slope * d(col("sx"))) / n
    val r2 = when(varXN === 0 || varYN === 0, lit(0.0))
      .otherwise(covN * covN / (varXN * varYN))
    sums.select(col("n_terms"), round(slope, 6).as("slope"),
      round(intercept, 6).as("intercept"), round(r2, 6).as("r2"))
  }

  /** DuckDB twin of [[fit]]: `docsSql` must select `toks` (token
    * list). */
  def sqlFit(docsSql: String, topN: Int = 500): String = {
    def d(c: String) = s"CAST($c AS DOUBLE)"
    def d6(e: String) = s"CAST(round($e, 6) AS DECIMAL(18,6))"
    val n = d("n_terms")
    val covN = s"($n * ${d("sxy")} - ${d("sx")} * ${d("sy")})"
    val varXN = s"($n * ${d("sxx")} - ${d("sx")} * ${d("sx")})"
    val varYN = s"($n * ${d("syy")} - ${d("sy")} * ${d("sy")})"
    val slope = s"(CASE WHEN $varXN = 0 THEN 0.0e0 ELSE $covN / $varXN END)"
    s"""
    WITH cnts AS (
      SELECT term, CAST(count(*) AS BIGINT) AS c FROM (
        SELECT unnest(toks) AS term FROM ($docsSql))
      GROUP BY term
    ), ranked AS (
      SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
      FROM (SELECT c, CAST(row_number() OVER (ORDER BY c DESC, term)
              AS BIGINT) AS r
            FROM cnts)
      WHERE r <= $topN
    ), sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n_terms,
        sum(${d6("x")}) AS sx, sum(${d6("y")}) AS sy,
        sum(${d6("x * y")}) AS sxy, sum(${d6("x * x")}) AS sxx,
        sum(${d6("y * y")}) AS syy
      FROM ranked)
    SELECT n_terms, round($slope, 6) AS slope,
      round((${d("sy")} - $slope * ${d("sx")}) / $n, 6) AS intercept,
      round(CASE WHEN $varXN = 0 OR $varYN = 0 THEN 0.0e0
        ELSE $covN * $covN / ($varXN * $varYN) END, 6) AS r2
    FROM sums"""
  }

  /** HEAPS' LAW FIT — the companion corpus-health law to [[fit]]:
    * vocabulary grows as V(N) ≈ k·N^β with β ≈ 0.4–0.6 for natural
    * text. A β near 1 means the vocabulary never saturates (token
    * soup / unique-ID contamination); β near 0 means near-total
    * repetition (boilerplate). Read together with the Zipf slope
    * before signing off a training mix.
    *
    * "Arrival order" is doc-id order — but NO global ordering is ever
    * materialized: a term's first arrival is simply `min(doc_id)` (a
    * hash agg), the corpus-prefix checkpoints are `points` exact
    * percentiles of the doc-id axis, and each checkpoint's token count
    * N_i / vocab size V_i is a conditional aggregate against the
    * broadcast 16-row cut axis. OLS of ln V on ln N then runs over
    * the checkpoint axis with the same 6-dp decimal product folds as
    * [[fit]]. Duplicate checkpoints (sparse doc-id gaps) collapse via
    * DISTINCT on the (n, v) pair.
    *
    * Scale: two hash aggregates over the token stream (term → first
    * arrival, doc → token count) + one exact percentile over the DOC
    * axis; the quadratic-free shape holds at any corpus size. Output
    * one row: `(n_points, beta (6dp), ln_k (6dp), r2 (6dp))`. */
  def heapsFit(docs: DataFrame, idCol: String, textCol: String,
               points: Int = 16): DataFrame = {
    require(points >= 3)
    val ps = (1 to points).map(i => i.toDouble / points)
    val toks = docs.select(col(idCol).cast("bigint").as("__id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val firstSeen = toks.groupBy(col("term"))
      .agg(min(col("__id")).as("__fs"))
    val docTok = toks.groupBy(col("__id")).agg(count(lit(1)).as("__dn"))
    val cuts = docs
      .select(col(idCol).cast("bigint").as("__id"))
      .agg(expr(s"percentile(__id, array(${ps.mkString(", ")}))").as("__cs"))
      .select(posexplode(col("__cs")))
      .toDF("__i", "__cut")
    val vs = firstSeen.crossJoin(broadcast(cuts))
      .filter(col("__fs").cast("double") <= col("__cut"))
      .groupBy(col("__i")).agg(count(lit(1)).as("__v"))
    val ns = docTok.crossJoin(broadcast(cuts))
      .filter(col("__id").cast("double") <= col("__cut"))
      .groupBy(col("__i")).agg(sum(col("__dn")).as("__n"))
    def d6(c: Column) = round(c, 6).cast("decimal(18,6)")
    val pts = vs.join(ns, "__i")
      .select(col("__n"), col("__v")).distinct()
      .withColumn("x", log(col("__n").cast("double")))
      .withColumn("y", log(col("__v").cast("double")))
    val sums = pts.agg(
      count(lit(1)).as("n_points"),
      sum(d6(col("x"))).as("sx"), sum(d6(col("y"))).as("sy"),
      sum(d6(col("x") * col("y"))).as("sxy"),
      sum(d6(col("x") * col("x"))).as("sxx"),
      sum(d6(col("y") * col("y"))).as("syy"))
    def d(c: Column) = c.cast("double")
    val n = d(col("n_points"))
    val covN = n * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val varXN = n * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val varYN = n * d(col("syy")) - d(col("sy")) * d(col("sy"))
    val beta = when(varXN === 0, lit(0.0)).otherwise(covN / varXN)
    val lnK = (d(col("sy")) - beta * d(col("sx"))) / n
    val r2 = when(varXN === 0 || varYN === 0, lit(0.0))
      .otherwise(covN * covN / (varXN * varYN))
    sums.select(col("n_points"), round(beta, 6).as("beta"),
      round(lnK, 6).as("ln_k"), round(r2, 6).as("r2"))
  }

  /** DuckDB twin of [[heapsFit]]: `docsSql` must select `(id, toks)`. */
  def sqlHeapsFit(docsSql: String, points: Int = 16): String = {
    require(points >= 3)
    val ps = (1 to points).map(i => i.toDouble / points)
    def d(c: String) = s"CAST($c AS DOUBLE)"
    def d6(e: String) = s"CAST(round($e, 6) AS DECIMAL(18,6))"
    val n = d("n_points")
    val covN = s"($n * ${d("sxy")} - ${d("sx")} * ${d("sy")})"
    val varXN = s"($n * ${d("sxx")} - ${d("sx")} * ${d("sx")})"
    val varYN = s"($n * ${d("syy")} - ${d("sy")} * ${d("sy")})"
    val beta = s"(CASE WHEN $varXN = 0 THEN 0.0e0 ELSE $covN / $varXN END)"
    s"""
    WITH d0 AS ($docsSql),
    toks AS (SELECT id, unnest(toks) AS term FROM d0),
    fs AS (SELECT term, min(id) AS f FROM toks GROUP BY term),
    dt AS (SELECT id, CAST(count(*) AS BIGINT) AS dn FROM toks GROUP BY id),
    cuts AS (
      SELECT unnest(qs) AS cut FROM (
        SELECT quantile_cont(id, [${ps.mkString(", ")}]) AS qs FROM d0)
    ), vs AS (
      SELECT cut, CAST(count(*) AS BIGINT) AS v
      FROM fs CROSS JOIN cuts WHERE CAST(f AS DOUBLE) <= cut GROUP BY cut
    ), ns AS (
      SELECT cut, CAST(sum(dn) AS BIGINT) AS nt
      FROM dt CROSS JOIN cuts WHERE CAST(id AS DOUBLE) <= cut GROUP BY cut
    ), pts AS (
      SELECT DISTINCT ln(${d("nt")}) AS x, ln(${d("v")}) AS y
      FROM (SELECT DISTINCT ns.nt, vs.v FROM vs JOIN ns USING (cut))
    ), sums AS (
      SELECT CAST(count(*) AS BIGINT) AS n_points,
        sum(${d6("x")}) AS sx, sum(${d6("y")}) AS sy,
        sum(${d6("x * y")}) AS sxy, sum(${d6("x * x")}) AS sxx,
        sum(${d6("y * y")}) AS syy
      FROM pts)
    SELECT n_points, round($beta, 6) AS beta,
      round((${d("sy")} - $beta * ${d("sx")}) / $n, 6) AS ln_k,
      round(CASE WHEN $varXN = 0 OR $varYN = 0 THEN 0.0e0
        ELSE $covN * $covN / ($varXN * $varYN) END, 6) AS r2
    FROM sums"""
  }
}
