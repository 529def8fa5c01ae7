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
}
