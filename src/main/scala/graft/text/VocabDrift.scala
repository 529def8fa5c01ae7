package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** VOCABULARY DRIFT — the text-side monitoring between two corpus
  * drops ([[graft.operators.ColumnProfile.drift]] watches columns;
  * this watches the LANGUAGE): compare the document-frequency
  * distributions of two corpora and report new/vanished terms plus the
  * Jensen–Shannon divergence of the df distributions — the standard
  * "did the crawl change under us" alarm before a model retrain.
  *
  * Determinism: df counts are exact integers; probabilities and the
  * JS contributions are one FIXED double-op sequence per term; each
  * term's contribution is rounded to the 12-dp grid and summed as
  * DECIMAL, so the total is addition-order-insensitive — partial
  * aggregation and DuckDB's single-threaded sum agree bit-for-bit
  * (the repo-standard recipe; a raw double Σ over thousands of terms
  * would drift past the oracle tolerance on reorder alone).
  *
  * Scale shape: two tokenize+aggregate passes (term df is a hash agg
  * with map-side partials — vocabulary-sized results), one
  * vocabulary-sized full-outer join, a 1-row summary. The corpora are
  * scanned once each; nothing corpus-sized survives the df agg.
  */
object VocabDrift {

  /** Per-term document frequency. */
  private def df(corpus: DataFrame, idCol: String, textCol: String) =
    corpus.select(col(idCol).as("__d"),
        explode(TextFunctions.tokens(col(textCol))).as("term"))
      .distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("df"))

  /** One-row drift summary: `n_terms_prev, n_terms_cur, n_new,
    * n_vanished, js_divergence` (6-dp; 0 ≤ JS ≤ ln 2). */
  def summary(cur: DataFrame, prev: DataFrame, idCol: String,
              textCol: String): DataFrame = {
    val c = df(cur, idCol, textCol)
      .select(col("term"), col("df").as("df_c"))
    val p = df(prev, idCol, textCol)
      .select(col("term").as("__tp"), col("df").as("df_p"))
    val joined = c.join(p, col("term") === col("__tp"), "full_outer")
    val totals = joined.agg(
      sum(col("df_c")).as("tot_c"), sum(col("df_p")).as("tot_p"))
    val pr = col("df_p").cast("double") / col("tot_p").cast("double")
    val qr = col("df_c").cast("double") / col("tot_c").cast("double")
    val m = (coalesce(pr, lit(0.0)) + coalesce(qr, lit(0.0))) / lit(2.0)
    val plTerm = when(col("df_p").isNotNull, pr * log(pr / m)).otherwise(lit(0.0))
    val qlTerm = when(col("df_c").isNotNull, qr * log(qr / m)).otherwise(lit(0.0))
    val contrib = round(lit(0.5) * (plTerm + qlTerm), 12)
      .cast("decimal(32,12)")
    joined.crossJoin(broadcast(totals))
      .agg(
        count(col("df_p")).as("n_terms_prev"),
        count(col("df_c")).as("n_terms_cur"),
        count(when(col("df_p").isNull, lit(1))).as("n_new"),
        count(when(col("df_c").isNull, lit(1))).as("n_vanished"),
        round(sum(contrib).cast("double"), 6).as("js_divergence"))
  }

  /** DuckDB twin of [[summary]] — same token split, same op order,
    * same 12-dp contribution grid. `curSql`/`prevSql` must select
    * `(doc_id, text)`. */
  def sql(curSql: String, prevSql: String): String = {
    val toks = "list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)"
    def dfOf(src: String) = s"""
      SELECT term, count(*) AS df FROM (
        SELECT DISTINCT doc_id, unnest($toks) AS term FROM ($src))
      GROUP BY term"""
    s"""
    WITH dc AS (${dfOf(curSql)}), dp AS (${dfOf(prevSql)}),
    j AS (
      SELECT coalesce(dc.term, dp.term) AS term, dc.df AS df_c, dp.df AS df_p
      FROM dc FULL OUTER JOIN dp ON dc.term = dp.term
    ), t AS (
      SELECT sum(df_c) AS tot_c, sum(df_p) AS tot_p FROM j
    ), k AS (
      SELECT j.df_p, j.df_c,
        CAST(round(5.0e-1 * (
          (CASE WHEN j.df_p IS NOT NULL THEN
            (CAST(j.df_p AS DOUBLE) / CAST(t.tot_p AS DOUBLE))
            * ln((CAST(j.df_p AS DOUBLE) / CAST(t.tot_p AS DOUBLE))
              / ((coalesce(CAST(j.df_p AS DOUBLE) / CAST(t.tot_p AS DOUBLE), 0.0e0)
                + coalesce(CAST(j.df_c AS DOUBLE) / CAST(t.tot_c AS DOUBLE), 0.0e0))
                / 2.0e0))
           ELSE 0.0e0 END)
          + (CASE WHEN j.df_c IS NOT NULL THEN
            (CAST(j.df_c AS DOUBLE) / CAST(t.tot_c AS DOUBLE))
            * ln((CAST(j.df_c AS DOUBLE) / CAST(t.tot_c AS DOUBLE))
              / ((coalesce(CAST(j.df_p AS DOUBLE) / CAST(t.tot_p AS DOUBLE), 0.0e0)
                + coalesce(CAST(j.df_c AS DOUBLE) / CAST(t.tot_c AS DOUBLE), 0.0e0))
                / 2.0e0))
           ELSE 0.0e0 END)), 12) AS DECIMAL(32,12)) AS contrib
      FROM j CROSS JOIN t)
    SELECT
      CAST(count(df_p) AS BIGINT) AS n_terms_prev,
      CAST(count(df_c) AS BIGINT) AS n_terms_cur,
      CAST(count(CASE WHEN df_p IS NULL THEN 1 END) AS BIGINT) AS n_new,
      CAST(count(CASE WHEN df_c IS NULL THEN 1 END) AS BIGINT) AS n_vanished,
      round(CAST(sum(contrib) AS DOUBLE), 6) AS js_divergence
    FROM k"""
  }
}
