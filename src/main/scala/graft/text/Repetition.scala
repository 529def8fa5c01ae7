package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gopher-style repetition signals — the boilerplate/spam gates real
  * curation pipelines threshold on (Rae et al. 2021's "repetition"
  * family, reconstructed from the published descriptions):
  *
  *   - dup_token_frac:   1 − distinct/total tokens
  *   - dup_trigram_frac: 1 − distinct/total word trigrams
  *   - top_token_frac:   most-common-token share of the doc
  *
  * Shape: two explode → (doc, gram) count → per-doc roll-up passes,
  * inner-joined on doc_id. Each pass is one shuffle keyed by (doc,
  * gram) with map-side partial aggregation, so skew is bounded by the
  * largest single document, not the corpus. Ratios are exact
  * integer-to-double divisions rounded at 6 dp — fully oracle-able
  * (the DuckDB twin lives in TextQueries).
  *
  * Docs with zero tokens vanish (no rows to aggregate) — by design:
  * a repetition score for empty text is undefined.
  */
object Repetition {

  def stats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tokAgg = df
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("t"))
      .groupBy(col(idCol), col("t")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tokens"), count(lit(1)).as("n_dist"),
        max(col("c")).as("top_c"))
    val triAgg = df
      .select(col(idCol), explode(TextFunctions.shingles(col(textCol), 3)).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col(idCol))
      .agg(sum(col("c")).as("n_tri"), count(lit(1)).as("n_tri_dist"))
    tokAgg.join(triAgg, idCol)
      .select(col(idCol), col("n_tokens"),
        round(lit(1.0) - col("n_dist").cast("double") /
          col("n_tokens").cast("double"), 6).as("dup_token_frac"),
        round(lit(1.0) - col("n_tri_dist").cast("double") /
          col("n_tri").cast("double"), 6).as("dup_trigram_frac"),
        round(col("top_c").cast("double") /
          col("n_tokens").cast("double"), 6).as("top_token_frac"))
  }
}
