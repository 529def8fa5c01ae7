package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TOKEN ENTROPY — the information-density quality signal that
  * length/stopword heuristics miss: a doc whose tokens are nearly all
  * repeats of a few types (scraped menus, keyword stuffing, ASCII
  * art) carries almost no trainable signal even when it passes every
  * length gate. Per doc, the Shannon entropy of the token frequency
  * distribution,
  *
  *   H = log₂ n − (1/n) · Σ_t c_t · log₂ c_t   (bits/token)
  *
  * plus the type–token ratio — together they separate "short but
  * dense" from "long but degenerate". Low H + low TTR on a long doc
  * is the classic SEO-spam signature; curation gates pair this with
  * the compression-ratio row.
  *
  * Determinism: the only libm call is log₂ of an INTEGER count,
  * rounded to 6 dp and re-anchored on the DECIMAL(18,6) grid before
  * the per-doc fold, so Σ c_t·log₂c_t is an exact decimal aggregate
  * (addition-order-free); the final H is one fixed double sequence
  * rounded 6 dp — the c7_unigram_logprob recipe.
  *
  * Scale: one hash aggregate to (doc, token) counts, one to docs —
  * both partial-aggregatable, no windows, no joins. Token-less docs
  * have no distribution and are absent from the output (the upstream
  * length gate owns them). */
object Entropy {

  /** One row per token-bearing doc:
    * `(idCol, n_tokens, n_types, entropy (6dp bits), ttr (6dp))`. */
  def tokenEntropy(docs: DataFrame, idCol: String,
                   textCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val ct = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol)))
        .as("__term"))
      .groupBy(col(idCol), col("__term"))
      .agg(count(lit(1)).as("__c"))
    ct.groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("__c").cast("decimal(10,0)") *
          round(log2(d(col("__c"))), 6).cast("decimal(18,6)")).as("__s"))
      .select(col(idCol),
        col("n_tokens"), col("n_types"),
        round(log2(d(col("n_tokens"))) - d(col("__s")) / d(col("n_tokens")),
          6).as("entropy"),
        round(d(col("n_types")) / d(col("n_tokens")), 6).as("ttr"))
  }

  /** DuckDB twin of [[tokenEntropy]]: `docsSql` must select
    * `(id, toks)`. Output id column is named `id`. */
  def sqlTokenEntropy(docsSql: String): String = {
    def d(c: String) = s"CAST($c AS DOUBLE)"
    s"""
    WITH toks AS (SELECT id, unnest(toks) AS term FROM ($docsSql)),
    ct AS (
      SELECT id, term, CAST(count(*) AS BIGINT) AS c
      FROM toks GROUP BY id, term
    ), agg AS (
      SELECT id, CAST(sum(c) AS BIGINT) AS n_tokens,
        CAST(count(*) AS BIGINT) AS n_types,
        sum(CAST(c AS DECIMAL(10,0)) *
          CAST(round(log2(${d("c")}), 6) AS DECIMAL(18,6))) AS s
      FROM ct GROUP BY id)
    SELECT id, n_tokens, n_types,
      round(log2(${d("n_tokens")}) - ${d("s")} / ${d("n_tokens")}, 6)
        AS entropy,
      round(${d("n_types")} / ${d("n_tokens")}, 6) AS ttr
    FROM agg"""
  }
}
