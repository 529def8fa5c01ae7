package graft.text

import graft.operators.TopPerGroup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 ranked lexical retrieval (north-star retrieval surface): for a
  * SMALL batch of queries (an eval set, a contamination probe, a
  * search request batch), return the top-k corpus documents per query
  * under the Robertson/Lucene BM25 score
  *
  *   idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)      (never negative)
  *   s(q, d) = Σ_t∈q idf(t) · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))
  *
  * This is the missing sibling of [[graft.similarity.HybridSearch]]
  * (which fuses raw TF with dense cosine): proper lexical ranking with
  * document-frequency saturation — what a pipeline actually runs to
  * find training documents lexically close to an eval set before
  * deciding what to decontaminate, or to serve keyword search over a
  * curated corpus.
  *
  * Scale shape (100 TB): the corpus side is two hash aggregations
  * (postings `(doc, term, tf)` and document lengths) plus a
  * document-frequency aggregation — all linear scans with partial
  * aggregation, shuffled on `term`/`doc`. The QUERY side is small by
  * contract, so query terms (with their df, joined before broadcast)
  * travel as a broadcast — candidate generation is a map-side hash
  * probe of the postings scan, never a shuffle of the corpus against
  * the queries. `maxDfFraction` is the standard stopping knob: a term
  * in more than that fraction of documents is dropped BEFORE candidate
  * generation (its idf is near zero anyway), which is what keeps a
  * stop-word from turning one query term into a full corpus scan of
  * candidates. Final top-k per query runs through the salted
  * [[TopPerGroup.topN]], so one query matching half the corpus cannot
  * pin a single task (doc ids are unique per query, satisfying topN's
  * total-order precondition).
  *
  * Cross-engine exactness: per-term contributions are computed in one
  * fixed double-op sequence (identical in the DuckDB twin), rounded to
  * the 6-dp decimal grid, and summed as DECIMAL — the repo-standard
  * recipe that makes partial-agg order and 1-ulp libm `ln` drift
  * unobservable. Ties rank by (score desc, doc id asc).
  */
object Bm25 {

  /** Top-`k` corpus docs per query. Output: `query_id, doc_id, score,
    * rank` (score DECIMAL(18,6), rank 1..k). Queries whose terms all
    * miss the corpus (or all get df-stopped) return no rows.
    */
  def topK(corpus: DataFrame, corpusId: String, corpusText: String,
           queries: DataFrame, queryId: String, queryText: String,
           k: Int = 10, k1: Double = 1.2, b: Double = 0.75,
           maxDfFraction: Double = 1.0): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(k1 > 0 && b >= 0 && b <= 1, s"bad BM25 params k1=$k1 b=$b")
    require(maxDfFraction > 0 && maxDfFraction <= 1,
      s"maxDfFraction must be in (0, 1]: $maxDfFraction")
    // materialized once (MinHashDedup/Cosine checkpoint pattern): the
    // token stream feeds BOTH aggregations, postings feed BOTH the
    // probe join and df counts, and doclen feeds BOTH stats and the
    // final join — without truncation each consumer would re-scan and
    // re-tokenize the whole corpus. NOTE: this makes construction
    // eager (a small job runs here), like HybridSearch.search.
    val toks = corpus.select(col(corpusId).as("doc_id"),
      explode(TextFunctions.tokens(col(corpusText))).as("term"))
      .localCheckpoint()
    val postings = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val doclen = toks.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"))
      .localCheckpoint()
    // one row: corpus size and total token count (avgdl = total/n,
    // applied as dl·n/total so both engines run the same op sequence)
    val stats = doclen.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_len"))
    val dfreq = postings.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    // query terms (deduped per query) + their df + stopping — all on
    // the SMALL side, so the candidate join broadcasts query_id, term,
    // df together and the vocabulary-wide dfreq never re-shuffles
    val qterms = queries.select(col(queryId).as("query_id"),
        explode(TextFunctions.tokens(col(queryText))).as("term"))
      .distinct()
      .join(dfreq, "term")
      .crossJoin(stats)
      .filter(col("df").cast("double") <=
        lit(maxDfFraction) * col("n_docs").cast("double"))
    val contrib = postings
      .join(broadcast(qterms), "term")
      .join(doclen, "doc_id")
      .withColumn("__c", round(
        log((col("n_docs").cast("double") - col("df").cast("double")
            + lit(0.5)) / (col("df").cast("double") + lit(0.5)) + lit(1.0))
          * (col("tf").cast("double") * lit(k1 + 1.0))
          / (col("tf").cast("double") + lit(k1) * (lit(1.0 - b)
            + lit(b) * col("dl").cast("double")
              * col("n_docs").cast("double")
              / col("total_len").cast("double"))), 6)
        .cast("decimal(18,6)"))
    val scored = contrib.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__c")).cast("decimal(18,6)").as("score"))
    // rank on the exact decimal; emit one cast to DOUBLE (repo
    // precedent: exact integer/decimal arithmetic end-to-end, a single
    // shared IEEE op at the boundary)
    TopPerGroup.topN(scored, "query_id", "score", "doc_id", k)
      .withColumn("score", col("score").cast("double"))
  }

  /** DuckDB twin of [[topK]] — same token split, same stopping, same
    * double-op sequence per contribution, same 6-dp grid, same
    * (score desc, doc_id asc) tie order. `corpusSql` / `querySql` must
    * select `(doc_id, text)` / `(query_id, text)`.
    */
  def sql(corpusSql: String, querySql: String, k: Int,
          k1: Double = 1.2, b: Double = 0.75,
          maxDfFraction: Double = 1.0): String = {
    import graft.functions.Noise.sqlDouble
    val toks = "list_filter(string_split_regex(lower(text), '\\s+'), x -> len(x) > 0)"
    s"""
    WITH corpus AS ($corpusSql), qs AS ($querySql),
    toks AS (
      SELECT doc_id, unnest($toks) AS term FROM corpus
    ), postings AS (
      SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term
    ), doclen AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
    ), stats AS (
      SELECT count(*) AS n_docs, sum(dl) AS total_len FROM doclen
    ), dfreq AS (
      SELECT term, count(*) AS df FROM postings GROUP BY term
    ), qterms AS (
      SELECT q.query_id, q.term, f.df, s.n_docs, s.total_len
      FROM (SELECT DISTINCT query_id, unnest($toks) AS term FROM qs) q
      JOIN dfreq f USING (term) CROSS JOIN stats s
      WHERE CAST(f.df AS DOUBLE) <=
        ${sqlDouble(maxDfFraction)} * CAST(s.n_docs AS DOUBLE)
    ), contrib AS (
      SELECT q.query_id, p.doc_id,
        CAST(round(
          ln((CAST(q.n_docs AS DOUBLE) - CAST(q.df AS DOUBLE) + 5.0e-1)
             / (CAST(q.df AS DOUBLE) + 5.0e-1) + 1.0e0)
          * (CAST(p.tf AS DOUBLE) * ${sqlDouble(k1 + 1.0)})
          / (CAST(p.tf AS DOUBLE) + ${sqlDouble(k1)} * (${sqlDouble(1.0 - b)}
            + ${sqlDouble(b)} * CAST(l.dl AS DOUBLE)
              * CAST(q.n_docs AS DOUBLE)
              / CAST(q.total_len AS DOUBLE))), 6) AS DECIMAL(18,6)) AS c
      FROM postings p JOIN qterms q USING (term) JOIN doclen l USING (doc_id)
    ), scored AS (
      SELECT query_id, doc_id, CAST(sum(c) AS DECIMAL(18,6)) AS score
      FROM contrib GROUP BY query_id, doc_id
    ), ranked AS (
      SELECT query_id, doc_id, score, CAST(row_number() OVER (
        PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS BIGINT) AS rank
      FROM scored)
    SELECT query_id, doc_id, CAST(score AS DOUBLE) AS score, rank
    FROM ranked WHERE rank <= $k"""
  }
}
