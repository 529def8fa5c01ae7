package graft.similarity

import graft.text.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hybrid retrieval — the RAG-era search primitive: fuse a LEXICAL
  * match score (query-term frequency in the document) with a DENSE
  * score (cosine against a query embedding) and rank by the weighted
  * sum. Pure composition of existing operators:
  *
  *   - lexical: term-count over the token array, normalized by doc
  *     length — a narrow projection (no inverted index needed for
  *     scoring a single query; at 100 TB the candidate set would come
  *     from an index/LSH first and this scorer ranks the candidates);
  *   - dense: one broadcast of the 1-row query vector, dot product via
  *     the native DotProduct expression;
  *   - fusion: `w·lex + (1−w)·dense`, ranked with (score desc, id)
  *     tie-break → TakeOrderedAndProject, never a global sort.
  *
  * Every stage is deterministic arithmetic → the whole pipeline sits
  * under the DuckDB oracle (c3_hybrid_search).
  */
object HybridSearch {

  /** Fraction of doc tokens that are query terms (term frequency
    * normalized by doc length; 0 for empty docs). */
  def lexicalScore(text: org.apache.spark.sql.Column, terms: Seq[String])
      : org.apache.spark.sql.Column = {
    val toks = TextFunctions.tokens(text)
    val termArr = array(terms.map(lit): _*)
    val hits = size(filter(toks, t => array_contains(termArr, t)))
    when(size(toks) === 0, lit(0.0))
      .otherwise(hits.cast("double") / size(toks).cast("double"))
  }

  /** Top-k docs by fused score. `docs` must carry (idCol, textCol);
    * `vecs` (idCol, vecCol); the query embedding is row `queryId` of
    * `vecs`, inlined as a plan literal.
    *
    * EAGER: collecting that one-row query vector runs a small Spark job
    * at DataFrame-CONSTRUCTION time (not at action time), and a missing
    * `queryId` throws here instead of returning an empty result (an
    * absent query id is caller error, not "no matches"). Callers that
    * build plans lazily or probe possibly-absent ids should filter
    * `vecs` first; don't construct this frame on a latency-critical
    * path expecting laziness. */
  def search(docs: DataFrame, vecs: DataFrame, idCol: String,
             textCol: String, vecCol: String, terms: Seq[String],
             queryId: Long, k: Int, lexWeight: Double = 0.5): DataFrame = {
    require(k >= 1 && lexWeight >= 0.0 && lexWeight <= 1.0)
    // the query vector is ONE row: collect it up front (one tiny
    // pushdown-filtered scan) and inline it as an array literal — a
    // missing id fails loudly here instead of a join silently
    // annihilating to "no matches", and the big side needs no join at
    // all for the query vector (64 doubles of plan literal, nothing
    // like the IVF nlist×dim growth)
    val qRows = vecs.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>")).collect()
    require(qRows.nonEmpty, s"hybrid search: query id $queryId not found in vecs")
    val qv = lit(qRows(0).getSeq[Double](0).toArray)
    val scored = docs
      .select(col(idCol), lexicalScore(col(textCol), terms).as("__lex"))
      .join(vecs.select(col(idCol),
        col(vecCol).cast("array<double>").as("__v")), idCol)
      .withColumn("__qv", qv)
      .filter(col(idCol) =!= queryId)
      .withColumn("lex_score", round(col("__lex"), 6))
      .withColumn("dense_score", round(Cosine.cosine(col("__v"), col("__qv")), 6))
      .withColumn("score", round(
        col("lex_score") * lexWeight + col("dense_score") * (1.0 - lexWeight), 6))
    scored.select(col(idCol), col("lex_score"), col("dense_score"), col("score"))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
  }
}
