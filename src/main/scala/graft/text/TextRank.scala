package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TEXTRANK KEYWORD EXTRACTION (Mihalcea & Tarau 2004, the word-graph
  * variant): rank words by PageRank over the token-adjacency graph —
  * an edge per adjacent token pair (window 2, both directions, weight
  * = corpus co-occurrence count). The centrality-based complement of
  * the frequency family ([[TextFunctions]] distinctive terms, PMI
  * collocations): a word ranks high when it neighbors many other
  * well-connected words, not merely when it is frequent.
  *
  * Pure composition of two already-oracled pieces: the stride-1
  * bigram pass (native [[graft.expressions.Shingles]], the
  * exact-substring machinery) builds the edge list; the BIGINT-grid
  * [[graft.graph.PageRank]] iterates it — so the whole operator
  * inherits §5.3 bit-portability (integer ranks, no float
  * fixed-point) and sits under the exact oracle.
  *
  * Scale: the adjacency explode ≈ one row per corpus token folding
  * into a vocabulary²-bounded (in practice vocabulary-linear) edge
  * agg; iterations touch the edge list once each (PageRank's
  * documented shape — ranks/out-weights are vocabulary-sized).
  * Output: global top-`k` `(word, pr_rank)`, total-ordered by
  * (rank desc, word asc). */
object TextRank {

  def keywords(docs: DataFrame, textCol: String, k: Int = 50,
               iterations: Int = 3): DataFrame = {
    require(k >= 1 && iterations >= 0)
    val pair = split(col("__sh"), " ")
    val adj = docs
      .select(explode(TextFunctions.shingles(col(textCol), 2)).as("__sh"))
      .select(element_at(pair, 1).as("a"), element_at(pair, 2).as("b"),
        size(pair).as("__n"))
      .filter(col("__n") === 2 && col("a") =!= col("b"))
    val und = adj.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(adj.select(col("b").as("src"), col("a").as("dst")))
    val edges = und.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("w"))
    graft.graph.PageRank.ranks(edges, iterations)
      .orderBy(col("pr_rank").desc, col("node").asc)
      .limit(k)
      .select(col("node").as("word"), col("pr_rank"))
  }

  /** DuckDB twin: `toksExpr` is the token-list SQL fragment over
    * `text` (TextQueries.sqlToks convention). */
  def sql(table: String, toksExpr: String, k: Int = 50,
          iterations: Int = 3): String = {
    val edgesSql = s"""
      SELECT src, dst, CAST(count(*) AS BIGINT) AS w FROM (
        SELECT toks[s.i] AS src, toks[s.i + 1] AS dst
        FROM (SELECT $toksExpr AS toks FROM $table) t,
          LATERAL unnest(generate_series(1, len(toks) - 1)) s(i)
        UNION ALL
        SELECT toks[s.i + 1] AS src, toks[s.i] AS dst
        FROM (SELECT $toksExpr AS toks FROM $table) t,
          LATERAL unnest(generate_series(1, len(toks) - 1)) s(i)
      ) WHERE src <> dst
      GROUP BY src, dst"""
    s"""
    SELECT node AS word, pr_rank FROM (
      ${graft.graph.PageRank.sqlRanks(edgesSql, iterations)}
    ) ORDER BY pr_rank DESC, node ASC LIMIT $k"""
  }
}
