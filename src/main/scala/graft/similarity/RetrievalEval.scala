package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** OFFLINE RETRIEVAL EVALUATION — the measurement leg the retrieval
  * stack (BM25, ANN, hybrid) was missing: given a ranked run and
  * binary relevance judgments, score each query with the standard IR
  * triple recall@k, MRR@k and nDCG@k. This is how a 100 TB serving
  * stack is actually tuned — run A/B candidate retrievers over a
  * judged query sample and diff these columns — so it belongs next to
  * the retrievers as a first-class operator, not in a notebook.
  *
  * Determinism (the §5.3 discipline): every per-hit DCG gain
  * 1/log₂(rank+1) is quantized to an exact 1e-9 integer grid —
  * `floor(1e9·ln 2/ln(rank+1) + 0.5)` — so the per-query DCG/IDCG
  * sums are order-free BIGINT folds both engines reproduce; the three
  * emitted ratios finish on the 6-dp floor-portable grid (never an
  * unrounded quotient). IDCG folds the ideal prefix
  * Σ_{i≤min(n_rel,k)} gain(i) over a bounded k-element sequence.
  *
  * Scale: the run is filtered to rank ≤ k (queries × k rows), joined
  * once against the judgments on (query_id, doc_id) — partial-agg'd
  * hash shapes end-to-end; judgment counts attach by one key-axis
  * join. No windows, no corpus pass: cost is run-sized, not
  * corpus-sized. */
object RetrievalEval {

  private def gainMicro(rank: org.apache.spark.sql.Column) =
    floor(lit(1e9) * log(lit(2.0)) / log(rank.cast("double") + lit(1.0))
      + lit(0.5)).cast("bigint")

  private def r6(c: org.apache.spark.sql.Column) =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Per-query metrics @ `k`. `results`: `(query_id, doc_id, rank)`
    * (rank 1-based; extra columns ignored); `qrels`: `(query_id,
    * doc_id)` rows naming the RELEVANT docs. Output per query seen in
    * either input — the query spine comes from the UNFILTERED run, so
    * a query whose every hit lands past rank k still reports (with
    * `n_ret = 0`: a bad run must show up as a bad row, not vanish).
    * Columns: `(query_id, n_rel, n_ret, hits, recall, mrr, ndcg)` —
    * `n_ret`/`hits` count within rank ≤ k; recall/ndcg are null for
    * queries with no judged relevant doc (0/0 is not 0), mrr is 0.0
    * when no relevant doc was retrieved within k. */
  def metrics(results: DataFrame, qrels: DataFrame, k: Int): DataFrame = {
    require(k >= 1)
    val ret = results.filter(col("rank") <= k)
      .select(col("query_id"), col("doc_id"),
        col("rank").cast("bigint").as("rank"))
    // spine BEFORE the rank cut: every query the run retrieved for
    val spine = results.select(col("query_id")).distinct()
    val rel = qrels.select(col("query_id"), col("doc_id"))
      .distinct().withColumn("__rel", lit(1L))
    val nRel = rel.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"))
    val perQ = spine.join(
      ret.join(rel, Seq("query_id", "doc_id"), "left")
        .groupBy(col("query_id"))
        .agg(count(lit(1)).as("n_ret"),
          sum(coalesce(col("__rel"), lit(0L))).as("hits"),
          sum(when(col("__rel").isNotNull, gainMicro(col("rank")))
            .otherwise(lit(0L))).as("__dcg"),
          min(when(col("__rel").isNotNull, col("rank"))).as("__minrank")),
      Seq("query_id"), "left")
    // lower bound 1: Spark's sequence(1, 0) DESCENDS to [1, 0] and
    // gain(0) would divide by ln(1) = 0; the n_rel = 0 case is
    // guarded by the `when` below, but the branch is still evaluated
    val idcgOf = aggregate(
      sequence(lit(1L),
        greatest(least(col("n_rel"), lit(k.toLong)), lit(1L))),
      lit(0L), (acc, i) => acc + gainMicro(i))
    perQ.join(nRel, Seq("query_id"), "full_outer")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        coalesce(col("n_ret"), lit(0L)).as("n_ret"),
        coalesce(col("hits"), lit(0L)).as("hits"),
        col("__dcg"), col("__minrank"))
      .withColumn("recall",
        when(col("n_rel") > 0, r6(
          coalesce(col("hits"), lit(0L)).cast("double")
            / col("n_rel").cast("double"))))
      .withColumn("mrr",
        when(col("__minrank").isNotNull,
          r6(lit(1.0) / col("__minrank").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("ndcg",
        when(col("n_rel") > 0, r6(
          coalesce(col("__dcg"), lit(0L)).cast("double")
            / idcgOf.cast("double"))))
      .select(col("query_id"), col("n_rel"), col("n_ret"), col("hits"),
        col("recall"), col("mrr"), col("ndcg"))
  }

  /** DuckDB twin of [[metrics]]: `resultsSql` must select
    * `(query_id, doc_id, rank)`, `qrelsSql` `(query_id, doc_id)`. */
  def sqlMetrics(resultsSql: String, qrelsSql: String, k: Int): String = {
    val gain = (r: String) =>
      s"CAST(floor(1e9 * ln(2.0e0) / ln(CAST($r AS DOUBLE) + 1.0e0) " +
        s"+ 0.5e0) AS BIGINT)"
    s"""
    WITH ret AS (
      SELECT query_id, doc_id, CAST(rank AS BIGINT) AS rank
      FROM ($resultsSql) WHERE rank <= $k
    ), spine AS (
      SELECT DISTINCT query_id FROM ($resultsSql)
    ), rel AS (
      SELECT DISTINCT query_id, doc_id FROM ($qrelsSql)
    ), nrel AS (
      SELECT query_id, CAST(count(*) AS BIGINT) AS n_rel
      FROM rel GROUP BY query_id
    ), perqk AS (
      SELECT ret.query_id,
        CAST(count(*) AS BIGINT) AS n_ret,
        CAST(sum(CASE WHEN rel.doc_id IS NOT NULL THEN 1 ELSE 0 END)
          AS BIGINT) AS hits,
        CAST(sum(CASE WHEN rel.doc_id IS NOT NULL
          THEN ${gain("ret.rank")} ELSE 0 END) AS BIGINT) AS dcg,
        min(CASE WHEN rel.doc_id IS NOT NULL THEN ret.rank END)
          AS minrank
      FROM ret LEFT JOIN rel
        ON ret.query_id = rel.query_id AND ret.doc_id = rel.doc_id
      GROUP BY ret.query_id
    ), perq AS (
      SELECT spine.query_id, perqk.n_ret, perqk.hits, perqk.dcg,
        perqk.minrank
      FROM spine LEFT JOIN perqk ON spine.query_id = perqk.query_id
    ), j AS (
      SELECT coalesce(perq.query_id, nrel.query_id) AS query_id,
        coalesce(nrel.n_rel, 0) AS n_rel,
        coalesce(perq.n_ret, 0) AS n_ret,
        coalesce(perq.hits, 0) AS hits,
        perq.dcg, perq.minrank
      FROM perq FULL OUTER JOIN nrel ON perq.query_id = nrel.query_id)
    SELECT query_id, n_rel, n_ret, hits,
      CASE WHEN n_rel > 0 THEN
        floor(CAST(coalesce(hits, 0) AS DOUBLE) / CAST(n_rel AS DOUBLE)
          * 1e6 + 0.5e0) / 1e6 END AS recall,
      CASE WHEN minrank IS NOT NULL THEN
        floor(1.0e0 / CAST(minrank AS DOUBLE) * 1e6 + 0.5e0) / 1e6
        ELSE 0.0e0 END AS mrr,
      CASE WHEN n_rel > 0 THEN
        floor(CAST(coalesce(dcg, 0) AS DOUBLE)
          / CAST(list_sum(list_transform(
              range(1, CAST(least(n_rel, $k) AS INT) + 1),
              i -> ${gain("i")})) AS DOUBLE)
          * 1e6 + 0.5e0) / 1e6 END AS ndcg
    FROM j"""
  }
}
