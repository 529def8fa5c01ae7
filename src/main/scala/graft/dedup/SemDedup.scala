package graft.dedup

import graft.ml.KMeansLloyd
import graft.similarity.Cosine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SEMANTIC DEDUPLICATION — SemDeDup (Abbas et al. 2023): cluster the
  * embedding space with k-means, then search for near-duplicates ONLY
  * within each cluster, keeping per duplicate group the example
  * FARTHEST from its centroid (the published selection — far-from-
  * centroid survivors preserve diversity where keep-any collapses
  * clusters toward their mode). This is the third blocking strategy
  * in the near-dup family and the one real LLM-corpus pipelines run
  * at web scale: [[MinHashDedup]] blocks on lexical bands (misses
  * paraphrases), [[EmbeddingDedup]] on LSH sketches of the vectors
  * (unbiased but unaligned with corpus structure); SemDeDup's
  * cluster-scoped search concentrates comparisons exactly where
  * semantic duplicates live.
  *
  * Scale shape (100 TB): the k-means fit/assign is the existing
  * bounded machinery ([[KMeansLloyd]] — k·dim driver state, corpus
  * passes are hash aggregates); the candidate join is an equi-join on
  * `cluster`, so the pair count is Σ|cluster|² — the published
  * SemDeDup cost, bounded by sizing k with the corpus (n/k docs per
  * cluster on average; k is a knob, not a constant). Components and
  * keeper selection run on the EDGE set (near-dup-sized, tiny next to
  * the corpus), and the kept-set filter is one broadcast-ably small
  * left join back onto the corpus — the [[EmbeddingDedup.dedup]]
  * shape.
  *
  * Determinism: assignments, d², and cosines are the fixed-order
  * folds of [[KMeansLloyd]]/[[Cosine]]; the keeper is the (d² DESC,
  * id ASC) argmax within each connected component — a total order.
  * Like the rest of the embedding-dedup family the end-to-end op is
  * rows+spec (k-means fit is not one SQL query); the spec pins
  * planted-duplicate behavior and the keep-farthest rule. */
object SemDedup {

  /** (assignments, within-cluster scored pairs ≥ tau) under one fit. */
  private def assignAndPairs(df: DataFrame, idCol: String, vecCol: String,
                             k: Int, tau: Double, iters: Int):
      (DataFrame, DataFrame) = {
    require(k >= 1 && tau > 0 && tau <= 1)
    val model = KMeansLloyd.fit(df, idCol, vecCol, k, iters)
    val assigned = KMeansLloyd.transform(df, idCol, vecCol, model)
      .select(col(idCol).as("__id"), col("cluster"), col("d2"))
    val sides = df.select(col(idCol).as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .join(assigned.select(col("__id"), col("cluster")), "__id")
    val l = sides.select(col("cluster"), col("__id").as("a"),
      col("__v").as("__va"))
    val r = sides.select(col("cluster"), col("__id").as("b"),
      col("__v").as("__vb"))
    val pairs = l.join(r, Seq("cluster"))
      .filter(col("a") < col("b"))
      .withColumn("score",
        round(Cosine.cosine(col("__va"), col("__vb")), 6))
      .filter(col("score") >= tau)
      .select(col("a"), col("b"), col("score"), col("cluster"))
    (assigned, pairs)
  }

  /** Within-cluster near-dup pairs: `(a, b, score, cluster)` with
    * cosine ≥ `tau`, a < b, both in `cluster` under the k-means fit. */
  def pairs(df: DataFrame, idCol: String, vecCol: String, k: Int,
            tau: Double, iters: Int = 5): DataFrame =
    assignAndPairs(df, idCol, vecCol, k, tau, iters)._2

  /** SemDeDup kept set: one survivor per near-dup component — the
    * member FARTHEST from its centroid (ties: smallest id) — plus all
    * unduplicated rows. Returns `df`'s rows filtered. */
  def dedup(df: DataFrame, idCol: String, vecCol: String, k: Int,
            tau: Double, iters: Int = 5): DataFrame = {
    val (assigned, prs) = assignAndPairs(df, idCol, vecCol, k, tau, iters)
    val comps = MinHashDedup.connectedComponents(
        prs.select(col("a"), col("b")))
      .join(assigned, col("id") === col("__id"))
    // keep-farthest: (d² DESC, id ASC) argmax per component via the
    // orderable struct max — one hash agg over the edge-sized frame
    val keepers = comps
      .groupBy(col("component"))
      .agg(max(struct(col("d2").as("d"), (-col("id")).as("ni")))
        .as("__top"))
      .select((-col("__top.ni")).as("__keep_id"))
    val clustered = comps.select(col("id").as("__cid"))
    df.join(clustered, df(idCol) === col("__cid"), "left")
      .join(keepers, df(idCol) === col("__keep_id"), "left")
      .filter(col("__cid").isNull || col("__keep_id").isNotNull)
      .drop("__cid", "__keep_id")
  }
}
