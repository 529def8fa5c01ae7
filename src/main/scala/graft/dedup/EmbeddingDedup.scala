package graft.dedup

import graft.similarity.Cosine
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Embedding-cosine near-duplicate removal — the semantic-dedup family
  * member (north star: "embedding-cosine near-dup"): rows whose vectors
  * are closer than a cosine threshold are duplicates even when their
  * text differs. Candidates come from the multi-table LSH (never
  * all-pairs), edges are threshold-confirmed with exact cosine, and the
  * shared min-label connected components pick one keeper per cluster —
  * the same scale shape as MinHash dedup with vectors instead of
  * shingles.
  */
object EmbeddingDedup {

  /** Confirmed near-dup pairs: cosine ≥ threshold among LSH candidates.
    * Goes through the rankless candidates→score→threshold path — dedup
    * needs edges, not ranks, so the per-key window sort that round 1
    * paid (annTopK with k = MaxValue) is gone. numPlanes = 0 self-sizes
    * the code to the corpus (Cosine.planesFor). */
  def pairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
            threshold: Double, numPlanes: Int = 0, numTables: Int = 8,
            seed: Long = 42L): DataFrame =
    Cosine.annScoredPairs(df, idCol, vecCol, dim,
        numPlanes = numPlanes, numTables = numTables, seed = seed)
      .filter(col("score") >= threshold)
      .select("a", "b", "score")

  /** Keeps one row per near-dup cluster plus all unclustered rows. */
  def dedup(df: DataFrame, idCol: String, vecCol: String, dim: Int,
            threshold: Double): DataFrame = {
    val comps = MinHashDedup.connectedComponents(
      pairs(df, idCol, vecCol, dim, threshold))
    val keepers = comps.groupBy(col("component")).agg(min(col("id")).as("__keep"))
      .select(col("__keep"))
    val clustered = comps.select(col("id"))
    df.join(clustered, df(idCol) === clustered("id"), "left_anti")
      .union(df.join(keepers, df(idCol) === keepers("__keep"), "left_semi"))
  }
}
