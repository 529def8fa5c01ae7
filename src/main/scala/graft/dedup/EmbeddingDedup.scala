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
    // one corpus scan: small keep-flag table left-joins in (same shape
    // as MinHashDedup.dedup — unclustered rows pass as null flags)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("component"))
    val flags = comps
      .withColumn("__keep", col("id") === min(col("id")).over(w))
      .select(col("id").as("__cid"), col("__keep"))
    df.join(flags, df(idCol) === flags("__cid"), "left")
      .filter(col("__cid").isNull || col("__keep"))
      .drop("__cid", "__keep")
  }
}
