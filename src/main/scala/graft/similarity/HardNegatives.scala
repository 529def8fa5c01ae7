package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** HARD-NEGATIVE MINING — the contrastive-training curation step:
  * for each anchor example, the most-similar examples with a
  * DIFFERENT label. Random negatives are trivially separable and
  * teach an embedding model nothing; the negatives that matter are
  * the ones the current representation already confuses (highest
  * cosine across the label boundary), and mining them is a standard
  * pass over the corpus before building contrastive batches (dense
  * retrieval, re-rankers, embedding fine-tunes all do this).
  *
  * Scale shape: the ANCHOR side is bounded by construction (a
  * curation pass mines negatives for a batch of anchors, not the
  * whole corpus at once — `maxAnchors` enforces it) and broadcasts;
  * the corpus side is scanned ONCE, scored against the broadcast
  * anchors (k·|anchors| candidate rows through the per-anchor top-k
  * window — anchor-keyed partitions, never a corpus-axis window).
  * For corpus-scale anchor sets, compose [[Cosine.ivfTopK]]'s
  * bucketed path and post-filter labels instead; this operator is
  * the exact form — and doubles as that path's recall oracle.
  *
  * Determinism: exact cosine (fixed-order fold), 6-dp round, rank by
  * (score DESC, id ASC) — the [[Cosine.selfJoinTopK]] conventions. */
object HardNegatives {

  /** Top-`k` cross-label negatives per anchor. `anchorPred` selects
    * the anchor rows. Output: `(a, b, a_label, b_label, score, rank)`
    * — a is the anchor id, b the mined negative. */
  def mine(df: DataFrame, idCol: String, vecCol: String, labelCol: String,
           anchorPred: Column, k: Int = 5,
           maxAnchors: Long = 100000L): DataFrame = {
    require(k >= 1)
    val anchors = df.filter(anchorPred)
      .select(col(idCol).as("a"),
        col(vecCol).cast("array<double>").as("__va"),
        col(labelCol).as("a_label"))
    val nAnchors = anchors.count()
    require(nAnchors <= maxAnchors,
      s"anchor set $nAnchors exceeds maxAnchors=$maxAnchors — mine in " +
        "batches or use the IVF-bucketed path")
    val corpus = df.select(col(idCol).as("b"),
      col(vecCol).cast("array<double>").as("__vb"),
      col(labelCol).as("b_label"))
    val w = Window.partitionBy(col("a"))
      .orderBy(col("score").desc, col("b"))
    broadcast(anchors).join(corpus, col("a_label") =!= col("b_label"))
      .withColumn("score", round(Cosine.cosine(col("__va"), col("__vb")), 6))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select(col("a"), col("b"), col("a_label"), col("b_label"),
        col("score"), col("rank"))
  }
}
