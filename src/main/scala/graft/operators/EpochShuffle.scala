package graft.operators

import graft.functions.Noise
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EPOCH SHUFFLE — the deterministic global permutation every training
  * run needs: each epoch reads the corpus in a different order, the
  * order must be reproducible bit-for-bit from (corpus, epoch) alone
  * (resumable jobs, exact repro of a loss curve), and at 100 TB it must
  * be computed WITHOUT a global sort.
  *
  * The permutation key is [[Noise.intRank]] (pure BIGINT arithmetic,
  * engine-portable — no RNG stream, no row-position dependence), so a
  * document's position depends only on its id and the epoch number:
  * re-running, re-partitioning, or appending tomorrow's shard never
  * re-shuffles what a resumed reader already consumed of THIS epoch's
  * order.
  *
  * Scale shape — the naive `row_number() OVER (ORDER BY rank)` drags
  * the whole corpus through ONE partition (WindowExec warns about
  * exactly this). Instead the same two-level scheme as text.Packing,
  * but keyed by hash bucket:
  *
  *   1. bucket = rank % nBuckets — uniform by construction (rank is a
  *      hash), so every bucket holds ~n/nBuckets rows; the per-bucket
  *      `row_number` window shuffles by bucket and sorts only bounded
  *      partitions;
  *   2. bucket offsets = exclusive prefix sum of the nBuckets bucket
  *      COUNTS — a window over nBuckets rows (kilobytes), broadcast
  *      back.
  *
  * Global position = bucket offset + within-bucket row number: exactly
  * the permutation ordered by (bucket, rank, id) — which is itself a
  * uniform shuffle, verified against the naive single-window form in
  * EpochShuffleSpec. Readers that want epoch-ordered output then
  * `repartitionByRange(shuffle_pos)` and write — each range partition
  * is one contiguous slice of the epoch stream.
  */
object EpochShuffle {

  /** Adds `shuffle_pos` ∈ [0, n): the row's position in the epoch's
    * deterministic permutation. `idCol` must be numeric and unique. */
  def positions(df: DataFrame, idCol: String, epoch: Int,
                nBuckets: Int = 1024): DataFrame = {
    require(epoch >= 0, "epoch must be non-negative")
    require(nBuckets >= 1, "nBuckets must be >= 1")
    val ranked = df
      .withColumn("__rank", Noise.intRank(col(idCol), epoch))
      .withColumn("__bkt", pmod(col("__rank"), lit(nBuckets.toLong)))
    val intraW = Window.partitionBy(col("__bkt"))
      .orderBy(col("__rank"), col(idCol))
    val offW = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranked.groupBy(col("__bkt"))
      .agg(count(lit(1)).as("__bn"))
      .withColumn("__off", coalesce(sum(col("__bn")).over(offW), lit(0L)))
      .select(col("__bkt"), col("__off"))
    ranked
      .withColumn("__intra", row_number().over(intraW).cast("long"))
      .join(broadcast(offsets), "__bkt")
      .withColumn("shuffle_pos", col("__off") + col("__intra") - lit(1L))
      .drop("__rank", "__bkt", "__intra", "__off")
  }

  /** DuckDB SQL for the same permutation (naive global window — fine at
    * oracle scale, and agreeing with it is the point): position =
    * row_number ordered by (bucket, rank, id) minus one. */
  def sqlPositionExpr(idExpr: String, epoch: Int, nBuckets: Int): String = {
    val r = Noise.sqlIntRank(idExpr, epoch)
    s"(row_number() OVER (ORDER BY ($r) % $nBuckets, $r, $idExpr) - 1)"
  }
}
