package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Concat-and-chunk sequence packing — the LLM-training step that lays
  * every document's tokens end-to-end in a deterministic order and cuts
  * the stream into fixed-capacity training sequences (GPT-style packing
  * with document splitting). The core primitive is a global EXCLUSIVE
  * PREFIX SUM of per-doc token counts in id order; each doc then spans
  * token offsets `[off, off + n)` and its sequence assignment is pure
  * integer arithmetic.
  *
  * Scale shape: the naive formulation — `sum(n) OVER (ORDER BY id)`
  * with no partition key — moves the ENTIRE corpus into one partition
  * (Spark's WindowExec warns precisely about this). Instead the classic
  * two-level scan:
  *
  *   1. intra-block running sum, window partitioned by
  *      `block = id div blockSize` — shuffles by block, each partition
  *      holds ≤ blockSize rows;
  *   2. exclusive prefix of the per-block TOTALS — a window over only
  *      `n / blockSize` rows (the one single-partition step, bounded:
  *      100 TB / blockSize-sized, kilobytes at blockSize 2²⁰), then
  *      broadcast-joined back.
  *
  * Offsets are identical to the naive form (PackingSpec asserts this),
  * and the oracle uses the naive window — DuckDB handles it fine at
  * test scale, which is exactly the point of the oracle split.
  */
object Packing {

  /** Adds `start_off` — the exclusive prefix sum of `nTokCol` in
    * `idCol` order — via the two-level block scan described above.
    * `idCol` must be numeric and unique; ids need not be dense (blocks
    * are ranges of id VALUES, so sparse regions just yield small
    * blocks). */
  def globalOffsets(df: DataFrame, idCol: String, nTokCol: String,
                    blockSize: Long = 1 << 20): DataFrame = {
    require(blockSize >= 1, "blockSize must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val blk = df.withColumn("__blk", expr(s"$idCol DIV $blockSize"))
    val intraW = Window.partitionBy(col("__blk")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    val blockW = Window.orderBy(col("__blk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val blockPrefix = blk.groupBy(col("__blk"))
      .agg(sum(col(nTokCol)).as("__bt"))
      .withColumn("__blkoff", coalesce(sum(col("__bt")).over(blockW), lit(0L)))
      .select(col("__blk"), col("__blkoff"))
    blk.withColumn("__intra", coalesce(sum(col(nTokCol)).over(intraW), lit(0L)))
      .join(broadcast(blockPrefix), "__blk")
      .withColumn("start_off", (col("__blkoff") + col("__intra")).cast("long"))
      .drop("__blk", "__intra", "__blkoff")
  }

  /** Doc-level packing summary over `df`: one row per non-empty doc
    * with its token count, global start offset, and the first/last
    * training-sequence index it lands in at `seqLen` capacity. */
  def docPacking(df: DataFrame, idCol: String, textCol: String,
                 seqLen: Int, blockSize: Long = 1 << 20): DataFrame = {
    require(seqLen >= 1, "seqLen must be >= 1")
    val withN = df
      .select(col(idCol), TextFunctions.wordCount(col(textCol)).as("n_tokens"))
      .filter(col("n_tokens") > 0)
    globalOffsets(withN, idCol, "n_tokens", blockSize)
      .withColumn("seq_first", expr(s"start_off DIV $seqLen"))
      .withColumn("seq_last", expr(s"(start_off + n_tokens - 1) DIV $seqLen"))
      .withColumn("n_seqs", (col("seq_last") - col("seq_first") + 1L))
      .select(col(idCol), col("n_tokens"), col("start_off"),
        col("seq_first"), col("seq_last"), col("n_seqs"))
  }
}
