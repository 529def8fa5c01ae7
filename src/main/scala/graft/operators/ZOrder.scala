package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) LAYOUT — multi-dimensional data clustering
  * for scan pruning. A 100 TB table sorted on one column prunes files
  * only for predicates on THAT column; laying files out along the
  * Z-curve of two columns keeps rows close in BOTH dimensions close in
  * file order, so parquet min/max (row-group / file) statistics prune
  * for either predicate — the standard lakehouse trick (Delta/Iceberg
  * `OPTIMIZE ZORDER BY`), here as a plain Spark range-repartition on a
  * bit-interleaved sort key.
  *
  * Scale shape: `repartitionByRange` samples the z-key to build range
  * bounds (one pass + one shuffle — the same cost as any global sort
  * layout), then each partition sorts locally. No window, no driver
  * materialization; the z-key itself is pure codegen'd bit arithmetic.
  * The write stays one file per partition, so file count = the
  * `numPartitions` knob, and each file covers a compact z-square whose
  * x/y min/max envelopes are ~√(cells) wide instead of spanning the
  * full domain.
  *
  * The key maps the LOW `bits` bits of each dimension; callers bring
  * their columns into [0, 2^bits) first (rank, quantile bucket, or
  * plain truncation — `bucketize` below for the linear case). 2×31
  * bits fit a BIGINT with room to spare.
  */
object ZOrder {

  /** Morton interleave: bit i of `x` → bit 2i of z (even positions),
    * bit i of `y` → bit 2i+1 (odd). Both inputs must already lie in
    * [0, 2^bits); the terms are disjoint bit ranges so plain addition
    * assembles the key. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val xb = x.cast("long"); val yb = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** DuckDB SQL for the identical key — term-for-term the same BIGINT
    * arithmetic, so z-values sit under the exact oracle. */
  def sqlZValue(xExpr: String, yExpr: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    val xb = s"CAST($xExpr AS BIGINT)"; val yb = s"CAST($yExpr AS BIGINT)"
    (0 until bits).map { i =>
      s"((($xb >> $i) & 1) << ${2 * i}) + ((($yb >> $i) & 1) << ${2 * i + 1})"
    }.mkString("(", " + ", ")")
  }

  /** Linear [lo, hi] → [0, 2^bits) bucket (clamped): the simple
    * quantizer for already-bounded numeric dimensions. */
  def bucketize(c: Column, lo: Double, hi: Double, bits: Int): Column = {
    require(hi > lo, "hi must exceed lo")
    val cells = (1L << bits).toDouble
    least(lit((1L << bits) - 1), greatest(lit(0L),
      floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lit(cells))
        .cast("long")))
  }

  /** Quantile-based [0, 2^bits) quantizer for heavy-tailed or
    * unknown-range dimensions: bucket boundaries from
    * `approx_percentile` (one aggregate pass — the t-digest-style
    * sketch merges across partitions, no sort), assignment as a
    * codegen'd CASE chain over ≤ 2^bits literals. A linear
    * [[bucketize]] on a power-law column would dump ~all rows into
    * bucket 0 and the z-curve would degenerate to a sort on the other
    * dimension; equal-frequency buckets keep every z-cell populated.
    * Returns (quantized df column, boundaries) so a writer can persist
    * the boundaries and quantize future batches identically. */
  def bucketizeByQuantiles(df: DataFrame, c: Column, bits: Int)
      : (Column, Seq[Double]) = {
    require(bits >= 1 && bits <= 8, "quantile buckets: bits in [1, 8]")
    val cells = 1 << bits
    val probs = (1 until cells).map(_.toDouble / cells)
    val row = df.select(percentile_approx(c.cast("double"),
      array(probs.map(lit): _*), lit(10000)).as("q")).head()
    // percentile_approx of zero non-null values is NULL — fail with a
    // real message instead of an NPE at the fold below
    require(!row.isNullAt(0),
      "bucketizeByQuantiles: no non-null values to quantize")
    val bounds = row.getSeq[Double](0)
    // ascending CASE chain: bucket = count of boundaries below value
    val q = bounds.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (b, _)) => acc + when(c.cast("double") > lit(b), 1L)
        .otherwise(0L)
    }
    (q, bounds)
  }

  /** Cluster `df` along the z-curve of two bucketized dimensions:
    * range-partition on the z-key (sampled bounds, one shuffle), sort
    * each partition by it, keep the key column `zCol` for inspection /
    * range pruning. Write the result with one file per partition and
    * parquet footer stats prune on BOTH source columns. */
  def layout(df: DataFrame, x: Column, y: Column, bits: Int,
             numPartitions: Int, zCol: String = "z"): DataFrame = {
    require(numPartitions >= 1, "numPartitions must be >= 1")
    df.withColumn(zCol, zValue(x, y, bits))
      .repartitionByRange(numPartitions, col(zCol))
      .sortWithinPartitions(col(zCol))
  }
}
