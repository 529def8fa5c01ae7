package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval range join: each left row carries a point (long —
  * epoch micros, a price in cents, any monotone axis) and joins every
  * right row whose `[start, end]` interval contains it, optionally under
  * equi-join keys. Spark's own planner turns a bare range predicate into
  * a nested-loop join (per-key cross product) — this operator gives it
  * the equi-join shape Catalyst optimizes well.
  *
  * Execution shape (the 100 TB argument): the axis is cut into
  * `bucketWidth`-sized buckets; a point lives in exactly one bucket, an
  * interval is exploded over the buckets it overlaps, and the join is a
  * plain equi-join on (keys..., bucket) + an exact containment filter.
  * Because the point's bucket is unique, every matching (point,
  * interval) pair meets exactly once — no dedup pass. Shuffle volume is
  * |points| + Σ interval-spans, both linear for bounded intervals.
  *
  * The long tail is handled separately: intervals spanning more than
  * `maxSpanBuckets` buckets (rare by construction if bucketWidth ≈ the
  * typical interval length) skip the explode and go through a keys-only
  * equi-join with the range as a post-filter — bounded by key-group
  * size, and never able to blow up `sequence()`. The two paths union.
  *
  * Axis values must stay within ±2^53 (micros since epoch are ~2^50;
  * nanos would overflow double-exact arithmetic — convert first).
  */
object RangeJoin {

  /** @param points     left side; `pointCol` is a long axis value
    * @param intervals  right side; `startCol`/`endCol` are long bounds,
    *                   inclusive on both ends (BETWEEN semantics)
    * @param keys       equi-join key columns present on both sides
    * @param bucketWidth axis bucket size — pick ≈ typical interval
    *                   length so most intervals explode into O(1) rows
    * @param maxSpanBuckets intervals wider than this many buckets take
    *                   the non-exploding fallback path */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, startCol: String, endCol: String,
                      keys: Seq[String], bucketWidth: Long,
                      maxSpanBuckets: Int = 64): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val startB = (col(startCol) - pmod(col(startCol), w)) / w
    val endB = (col(endCol) - pmod(col(endCol), w)) / w
    val contained = col(pointCol).between(col(startCol), col(endCol))

    val short = intervals.filter(endB - startB <= maxSpanBuckets)
      .withColumn("__bucket",
        explode(sequence(startB.cast("long"), endB.cast("long"))))
    val pointB = points.withColumn("__bucket",
      ((col(pointCol) - pmod(col(pointCol), w)) / w).cast("long"))
    val bucketed = pointB
      .join(short, keys :+ "__bucket")
      .filter(contained)
      .drop("__bucket")

    val long = intervals.filter(endB - startB > maxSpanBuckets)
    val fallback =
      if (keys.nonEmpty) points.join(long, keys).filter(contained)
      else points.join(long, contained)

    bucketed.unionByName(fallback)
  }
}
