package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EQUI-WIDTH HISTOGRAM — fixed-bucket distribution profiling with
  * explicit under/overflow buckets and explicit ZERO rows for empty
  * buckets (a histogram whose empty buckets silently vanish misreads
  * as a different distribution). Complements ColumnProfile (moments)
  * and the exact/approx percentiles (quantiles) as the third
  * profiling surface.
  *
  * Scale shape: one scan, one hash aggregate on the bucket id
  * (partial map-side: at most nb+2 rows per task reach the shuffle);
  * the dense bucket spine is a driver-built literal frame of nb+2
  * rows joined broadcast-style. Bucket arithmetic is a single
  * codegen'd projection; choose lo/hi/nb so the width is exactly
  * representable (the query layer does) and the floor-division is
  * bit-portable across engines.
  */
object Histogram {

  /** Buckets of width (hi-lo)/nb over [lo, hi): bucket i covers
    * [lo + i·w, lo + (i+1)·w). Values < lo land in bucket −1, ≥ hi in
    * bucket nb; nulls are excluded. Output: `(bucket, lo_edge,
    * hi_edge, n_rows)` — one row per bucket INCLUDING empty ones;
    * the under/overflow edges are unbounded (null). */
  def equiWidth(df: DataFrame, column: String, lo: Double, hi: Double,
                nb: Int): DataFrame = {
    require(nb > 0 && hi > lo)
    val w = (hi - lo) / nb
    val x = col(column).cast("double")
    val bucket = when(x < lo, lit(-1L))
      .when(x >= hi, lit(nb.toLong))
      .otherwise(floor((x - lit(lo)) / lit(w)).cast("long"))
    val counts = df.where(x.isNotNull)
      .select(bucket.as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_rows"))
    val spark = df.sparkSession
    val spine = spark.range(-1L, nb + 1L).select(col("id").as("bucket"))
    spine.join(counts, Seq("bucket"), "left")
      .select(col("bucket"),
        when(col("bucket") >= 0 && col("bucket") < nb,
          lit(lo) + col("bucket") * lit(w)).as("lo_edge"),
        when(col("bucket") >= 0 && col("bucket") < nb,
          lit(lo) + (col("bucket") + 1) * lit(w)).as("hi_edge"),
        coalesce(col("n_rows"), lit(0L)).as("n_rows"))
  }
}
