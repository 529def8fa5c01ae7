package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Symmetric int8 scalar quantization of embedding vectors (C3) — the
  * storage form ANN indexes actually serve at 100 TB: 4× smaller than
  * float32 (16× smaller than the double working form), one multiply to
  * dequantize, recall loss bounded by scale/2 per element. Per-vector
  * scale = max|x|/127, so outliers cannot clip other vectors.
  *
  * Everything is within-row built-in expressions — the per-row scale
  * is materialized into a column BEFORE the quantize lambda references
  * it (an in-lambda subtree re-evaluates per element: the lambda-CSE
  * trap measured throughout this repo), and the arithmetic is
  * engine-portable (`round` half-away-from-zero in both engines), so
  * the whole operator sits under the DuckDB oracle.
  */
object Quantize {

  /** Adds `q_scale: double` and `q: array<bigint>` (int8 range) for
    * `vecCol`. Zero vectors quantize to zeros with scale 0. */
  def scalarQuantize(df: DataFrame, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.withColumn("q_scale",
        array_max(transform(v, x => abs(x))) / lit(127.0))
      .withColumn("q",
        when(col("q_scale") === 0, transform(v, _ => lit(0L)))
          .otherwise(transform(v,
            x => round(x / col("q_scale")).cast("long"))))
  }

  /** Reconstructed double vector from (q, q_scale). */
  def dequantize(q: Column, scale: Column): Column =
    transform(q, x => x.cast("double") * scale)
}
