package graft.text

import java.util.zip.Deflater

import org.apache.spark.sql.{DataFrame, Encoders, Row}

/** COMPRESSION-RATIO QUALITY SIGNAL — the CCNet/Gopher-family heuristic
  * the expression-based signals (length, punctuation, stopwords,
  * repetition fractions) cannot express: how well does the document
  * deflate? Boilerplate, templated spam and keyword stuffing compress
  * far below natural prose; random noise compresses above it. One
  * number, model-free, brutally effective as a corpus gate.
  *
  * This is JVM code (zlib via `java.util.zip.Deflater`), not a Column
  * expression — the same escalation class as the multimodal decoders,
  * and like them it runs as a batched `mapPartitions` projection: no
  * shuffle, scales with the scan. Deflate LEVEL and strategy are
  * pinned (level 6, default strategy) so the byte count is stable
  * within a JVM release; across engines zlib builds differ, so the
  * signal is rows+spec by contract (no SQL oracle), with the spec
  * pinning the discriminative ordering (repetitive < prose < random)
  * and layout-determinism.
  */
object CompressionSignal {

  /** Deflate byte count of a string at level 6 (finished stream). */
  def deflatedLen(s: String): Int = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val d = new Deflater(6)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  /** Appends `raw_len`, `deflate_len`, `compression_ratio`
    * (deflate/raw, 6 dp; null for empty text) to each row. */
  def ratios(df: DataFrame, textCol: String,
             batchSize: Int = 256): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = df.schema
      .add("raw_len", LongType).add("deflate_len", LongType)
      .add("compression_ratio", DoubleType)
    val idx = df.schema.fieldIndex(textCol)
    df.mapPartitions { it: Iterator[Row] =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val t = row.getAs[String](idx)
          val extra: Seq[Any] =
            if (t == null || t.isEmpty) Seq(0L, 0L, null)
            else {
              val raw = t.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
              val z = deflatedLen(t)
              // Seq[Any], NOT Seq(...): mixed Long/Double literals
              // numeric-widen the whole Seq to Double otherwise
              Seq[Any](raw.toLong, z.toLong,
                BigDecimal(z.toDouble / raw.toDouble)
                  .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
            }
          Row.fromSeq(row.toSeq ++ extra)
        }
      }
    }(Encoders.row(schema))
  }
}
