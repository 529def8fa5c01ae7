package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Multimodal column plumbing (C6 + north-star "multimodal columns"):
  * image/audio/video travel as opaque `binary` payloads with a typed
  * metadata struct alongside; decode / feature-extract / frame-sample
  * run as batched partition-local transforms over the payload bytes.
  *
  * The container has no image/audio codecs, so `decodeStub` is a
  * clearly-marked deterministic fake — but everything Spark-side that
  * matters at 100 TB is real and tested: the asset schema, the binary
  * column handling, the batched mapPartitions shape (the Scala analogue
  * of `mapInPandas` batches), and the pushdown-friendly metadata
  * projections.
  */
object Multimodal {

  /** Builds an asset table (asset_id, modality, payload, meta) from the
    * documents fixture — payload = utf-8 bytes standing in for a real
    * blob column read from object storage. */
  def assetsFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      concat(lit("text/"), col("lang")).as("modality"),
      col("text").cast("binary").as("payload"),
      struct(col("n_chars"), col("lang"), col("source")).as("meta"))

  /** REAL DECODER GOES HERE. The container ships no codecs, so this
    * deterministic stand-in derives "features" from raw bytes: length,
    * mean byte value, and a 4-bin byte histogram. Shape/contract match
    * what an image-embedding UDF would produce (fixed-width
    * Array[Double] per asset). */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    if (payload == null || payload.isEmpty) return Array.fill(6)(0.0)
    val hist = new Array[Double](4)
    var sum = 0.0
    payload.foreach { b =>
      val u = b & 0xff
      sum += u
      hist(u / 64) += 1.0
    }
    Array(payload.length.toDouble, sum / payload.length) ++ hist
  }

  /** Feature extraction over the payload column: batched
    * partition-local processing (batch size bounds peak memory exactly
    * like an Arrow batch would), appending `features: array<double>`.
    * No shuffle — scales with the scan. */
  def extractFeatures(assets: DataFrame, batchSize: Int = 256): DataFrame = {
    val schema = assets.schema.add("features", ArrayType(DoubleType, false))
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { it: Iterator[Row] =>
      it.grouped(batchSize).flatMap { batch =>
        // a real decoder would hand the whole batch to native code here
        batch.iterator.map { row =>
          val feats = decodeStub(row.getAs[Array[Byte]](payloadIdx))
          Row.fromSeq(row.toSeq :+ feats.toSeq)
        }
      }
    }(Encoders.row(schema))
  }

  /** Resize stub: decimate the payload to ≈`targetBytes` by keeping
    * every k-th byte (k = ceil(len/target)) — the partition-local,
    * shuffle-free shape of an image resize (a real one decodes, scales,
    * re-encodes inside the same batch loop; the codec is the only
    * missing piece in this container). Output is `resized: binary`
    * alongside the original payload so downstream can pick either. */
  def resize(assets: DataFrame, targetBytes: Int = 256,
             batchSize: Int = 256): DataFrame = {
    require(targetBytes > 0)
    val schema = assets.schema.add("resized",
      org.apache.spark.sql.types.BinaryType)
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { it: Iterator[Row] =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val p = row.getAs[Array[Byte]](payloadIdx)
          val out =
            if (p == null) null
            else if (p.length <= targetBytes) p
            else {
              val k = math.ceil(p.length.toDouble / targetBytes).toInt
              p.indices.collect { case i if i % k == 0 => p(i) }.toArray
            }
          Row.fromSeq(row.toSeq :+ out)
        }
      }
    }(Encoders.row(schema))
  }

  /** Frame/segment sampling stub: every `stride`-th slice of
    * `frameBytes` bytes — the partition-local slicing shape of video
    * frame sampling, minus the codec. */
  def sampleFrames(assets: DataFrame, frameBytes: Int = 64,
                   stride: Int = 4): DataFrame =
    assets.withColumn("frames",
      transform(
        sequence(lit(0L), greatest(
          floor((length(col("payload")) - 1) / lit(frameBytes * stride))
            .cast("long"), lit(0L))),
        i => substring(col("payload"), (i * frameBytes * stride + 1).cast("int"),
          lit(frameBytes))))
}
