package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Multimodal column plumbing (C6 + north-star "multimodal columns"):
  * image/audio/video travel as opaque `binary` payloads with a typed
  * metadata struct alongside; decode / feature-extract / frame-sample
  * run as batched partition-local transforms over the payload bytes.
  *
  * [[decodeImage]] is a REAL pure-JVM decoder for two uncompressed
  * raster formats (binary PPM "P6" and 24-bit uncompressed BMP) —
  * header parse → (width, height) → per-channel pixel means — and
  * [[decodeImages]] runs it in the batched mapPartitions shape a
  * JPEG/PNG codec would use at 100 TB (the container ships no such
  * codecs; swapping the per-payload function is the only change).
  * [[decodeStub]]'s byte-level statistics remain as the generic
  * fallback for opaque modalities. Decoded output sits under the
  * DuckDB oracle via a deterministic PPM fixture (c6_image_decode)
  * whose pixel values are a closed form the oracle recomputes.
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

  /** Generic byte-level fallback for modalities [[decodeImage]] does
    * not cover: length, mean byte value, and a 4-bin byte histogram.
    * Shape/contract match what an embedding UDF would produce
    * (fixed-width Array[Double] per asset). */
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

  /** Decoded image facts: dimensions + per-channel means. */
  case class ImageInfo(format: String, width: Int, height: Int,
                       meanR: Double, meanG: Double, meanB: Double)

  /** Pure-JVM image decode: binary PPM (`P6`, 8-bit maxval) and
    * uncompressed 24-bit BMP (`BM`, BI_RGB). Returns None for anything
    * else (truncated, other formats) — callers fall back to byte-level
    * stats. Channel means divide the Long channel sum by the pixel
    * count in one double division, so the DuckDB oracle reproduces the
    * values bit-exactly. */
  def decodeImage(p: Array[Byte]): Option[ImageInfo] = {
    if (p == null || p.length < 2) None
    else if (p(0) == 'P' && p(1) == '6') decodePpm(p)
    else if (p(0) == 'B' && p(1) == 'M') decodeBmp(p)
    else None
  }

  private def decodePpm(p: Array[Byte]): Option[ImageInfo] = {
    // header: "P6" ws width ws height ws maxval single-ws, then raw RGB.
    // '#' comments run to end-of-line (PPM spec).
    var i = 2
    def skipWs(): Unit = {
      var go = true
      while (go && i < p.length) {
        val c = p(i).toChar
        if (c == '#') { while (i < p.length && p(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else go = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0; var any = false
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        v = v * 10 + (p(i) - '0'); i += 1; any = true
      }
      if (any) v else -1
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    i += 1 // the single whitespace after maxval
    if (w <= 0 || h <= 0 || maxval != 255 ||
        i + 3L * w * h > p.length) return None
    channelMeans(p, i, w, h, "ppm", rIdx = 0, gIdx = 1, bIdx = 2,
      rowPad = 0)
  }

  private def decodeBmp(p: Array[Byte]): Option[ImageInfo] = {
    def u16(o: Int) = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def i32(o: Int) = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8) |
      ((p(o + 2) & 0xff) << 16) | ((p(o + 3) & 0xff) << 24)
    if (p.length < 54) return None
    val dataOffset = i32(10)
    val w = i32(18); val h = i32(22) // h<0 = top-down; means don't care
    val bpp = u16(28); val compression = i32(30)
    val ah = math.abs(h)
    // all size arithmetic in Long: a hostile/corrupt header can carry
    // w ≈ 2³¹/3 where `w * 3` overflows Int and sails past the bound
    // check — the contract is "None for anything malformed", never an
    // ArrayIndexOutOfBounds that kills the task. dataOffset must also
    // be non-negative (i32 reads it signed) and past the 54-byte header.
    val rowBytes = w.toLong * 3
    val pad = ((4 - rowBytes % 4) % 4).toInt
    if (w <= 0 || ah <= 0 || bpp != 24 || compression != 0 ||
        dataOffset < 54 ||
        dataOffset.toLong + (rowBytes + pad) * ah > p.length) return None
    // BMP stores BGR
    channelMeans(p, dataOffset, w, ah, "bmp", rIdx = 2, gIdx = 1, bIdx = 0,
      rowPad = pad)
  }

  private def channelMeans(p: Array[Byte], off: Int, w: Int, h: Int,
                           fmt: String, rIdx: Int, gIdx: Int, bIdx: Int,
                           rowPad: Int): Option[ImageInfo] = {
    var r = 0L; var g = 0L; var b = 0L
    var i = off
    var row = 0
    while (row < h) {
      var colPx = 0
      while (colPx < w) {
        r += p(i + rIdx) & 0xff
        g += p(i + gIdx) & 0xff
        b += p(i + bIdx) & 0xff
        i += 3; colPx += 1
      }
      i += rowPad; row += 1
    }
    val n = w.toLong * h
    Some(ImageInfo(fmt, w, h, r.toDouble / n, g.toDouble / n, b.toDouble / n))
  }

  /** Deterministic PPM fixture: pixel byte at linear index i (RGB
    * interleaved, row-major) is `(seed + i) mod 256` — a closed form
    * the DuckDB oracle recomputes without touching the bytes. */
  def ppmFixtureBytes(w: Int, h: Int, seed: Long): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](3 * w * h)
    var i = 0
    while (i < px.length) { px(i) = ((seed + i) % 256).toByte; i += 1 }
    header ++ px
  }

  /** Batched image decode over the payload column, appending format /
    * width / height / mean_r / mean_g / mean_b (nulls where the payload
    * is not a decodable image). Same partition-local batch shape as
    * [[extractFeatures]] — no shuffle, scales with the scan. */
  def decodeImages(assets: DataFrame, batchSize: Int = 256): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = assets.schema
      .add("format", StringType).add("width", LongType).add("height", LongType)
      .add("mean_r", DoubleType).add("mean_g", DoubleType).add("mean_b", DoubleType)
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { it: Iterator[Row] =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val extra = decodeImage(row.getAs[Array[Byte]](payloadIdx)) match {
            case Some(info) => Seq(info.format, info.width.toLong,
              info.height.toLong, info.meanR, info.meanG, info.meanB)
            case None => Seq(null, null, null, null, null, null)
          }
          Row.fromSeq(row.toSeq ++ extra)
        }
      }
    }(Encoders.row(schema))
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
