package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** IMAGE PERCEPTUAL HASHING (average hash) — near-duplicate detection
  * for the image modality: re-encoded, resized, or slightly-edited
  * copies of a picture land at small Hamming distance while distinct
  * pictures land far apart. The image-side sibling of the text
  * MinHash/SimHash family, built on the SAME real decoders
  * (JPEG/PNG/GIF/TIFF/BMP/PPM).
  *
  * The hash is deterministic INTEGER arithmetic end to end, so the
  * fixture-image queries sit under the exact DuckDB oracle:
  *
  *   1. per-pixel luma = r + g + b (no division, no weights),
  *   2. pixels map to a gw×gh grid cell by floor((x·gw)/w) — block
  *      average without resampling,
  *   3. bit c is set iff cellSum(c)·totalN > totalSum·cellN(c) —
  *      the "cell brighter than image mean" comparison done by exact
  *      cross-multiplication (no float thresholds anywhere).
  *
  * Scale shape: hashing is a narrow per-partition pass (same batched
  * mapPartitions as decodeImages — no shuffle). Pair generation blocks
  * on hash BANDS (nBands equal bit-slices): two hashes within Hamming
  * distance < nBands must share a band (pigeonhole), so candidates
  * come from one equi-join on (band index, band bits) and the exact
  * Hamming filter confirms — the SimHash banding argument, applied to
  * pixels. No all-pairs comparison anywhere.
  */
object PerceptualHash {

  /** (width, height, row-major luma r+g+b per pixel), via the PPM
    * parser or ImageIO; None for undecodable payloads. */
  private def lumaPixels(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
    if (p == null || p.length < 2) return None
    if (p(0) == 'P' && p(1) == '6') lumaFromPpm(p)
    else lumaViaImageIO(p)
  }

  private def lumaFromPpm(p: Array[Byte]): Option[(Int, Int, Array[Int])] = {
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
      skipWs(); var v = 0; var any = false
      while (i < p.length && p(i) >= '0' && p(i) <= '9') {
        v = v * 10 + (p(i) - '0'); i += 1; any = true
      }
      if (any) v else -1
    }
    val w = readInt(); val h = readInt(); val maxval = readInt()
    i += 1
    if (w <= 0 || h <= 0 || maxval != 255 ||
        w.toLong * h > Multimodal.MaxDecodePixels ||
        i + 3L * w * h > p.length) return None
    val luma = new Array[Int](w * h)
    var px = 0
    while (px < luma.length) {
      val o = i + 3 * px
      luma(px) = (p(o) & 0xff) + (p(o + 1) & 0xff) + (p(o + 2) & 0xff)
      px += 1
    }
    Some((w, h, luma))
  }

  private def lumaViaImageIO(p: Array[Byte]): Option[(Int, Int, Array[Int])] =
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(p))
      if (img == null) None
      else {
        val w = img.getWidth; val h = img.getHeight
        if (w <= 0 || h <= 0 || w.toLong * h > Multimodal.MaxDecodePixels) None
        else {
          val luma = new Array[Int](w * h)
          val rowBuf = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, rowBuf, 0, w)
            var x = 0
            while (x < w) {
              val px = rowBuf(x)
              luma(y * w + x) = ((px >> 16) & 0xff) + ((px >> 8) & 0xff) +
                (px & 0xff)
              x += 1
            }
            y += 1
          }
          Some((w, h, luma))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }

  /** Average hash over an (effective) min(gridW,w) × min(gridH,h) cell
    * grid, bits row-major from bit 0; unused high bits are 0. */
  def aHash(p: Array[Byte], gridW: Int = 8, gridH: Int = 8): Option[Long] = {
    require(gridW >= 1 && gridH >= 1 && gridW * gridH <= 64,
      "grid must hold at most 64 cells")
    lumaPixels(p).map { case (w, h, luma) =>
      val gw = math.min(gridW, w); val gh = math.min(gridH, h)
      val cellSum = new Array[Long](gw * gh)
      val cellN = new Array[Long](gw * gh)
      var y = 0
      while (y < h) {
        val cy = (y.toLong * gh / h).toInt
        var x = 0
        while (x < w) {
          val c = cy * gw + (x.toLong * gw / w).toInt
          cellSum(c) += luma(y * w + x); cellN(c) += 1
          x += 1
        }
        y += 1
      }
      val totalN = w.toLong * h
      var totalSum = 0L
      cellSum.foreach(totalSum += _)
      var bits = 0L; var c = 0
      while (c < cellSum.length) {
        // exact integer compare of cell mean vs global mean
        if (cellSum(c) * totalN > totalSum * cellN(c)) bits |= (1L << c)
        c += 1
      }
      bits
    }
  }

  /** Appends `phash: long` (null for undecodable payloads). Narrow,
    * batched, no shuffle. */
  def hashImages(assets: DataFrame, gridW: Int = 8, gridH: Int = 8,
                 batchSize: Int = 256): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = assets.schema.add("phash", LongType)
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { it: Iterator[Row] =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val h = aHash(row.getAs[Array[Byte]](payloadIdx), gridW, gridH)
          Row.fromSeq(row.toSeq :+ h.map(Long.box).orNull)
        }
      }
    }(Encoders.row(schema))
  }

  /** Near-duplicate image pairs (Hamming(phash) ≤ maxDist) via banded
    * blocking: nBands equal bit-slices, candidates share ≥1 band
    * (lossless for maxDist < nBands — pigeonhole), exact popcount
    * confirm. Output: `(id_a, id_b, dist)`. */
  def nearDupPairs(hashed: DataFrame, idCol: String,
                   maxDist: Int = 3, nBands: Int = 4): DataFrame = {
    require(maxDist < nBands, s"banding is only lossless for maxDist < " +
      s"nBands (got maxDist=$maxDist, nBands=$nBands)")
    require(64 % nBands == 0, "nBands must divide 64")
    val width = 64 / nBands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val bands = hashed.where(col("phash").isNotNull)
      .select(col(idCol).as("__id"), col("phash").as("__h"),
        explode(array((0 until nBands).map(b =>
          struct(lit(b).as("b"),
            shiftright(col("phash"), b * width).bitwiseAND(lit(mask))
              .as("v"))): _*)).as("__band"))
      .select(col("__id"), col("__h"), col("__band.b").as("__b"),
        col("__band.v").as("__v"))
    val l = bands.toDF("id_a", "__ha", "__b", "__v")
    val r = bands.toDF("id_b", "__hb", "__b", "__v")
    l.join(r, Seq("__b", "__v"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(first(col("__ha")).as("__ha"), first(col("__hb")).as("__hb"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("long").as("dist"))
      .where(col("dist") <= maxDist)
  }
}
