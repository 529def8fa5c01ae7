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

  /** The cell-grid hash over an already-extracted luma plane — shared
    * by [[aHash]] (whole image) and [[hashFrames]] (per video frame):
    * identical grid mapping and integer bit rule in both. */
  private def hashLuma(w: Int, h: Int, luma: Array[Int],
                       gridW: Int, gridH: Int): Long = {
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

  /** DIFFERENCE-hash bits over a (gridW+1) × gridH cell grid: bit
    * (x, y) set when cell (x+1, y)'s mean luma exceeds cell (x, y)'s
    * — HORIZONTAL GRADIENTS instead of [[aHash]]'s mean compare.
    * Gradients survive what means don't (global contrast stretches,
    * vignettes, smooth lighting shifts), so real dedup kits run both
    * and OR the matches; exact integer cross-multiplied compares keep
    * it under the closed-form oracle like aHash. Bits row-major,
    * (gridW)·gridH of them. */
  private def dHashLuma(w: Int, h: Int, luma: Array[Int],
                        gridW: Int, gridH: Int): Long = {
    val gw = math.min(gridW + 1, w); val gh = math.min(gridH, h)
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
    var bits = 0L
    var cy = 0
    while (cy < gh) {
      var cx = 0
      while (cx < gw - 1) {
        val l = cy * gw + cx; val r = l + 1
        // exact integer compare of adjacent cell means
        if (cellSum(r) * cellN(l) > cellSum(l) * cellN(r))
          bits |= (1L << (cy * (gw - 1) + cx))
        cx += 1
      }
      cy += 1
    }
    bits
  }

  /** LETTERBOX / BORDER DETECTION — the crop step that runs BEFORE
    * perceptual hashing in real image dedup: a letterboxed re-upload
    * shares no aHash/dHash bits with its original because the black
    * bars own the luma grid, so pipelines measure the bars and hash
    * the interior. A row/column is BLANK when every pixel shares one
    * value ≤ `blackThresh`; each side's border is its run of leading
    * blank lines. Opposite sides are CLAMPED so top+bottom ≤ h and
    * left+right ≤ w (an all-blank frame reads top=h, bottom=0 — the
    * unclamped double-count would drive downstream interior-crop
    * arithmetic `h−top−bottom` negative). Exact integer scans → the
    * closed-form fixture oracle, like the hash family. Returns (top,
    * bottom, left, right) or None when the payload doesn't decode. */
  def borders(p: Array[Byte], blackThresh: Int = 16)
      : Option[(Int, Int, Int, Int)] =
    lumaPixels(p).map { case (w, h, luma) =>
      def rowBlank(y: Int): Boolean = {
        val v = luma(y * w)
        v <= blackThresh &&
          (0 until w).forall(x => luma(y * w + x) == v)
      }
      def colBlank(x: Int): Boolean = {
        val v = luma(x)
        v <= blackThresh &&
          (0 until h).forall(y => luma(y * w + x) == v)
      }
      val top = (0 until h).takeWhile(rowBlank).size
      val bottom = math.min(((h - 1) to 0 by -1).takeWhile(rowBlank).size,
        h - top)
      val left = (0 until w).takeWhile(colBlank).size
      val right = math.min(((w - 1) to 0 by -1).takeWhile(colBlank).size,
        w - left)
      (top, bottom, left, right)
    }

  /** [[borders]] over a payload frame: appends top/bottom/left/right
    * plus `boxed` = 1 when any side has a border. */
  def detectBorders(assets: DataFrame, blackThresh: Int = 16,
                    batchSize: Int = 256): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = assets.schema
      .add("top", LongType).add("bottom", LongType)
      .add("left", LongType).add("right", LongType)
      .add("boxed", IntegerType)
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { it: Iterator[Row] =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          borders(row.getAs[Array[Byte]](payloadIdx), blackThresh) match {
            case Some((t, b, l, r)) =>
              Row.fromSeq(row.toSeq ++ Seq[Any](t.toLong, b.toLong,
                l.toLong, r.toLong,
                if (t + b + l + r > 0) 1 else 0))
            case None =>
              Row.fromSeq(row.toSeq ++ Seq[Any](null, null, null, null,
                null))
          }
        }
      }
    }(Encoders.row(schema))
  }

  /** Difference hash of an image payload ([[dHashLuma]] over the same
    * decode paths as [[aHash]]). */
  def dHash(p: Array[Byte], gridW: Int = 8, gridH: Int = 8): Option[Long] = {
    require(gridW >= 1 && gridH >= 1 && gridW * gridH <= 64,
      "grid must hold at most 64 difference bits")
    lumaPixels(p).map { case (w, h, luma) =>
      dHashLuma(w, h, luma, gridW, gridH)
    }
  }

  /** [[hashImages]]' difference-hash sibling: appends `dhash`. */
  def dHashImages(assets: DataFrame, gridW: Int = 8, gridH: Int = 8,
                  batchSize: Int = 256): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = assets.schema.add("dhash", LongType)
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { it: Iterator[Row] =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val h = dHash(row.getAs[Array[Byte]](payloadIdx), gridW, gridH)
          Row.fromSeq(row.toSeq :+ h.map(Long.box).orNull)
        }
      }
    }(Encoders.row(schema))
  }

  /** Average hash over an (effective) min(gridW,w) × min(gridH,h) cell
    * grid, bits row-major from bit 0; unused high bits are 0. */
  def aHash(p: Array[Byte], gridW: Int = 8, gridH: Int = 8): Option[Long] = {
    require(gridW >= 1 && gridH >= 1 && gridW * gridH <= 64,
      "grid must hold at most 64 cells")
    lumaPixels(p).map { case (w, h, luma) =>
      hashLuma(w, h, luma, gridW, gridH)
    }
  }

  /** Per-frame luma planes of a multi-frame payload (animated GIF /
    * multi-page TIFF — the JDK's video stand-ins), via the same ImageIO
    * reader walk as [[Multimodal.decodeFrames]]. */
  private def frameLumas(p: Array[Byte], maxFrames: Int)
      : Option[Seq[(Int, Int, Int, Array[Int])]] = {
    if (p == null || p.length < 2) return None
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(p))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, false, true)
        val n = math.min(reader.getNumImages(true), maxFrames)
        if (n <= 0) return None
        val out = Seq.newBuilder[(Int, Int, Int, Array[Int])]
        var i = 0
        while (i < n) {
          if (reader.getWidth(i).toLong * reader.getHeight(i) >
              Multimodal.MaxDecodePixels) return None
          val img = reader.read(i)
          val w = img.getWidth; val h = img.getHeight
          if (w <= 0 || h <= 0) return None
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
          out += ((i, w, h, luma))
          i += 1
        }
        Some(out.result())
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (iis != null) iis.close()
  }

  /** Per-FRAME average hashes — the video arm of perceptual dedup: one
    * output row per decoded frame, appending `(frame_idx, fhash)`.
    * Undecodable payloads emit no rows (same posture as
    * decodeImageFrames). Narrow, batched, no shuffle — the hash stream
    * scales with the scan like every decoder here. */
  def hashFrames(assets: DataFrame, gridW: Int = 8, gridH: Int = 8,
                 maxFrames: Int = 256, batchSize: Int = 256): DataFrame = {
    require(gridW >= 1 && gridH >= 1 && gridW * gridH <= 64,
      "grid must hold at most 64 cells")
    import org.apache.spark.sql.types._
    val schema = assets.schema.add("frame_idx", LongType)
      .add("fhash", LongType)
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { it: Iterator[Row] =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { row =>
          frameLumas(row.getAs[Array[Byte]](payloadIdx), maxFrames)
            .getOrElse(Seq.empty)
            .map { case (f, w, h, luma) =>
              Row.fromSeq(row.toSeq ++ Seq(f.toLong,
                hashLuma(w, h, luma, gridW, gridH)))
            }
        }
      }
    }(Encoders.row(schema))
  }

  /** Per-asset FRAME SIGNATURE: the sorted distinct frame-hash array,
    * computed inside the same batched per-partition pass as
    * [[hashFrames]] — one row per asset, streaming-safe (no cross-row
    * distinct, so no state is needed to build signatures on a stream).
    * Appends `sig: array<long>`; undecodable payloads emit no row. */
  def frameSignatures(assets: DataFrame, gridW: Int = 8, gridH: Int = 8,
                      maxFrames: Int = 256, batchSize: Int = 256): DataFrame = {
    require(gridW >= 1 && gridH >= 1 && gridW * gridH <= 64)
    import org.apache.spark.sql.types._
    val schema = assets.schema
      .add("sig", ArrayType(LongType, containsNull = false))
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { it: Iterator[Row] =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { row =>
          frameLumas(row.getAs[Array[Byte]](payloadIdx), maxFrames).map {
            frames =>
              val sig = frames.map { case (_, w, h, luma) =>
                hashLuma(w, h, luma, gridW, gridH)
              }.distinct.sorted
              Row.fromSeq(row.toSeq :+ sig)
          }
        }
      }
    }(Encoders.row(schema))
  }

  /** VIDEO NEAR-DUP PAIRS from per-frame hashes — the composition that
    * turns frame hashing into video dedup: a video's signature is its
    * DISTINCT frame-hash set; two videos are near-dups when the
    * Jaccard overlap of their signatures reaches `minJaccard`
    * (re-encoded, trimmed, or shifted copies share most frames;
    * distinct footage shares none). Everything is exact integer
    * counting + ONE double division, so the whole detector sits under
    * the bit-exact oracle.
    *
    * `maxFrameDist > 0` makes the frame match HAMMING-TOLERANT: a
    * re-encode that nudges luma by one quantization step shifts a few
    * aHash bits, and exact-equality matching would walk the copy
    * straight through. Distinct frame hashes within Hamming distance
    * ≤ `maxFrameDist` are collapsed to a canonical representative
    * FIRST (the min hash among each hash's ≤-distance neighbors — a
    * ONE-HOP canonicalization: a↔b and b↔c collapse pairwise even
    * when a↔c exceeds the distance, and the min rule keeps it
    * deterministic and single-pass, no iterative closure), then the
    * exact pipeline runs on canonical hashes. Candidates for the
    * hash-universe collapse come from the same banded blocking as
    * [[nearDupPairs]] (lossless for maxFrameDist < nBands), and the
    * collapse join runs over DISTINCT hashes — a universe orders of
    * magnitude smaller than the frame table.
    *
    * Scale shape (100 TB): signatures via one distinct (one shuffle of
    * |frames| rows), candidate pairs via an equi-join ON THE FRAME
    * HASH (videos sharing ≥1 frame — never an all-pairs comparison),
    * then a pair-level hash agg. The stopword hazard — a frame hash
    * shared by half the corpus (black frames, title cards) exploding
    * the join — is capped by `maxHashFreq`: hashes held by more
    * assets are dropped from the candidate UNIVERSE entirely — they
    * stop identifying content — so both the overlap count AND the
    * signature sizes in the Jaccard denominator are computed over the
    * same filtered universe (an uncapped size under a capped overlap
    * would systematically understate the Jaccard of pairs sharing
    * common frames). Output: `(id_a, id_b, shared_frames, jaccard)`. */
  def videoNearDupPairs(frameHashes: DataFrame, idCol: String,
                        hashCol: String = "fhash",
                        minJaccard: Double = 0.5,
                        maxHashFreq: Int = 1000,
                        maxFrameDist: Int = 0,
                        nBands: Int = 8): DataFrame = {
    require(minJaccard > 0 && maxHashFreq >= 2 && maxFrameDist >= 0)
    val raw = frameHashes
      .select(col(idCol).as("__id"), col(hashCol).as("__h")).distinct()
    val sig = if (maxFrameDist == 0) raw else {
      require(maxFrameDist < nBands, "banded canonicalization is only " +
        s"lossless for maxFrameDist < nBands ($maxFrameDist >= $nBands)")
      require(64 % nBands == 0, "nBands must divide 64")
      val width = 64 / nBands
      val mask = if (width == 64) -1L else (1L << width) - 1
      val hb = raw.select(col("__h")).distinct()
        .select(col("__h"), explode(array((0 until nBands).map(b =>
          struct(lit(b).as("b"),
            shiftright(col("__h"), b * width).bitwiseAND(lit(mask))
              .as("v"))): _*)).as("__band"))
        .select(col("__h"), col("__band.b").as("__b"),
          col("__band.v").as("__v"))
      // self-pairs ride along (identical bands, distance 0), so every
      // hash gets a canonical value
      val canon = hb.toDF("__ha", "__b", "__v")
        .join(hb.toDF("__hb", "__b", "__v"), Seq("__b", "__v"))
        .select(col("__ha"), col("__hb")).distinct()
        .filter(bit_count(col("__ha").bitwiseXOR(col("__hb")))
          <= maxFrameDist)
        .groupBy(col("__ha").as("__h")).agg(min(col("__hb")).as("__ch"))
      raw.join(canon, "__h")
        .select(col("__id"), col("__ch").as("__h")).distinct()
    }
    val blockable = sig.join(
      sig.groupBy(col("__h")).agg(count(lit(1)).as("__f"))
        .filter(col("__f") <= maxHashFreq).select(col("__h")),
      "__h")
    // sizes over the SAME capped universe the overlap counts — the
    // Jaccard is then a true Jaccard of the filtered signatures
    val sizes = blockable.groupBy(col("__id")).agg(count(lit(1)).as("__sz"))
    val pairs = blockable.select(col("__id").as("id_a"), col("__h"))
      .join(blockable.select(col("__id").as("id_b"), col("__h")), "__h")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("shared_frames"))
    pairs
      .join(sizes.select(col("__id").as("id_a"), col("__sz").as("__sa")), "id_a")
      .join(sizes.select(col("__id").as("id_b"), col("__sz").as("__sb")), "id_b")
      .withColumn("jaccard", round(col("shared_frames").cast("double") /
        (col("__sa") + col("__sb") - col("shared_frames")).cast("double"), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "shared_frames", "jaccard")
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

  /** SHOT-BOUNDARY DETECTION + KEYFRAME SELECTION — the frame-sampling
    * op of a video training pipeline: instead of "every Nth frame"
    * (oversamples static shots, misses fast cuts), segment each video
    * where consecutive frame hashes jump by more than `maxDist` bits
    * and keep one keyframe per shot. The classic hash-based cut
    * detector, running on [[hashFrames]] output — pure integer
    * arithmetic (XOR + popcount on the aHash), so fixture videos sit
    * under the exact DuckDB oracle.
    *
    * Output, one row per frame: `(idCol, frame_idx, fhash, dist_prev
    * — null on frame 0, shot_idx — 0-based, is_keyframe — 1 on each
    * shot's first frame)`.
    *
    * Scale shape: two ordered windows per video over the FRAME axis
    * (bounded by `maxFrames` at decode, never corpus-sized); no joins,
    * no shuffle beyond the per-video partition. */
  def shotBoundaries(frameHashes: DataFrame, idCol: String,
                     hashCol: String = "fhash",
                     frameCol: String = "frame_idx",
                     maxDist: Int = 4): DataFrame = {
    require(maxDist >= 0)
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(idCol)).orderBy(col(frameCol))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, 0)
    frameHashes
      .withColumn("__prev", lag(col(hashCol), 1).over(wOrd))
      .withColumn("dist_prev",
        bit_count(col("__prev").bitwiseXOR(col(hashCol))).cast("long"))
      .withColumn("__cut",
        when(col("__prev").isNull || col("dist_prev") > maxDist, lit(1L))
          .otherwise(lit(0L)))
      .withColumn("shot_idx", sum(col("__cut")).over(wCum) - lit(1L))
      .select(col(idCol), col(frameCol), col(hashCol), col("dist_prev"),
        col("shot_idx"), col("__cut").as("is_keyframe"))
  }
}
