package graft.multimodal

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType}

/** Multimodal column plumbing (C6 + north-star "multimodal columns"):
  * image/audio/video travel as opaque `binary` payloads with a typed
  * metadata struct alongside; decode / feature-extract / frame-sample
  * run as batched partition-local transforms over the payload bytes.
  *
  * [[decodeImage]] is a REAL decoder for the formats a training corpus
  * actually holds: JPEG / PNG / GIF / TIFF / BMP via `javax.imageio`
  * (the readers ship in `java.desktop` — pure JVM, no native codecs
  * needed), plus two hand-rolled fast paths (binary PPM "P6" and
  * 24-bit uncompressed BMP) whose integer arithmetic is bit-exact by
  * construction and feeds the DuckDB oracle. [[decodeImages]] runs it
  * in the batched mapPartitions shape. [[decodeStub]]'s byte-level
  * statistics remain as the generic fallback for opaque modalities
  * (audio/video payloads, text). Decoded output sits under the DuckDB
  * oracle two ways: a deterministic PPM fixture (c6_image_decode) and
  * a PNG fixture (c6_png_decode — PNG is lossless, so ImageIO's decoded
  * pixels equal the same closed form); lossy JPEG is rows+spec checked
  * (deterministic within one JDK, not across decoders).
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

  /** Image decode: hand-rolled parsers for binary PPM (`P6`, 8-bit
    * maxval) and uncompressed 24-bit BMP (`BM`, BI_RGB) — pure integer
    * arithmetic the DuckDB oracle reproduces bit-exactly — and
    * `javax.imageio` for everything it ships readers for (JPEG, PNG,
    * GIF, TIFF, and BMP variants the fast path skips, e.g. 32-bit).
    * Returns None for anything malformed or unrecognized — callers
    * fall back to byte-level stats. Channel means divide the Long
    * channel sum by the pixel count in one double division on every
    * path, so lossless formats land on the same closed form. */
  def decodeImage(p: Array[Byte]): Option[ImageInfo] = {
    if (p == null || p.length < 2) None
    else if (p(0) == 'P' && p(1) == '6') decodePpm(p)
    else if (p(0) == 'B' && p(1) == 'M') decodeBmp(p).orElse(decodeViaImageIO(p))
    else decodeViaImageIO(p)
  }

  /** Magic-byte gate so the common case (text/audio payloads that are
    * not images) skips ImageInputStream construction entirely — the
    * reader probe below costs a stream + registry scan per payload,
    * which at 100 TB is pure waste on non-image modalities. */
  /** Decode-size cap for ImageIO paths: payloads whose HEADER declares
    * more pixels than this return None instead of allocating the
    * buffer (a decode bomb's OutOfMemoryError escapes NonFatal and
    * would kill the task). */
  val MaxDecodePixels: Long = 1L << 24

  private def looksLikeImage(p: Array[Byte]): Boolean =
    p.length >= 4 && (
      (p(0) == 0x89.toByte && p(1) == 'P' && p(2) == 'N' && p(3) == 'G') ||
      (p(0) == 0xff.toByte && p(1) == 0xd8.toByte) ||              // JPEG
      (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||
      (p(0) == 'I' && p(1) == 'I' && p(2) == 42 && p(3) == 0) ||   // TIFF LE
      (p(0) == 'M' && p(1) == 'M' && p(2) == 0 && p(3) == 42) ||   // TIFF BE
      (p(0) == 'B' && p(1) == 'M'))

  /** JPEG/PNG/GIF/TIFF/BMP decode via `javax.imageio` (readers verified
    * present in this JDK's `java.desktop`). Pixels are read row-by-row
    * through `getRGB` into sRGB ints; for images already in 8-bit RGB
    * (every fixture and typical corpus JPEGs/PNGs) that conversion is
    * the identity, so lossless formats reproduce the source bytes and
    * the means match the hand-rolled parsers' closed form exactly.
    * Corrupt or truncated payloads return None, never throw — a bad
    * blob must not kill the task. */
  private[multimodal] def decodeViaImageIO(p: Array[Byte]): Option[ImageInfo] = {
    if (!looksLikeImage(p)) return None
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(p))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
        // decompression-bomb guard: dimensions come from the HEADER
        // (no pixel decode yet) — a few-KB payload can declare
        // 60000x60000 and reader.read would allocate ~14 GB, and the
        // resulting OutOfMemoryError is NOT caught by NonFatal. Bound
        // BEFORE decoding: 16.7M pixels (a 16 MP photo, ~67 MB ARGB
        // buffer) covers any sane corpus image.
        if (reader.getWidth(0).toLong * reader.getHeight(0) > MaxDecodePixels)
          return None
        val img = reader.read(0)
        val w = img.getWidth; val h = img.getHeight
        if (w <= 0 || h <= 0) return None
        var r = 0L; var g = 0L; var b = 0L
        val buf = new Array[Int](w)
        var y = 0
        while (y < h) {
          img.getRGB(0, y, w, 1, buf, 0, w)
          var x = 0
          while (x < w) {
            val px = buf(x)
            r += (px >>> 16) & 0xff; g += (px >>> 8) & 0xff; b += px & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Some(ImageInfo(fmt, w, h, r.toDouble / n, g.toDouble / n, b.toDouble / n))
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (iis != null) iis.close()
  }

  /** Per-frame facts for MULTI-FRAME images — animated GIF, multi-page
    * TIFF: the closest thing to video decode a pure JDK does, and the
    * real shape of frame-level corpus work (sample frames, embed each,
    * near-dup across frames). */
  case class FrameInfo(frameIdx: Int, format: String, width: Int,
                       height: Int, meanR: Double, meanG: Double,
                       meanB: Double)

  /** Decode every frame of a multi-frame image via `javax.imageio`
    * (`getNumImages` + per-index `read`). Frames are the STORED
    * images, not composited animation state — the right unit for
    * frame-level analysis. Same bomb guard and never-throw contract as
    * [[decodeViaImageIO]]; `maxFrames` bounds a hostile frame count. */
  def decodeFrames(p: Array[Byte], maxFrames: Int = 256)
      : Option[Seq[FrameInfo]] = {
    if (!looksLikeImage(p)) return None
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(p))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        // seekForwardOnly = false: counting frames requires a search
        reader.setInput(iis, false, true)
        val fmt = reader.getFormatName.toLowerCase(java.util.Locale.ROOT)
        val n = math.min(reader.getNumImages(true), maxFrames)
        if (n <= 0) return None
        val out = Seq.newBuilder[FrameInfo]
        var i = 0
        while (i < n) {
          if (reader.getWidth(i).toLong * reader.getHeight(i) >
              MaxDecodePixels) return None
          val img = reader.read(i)
          val w = img.getWidth; val h = img.getHeight
          if (w <= 0 || h <= 0) return None
          var r = 0L; var g = 0L; var b = 0L
          val buf = new Array[Int](w)
          var y = 0
          while (y < h) {
            img.getRGB(0, y, w, 1, buf, 0, w)
            var x = 0
            while (x < w) {
              val px = buf(x)
              r += (px >>> 16) & 0xff; g += (px >>> 8) & 0xff
              b += px & 0xff
              x += 1
            }
            y += 1
          }
          val np = w.toLong * h
          out += FrameInfo(i, fmt, w, h, r.toDouble / np, g.toDouble / np,
            b.toDouble / np)
          i += 1
        }
        Some(out.result())
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (iis != null) iis.close()
  }

  /** Deterministic multi-page TIFF fixture — the second multi-frame
    * container through the SAME pixel rule as [[gifFixtureBytes]]
    * (pixel(f, p) = (seed + 7f + p) mod 256, explicit 256-gray
    * IndexColorModel so the palette round-trips losslessly). TIFF is
    * the JDK's other native "video stand-in" (multi-page documents,
    * scanned sequences); decodeImageFrames/hashFrames walk it with the
    * identical reader loop. */
  def tiffFixtureBytes(w: Int, h: Int, nFrames: Int, seed: Long)
      : Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("tiff").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      val grays = Array.tabulate(256)(_.toByte)
      val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays,
        grays)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        var p = 0; var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = ((seed + 7L * f + p) % 256).toInt
            img.getRaster.setSample(x, y, 0, v)
            p += 1; x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
          null)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** Deterministic animated-GIF fixture: `nFrames` GRAYSCALE frames
    * with pixel(f, p) = (seed + 7f + p) mod 256 — at most 256 distinct
    * gray levels per frame, so the GIF palette encodes them
    * LOSSLESSLY and per-frame channel means have the same closed form
    * the PPM/PNG oracles use. */
  def gifFixtureBytes(w: Int, h: Int, nFrames: Int, seed: Long)
      : Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(baos)
    val writer =
      javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      // non-interlaced: the GIF writer's default writes interlaced row
      // order for sequence frames (measured: rows land permuted on
      // decode for heights the 4-pass pattern doesn't divide evenly)
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DISABLED)
      writer.prepareWriteSequence(null)
      // an EXPLICIT 256-gray palette: the GIF writer re-quantizes
      // TYPE_BYTE_GRAY through its own default palette (measured:
      // means off by 2-3 levels), but an indexed image's own
      // IndexColorModel is carried into the GIF color table verbatim
      val grays = Array.tabulate(256)(_.toByte)
      val icm = new java.awt.image.IndexColorModel(8, 256, grays, grays,
        grays)
      var f = 0
      while (f < nFrames) {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
        var p = 0; var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = ((seed + 7L * f + p) % 256).toInt
            img.getRaster.setSample(x, y, 0, v)
            p += 1; x += 1
          }
          y += 1
        }
        writer.writeToSequence(new javax.imageio.IIOImage(img, null, null),
          param)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    baos.toByteArray
  }

  /** Batched frame explosion over the payload column: one output row
    * per decoded frame, appending (frame_idx, format, width, height,
    * mean_r, mean_g, mean_b). Assets that do not decode emit no rows
    * (frame-level analysis has nothing to say about them — run
    * [[extractFeatures]] for the byte-stats fallback). Partition-local
    * like the other decoders: no shuffle, scales with the scan. */
  def decodeImageFrames(assets: DataFrame, batchSize: Int = 256)
      : DataFrame = {
    import org.apache.spark.sql.types._
    val schema = assets.schema
      .add("frame_idx", LongType)
      .add("format", StringType).add("width", LongType)
      .add("height", LongType)
      .add("mean_r", DoubleType).add("mean_g", DoubleType)
      .add("mean_b", DoubleType)
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { it: Iterator[Row] =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { row =>
          decodeFrames(row.getAs[Array[Byte]](payloadIdx))
            .getOrElse(Seq.empty)
            .map(fi => Row.fromSeq(row.toSeq ++ Seq(fi.frameIdx.toLong,
              fi.format, fi.width.toLong, fi.height.toLong,
              fi.meanR, fi.meanG, fi.meanB)))
        }
      }
    }(Encoders.row(schema))
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

  /** Decoded audio facts: channel count, sample rate, frame count,
    * mean and peak |amplitude| over all 16-bit samples. */
  case class AudioInfo(format: String, channels: Int, sampleRate: Int,
                       nFrames: Long, meanAbs: Double, peakAbs: Long)

  /** Pure-JVM WAV decode (RIFF / PCM 16-bit little-endian — the format
    * raw speech corpora actually ship): chunk walk → fmt → data →
    * per-sample integer stats. The mean divides a Long |sample| sum by
    * the sample count in ONE double division, so the DuckDB oracle
    * reproduces it bit-exactly from a closed-form fixture (same trick
    * as the PPM pixel means). Returns None for anything malformed or
    * non-PCM-16 — a bad blob must never kill the task. All size
    * arithmetic in Long (hostile chunk lengths must fail the bounds
    * check, not overflow past it). MultimodalSpec cross-checks the
    * parse against `javax.sound.sampled.AudioSystem` (also pure JVM,
    * ships in java.desktop) so the hand-rolled header walk agrees with
    * the platform decoder on format facts. */
  def decodeWav(p: Array[Byte]): Option[AudioInfo] = wavHeader(p).map {
    case (channels, rate, start, nSamples) =>
      var sum = 0L; var peak = 0L; var i = 0
      while (i < nSamples) {
        val a = math.abs(pcm16(p, start, i).toLong)
        sum += a; if (a > peak) peak = a
        i += 1
      }
      AudioInfo("wav", channels, rate, nSamples.toLong / channels,
        sum.toDouble / nSamples, peak)
  }

  /** 16-bit little-endian sample `i` of the data chunk at `start`. */
  @inline private def pcm16(p: Array[Byte], start: Int, i: Int): Int =
    ((p(start + 2 * i) & 0xff) | (p(start + 2 * i + 1) << 8)).toShort.toInt

  /** Shared RIFF walk: `(channels, rate, dataStart, nSamples)` for a
    * valid PCM-16 WAV, None otherwise. */
  private def wavHeader(p: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    if (p == null || p.length < 44) return None
    def u16(o: Int) = (p(o) & 0xff) | ((p(o + 1) & 0xff) << 8)
    def u32(o: Int): Long = (p(o) & 0xffL) | ((p(o + 1) & 0xffL) << 8) |
      ((p(o + 2) & 0xffL) << 16) | ((p(o + 3) & 0xffL) << 24)
    def tag(o: Int) = new String(p, o, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12L
    var channels = 0; var rate = 0; var bits = 0; var fmtOk = false
    while (off + 8 <= p.length) {
      val id = tag(off.toInt); val len = u32(off.toInt + 4)
      if (id == "fmt " && len >= 16 && off + 8 + 16 <= p.length) {
        val audioFormat = u16(off.toInt + 8)
        channels = u16(off.toInt + 10)
        rate = u32(off.toInt + 12).toInt
        bits = u16(off.toInt + 22)
        fmtOk = audioFormat == 1 && bits == 16 && channels >= 1 && rate > 0
      } else if (id == "data") {
        if (!fmtOk || off + 8 + len > p.length || len % 2 != 0) return None
        val nSamples = (len / 2).toInt
        if (nSamples == 0 || nSamples % channels != 0) return None
        return Some((channels, rate, off.toInt + 8, nSamples))
      }
      // chunks are word-aligned: odd-length chunks carry a pad byte
      off += 8 + len + (len % 2)
    }
    None
  }

  /** Deterministic WAV fixture: 16-bit sample at linear index i is
    * `((seed + i) mod 65536) - 32768` — full-range PCM whose |sample|
    * stats are a closed form the DuckDB oracle recomputes without
    * touching the bytes. */
  def wavFixtureBytes(nFrames: Int, channels: Int, sampleRate: Int,
                      seed: Long): Array[Byte] = {
    val nSamples = nFrames * channels
    val dataLen = nSamples * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = (0 to 3).foreach(s => out.write(((v >> (8 * s)) & 0xff).toInt))
    out.write("RIFF".getBytes("US-ASCII")); w32(36L + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16L)
    w16(1); w16(channels); w32(sampleRate.toLong)
    w32(sampleRate.toLong * channels * 2); w16(channels * 2); w16(16)
    out.write("data".getBytes("US-ASCII")); w32(dataLen.toLong)
    var i = 0
    while (i < nSamples) { w16((((seed + i) % 65536) - 32768).toInt); i += 1 }
    out.toByteArray
  }

  /** Block-modulated WAV fixture for the VAD family: sample i is
    * `((i / 64) % 2) · 20000 + ((seed + i) % 7)` — alternating loud /
    * near-silent 64-sample blocks with a tiny seed-keyed dither, a
    * closed form the DuckDB oracle recomputes without the bytes.
    * Mono PCM-16 (the block structure is the point, not channels). */
  def wavBlockFixtureBytes(nFrames: Int, sampleRate: Int,
                           seed: Long): Array[Byte] = {
    val dataLen = nFrames * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = (0 to 3).foreach(s => out.write(((v >> (8 * s)) & 0xff).toInt))
    out.write("RIFF".getBytes("US-ASCII")); w32(36L + dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII")); w32(16L)
    w16(1); w16(1); w32(sampleRate.toLong)
    w32(sampleRate.toLong * 2); w16(2); w16(16)
    out.write("data".getBytes("US-ASCII")); w32(dataLen.toLong)
    var i = 0
    while (i < nFrames) {
      w16((((i / 64) % 2) * 20000 + ((seed + i) % 7)).toInt)
      i += 1
    }
    out.toByteArray
  }

  /** Batched WAV decode over the payload column, appending channels /
    * sample_rate / n_frames / mean_abs / peak_abs (nulls where the
    * payload is not PCM-16 WAV). Same partition-local batch shape as
    * [[decodeImages]] — no shuffle, scales with the scan. */
  def decodeAudios(assets: DataFrame, batchSize: Int = 256): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = assets.schema
      .add("aformat", StringType).add("channels", LongType)
      .add("sample_rate", LongType).add("n_frames", LongType)
      .add("mean_abs", DoubleType).add("peak_abs", LongType)
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { it: Iterator[Row] =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val extra = decodeWav(row.getAs[Array[Byte]](payloadIdx)) match {
            case Some(a) => Seq(a.format, a.channels.toLong, a.sampleRate.toLong,
              a.nFrames, a.meanAbs, a.peakAbs)
            case None => Seq(null, null, null, null, null, null)
          }
          Row.fromSeq(row.toSeq ++ extra)
        }
      }
    }(Encoders.row(schema))
  }

  /** WINDOWED AUDIO FEATURES — the speech-pipeline framing step (VAD,
    * silence trimming, segment-level quality gates all consume
    * fixed-length frame features, not whole-file stats): split each
    * PCM-16 WAV into consecutive windows of `frameLen` PCM frames
    * (`frameLen × channels` samples; the tail window is partial) and
    * emit per window the sample count, mean/peak |amplitude| and the
    * exact integer ENERGY (Σ s² — the VAD statistic). All features are
    * integer sums plus one double division, so the closed-form fixture
    * sits under the exact DuckDB oracle like the whole-file decode.
    *
    * One output row per window, ~`nFrames / frameLen` per asset —
    * bounded fan-out of a narrow flatMap, no shuffle, scales with the
    * scan exactly like [[decodeAudios]]. */
  def audioFrameFeatures(assets: DataFrame, frameLen: Int = 512,
                         batchSize: Int = 256): DataFrame = {
    require(frameLen >= 1)
    import org.apache.spark.sql.types._
    val schema = assets.schema
      .add("frame_idx", LongType).add("n_samples", LongType)
      .add("mean_abs", DoubleType).add("peak_abs", LongType)
      .add("energy", LongType)
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { it: Iterator[Row] =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { row =>
          wavHeader(row.getAs[Array[Byte]](payloadIdx)) match {
            case Some((channels, _, start, nSamples)) =>
              val p = row.getAs[Array[Byte]](payloadIdx)
              val win = frameLen * channels
              val nWin = (nSamples + win - 1) / win
              (0 until nWin).iterator.map { f =>
                val lo = f * win
                val hi = math.min(lo + win, nSamples)
                var sum = 0L; var peak = 0L; var energy = 0L
                var i = lo
                while (i < hi) {
                  val s = pcm16(p, start, i).toLong
                  val a = math.abs(s)
                  sum += a; if (a > peak) peak = a
                  energy += s * s
                  i += 1
                }
                val n = (hi - lo).toLong
                // Seq[Any], NOT Seq(...): mixed Long/Double literals
                // would numeric-widen the whole Seq to Double
                Row.fromSeq(row.toSeq ++ Seq[Any](f.toLong, n,
                  sum.toDouble / n, peak, energy))
              }
            case None => Iterator.empty
          }
        }
      }
    }(Encoders.row(schema))
  }

  /** Letterboxed PPM fixture for the border-detection family: luma
    * v(x, y) = 0 inside the planted top/bottom/left/right borders,
    * `60 + (seed + x + 3y) mod 40` in the interior (varies with both
    * axes, so no interior line is ever uniform) — closed form the
    * oracle recomputes. Luma rides the red channel (g = b = 0). */
  def ppmBorderFixtureBytes(w: Int, h: Int, top: Int, bottom: Int,
                            left: Int, right: Int,
                            seed: Long): Array[Byte] = {
    require(top + bottom < h && left + right < w)
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](3 * w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v =
          if (y < top || y >= h - bottom || x < left || x >= w - right) 0
          else (60 + ((seed + x + 3L * y) % 40)).toInt
        px(3 * (y * w + x)) = v.toByte
        x += 1
      }
      y += 1
    }
    header ++ px
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

  /** Deterministic REAL-format image fixture with the SAME pixel closed
    * form as [[ppmFixtureBytes]] — channel byte at linear index i (RGB
    * interleaved, row-major) is `(seed + i) mod 256` — encoded through
    * `javax.imageio.ImageIO.write`. For lossless formats ("png", "bmp")
    * the decoded pixels equal that closed form exactly, so the DuckDB
    * oracle covers real-format decode with the identical arithmetic it
    * already uses for PPM; "jpg" is lossy and sits under rows+spec
    * checks only. */
  def imageFixtureBytes(w: Int, h: Int, seed: Long, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var p = 0; var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = 3L * p
        val r = ((seed + i) % 256).toInt
        val g = ((seed + i + 1) % 256).toInt
        val b = ((seed + i + 2) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        p += 1; x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    val ok = javax.imageio.ImageIO.write(img, format, baos)
    require(ok, s"no ImageIO writer for format '$format'")
    baos.toByteArray
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

  /** Feature vector for a decoded image — same fixed width (6) as
    * [[decodeStub]]'s byte-stats vector so the two branches of
    * [[extractFeatures]] are schema-compatible: width, height,
    * per-channel means, pixel count. */
  def imageFeatures(info: ImageInfo): Array[Double] =
    Array(info.width.toDouble, info.height.toDouble,
      info.meanR, info.meanG, info.meanB,
      info.width.toDouble * info.height)

  /** Feature vector for decoded audio — fixed width 6 like the other
    * branches: channels, sample rate, frames, mean/peak |amplitude|,
    * duration in seconds. */
  def audioFeatures(a: AudioInfo): Array[Double] =
    Array(a.channels.toDouble, a.sampleRate.toDouble, a.nFrames.toDouble,
      a.meanAbs, a.peakAbs.toDouble, a.nFrames.toDouble / a.sampleRate)

  /** Feature extraction over the payload column: batched
    * partition-local processing (batch size bounds peak memory exactly
    * like an Arrow batch would), appending `features: array<double>`.
    * Payloads that decode as images ([[decodeImage]] — JPEG/PNG/GIF/
    * TIFF/BMP/PPM) get REAL [[imageFeatures]]; PCM-16 WAV payloads get
    * [[audioFeatures]]; everything else falls back to [[decodeStub]]
    * byte statistics. No shuffle — scales with the scan. */
  def extractFeatures(assets: DataFrame, batchSize: Int = 256): DataFrame = {
    val schema = assets.schema.add("features", ArrayType(DoubleType, false))
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { it: Iterator[Row] =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val p = row.getAs[Array[Byte]](payloadIdx)
          val feats = decodeImage(p).map(imageFeatures)
            .orElse(decodeWav(p).map(audioFeatures))
            .getOrElse(decodeStub(p))
          Row.fromSeq(row.toSeq :+ feats.toSeq)
        }
      }
    }(Encoders.row(schema))
  }

  /** Byte-level decimation to ≈`targetBytes` (keep every k-th byte,
    * k = ceil(len/target)) — the partition-local, shuffle-free shape
    * of a payload downsample for OPAQUE modalities (audio/video bytes
    * this library doesn't decode). For images, [[resizeImages]] does a
    * real decode → scale → re-encode. Output is `resized: binary`
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

  /** REAL image resize: decode (ImageIO formats — JPEG/PNG/GIF/TIFF/
    * BMP), bilinear-scale to `targetW` × `targetH` offscreen (works
    * headless: BufferedImage rasters need no display), re-encode as
    * PNG (lossless, so resized bytes are deterministic for one JDK's
    * scaler). Non-image payloads get a null `resized_img`. Batched
    * partition-local, no shuffle — the 100 TB thumbnail-generation
    * shape. */
  def resizeImages(assets: DataFrame, targetW: Int, targetH: Int,
                   batchSize: Int = 256): DataFrame = {
    require(targetW > 0 && targetH > 0)
    val schema = assets.schema.add("resized_img",
      org.apache.spark.sql.types.BinaryType)
    val payloadIdx = assets.schema.fieldIndex("payload")
    assets.mapPartitions { it: Iterator[Row] =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { row =>
          val p = row.getAs[Array[Byte]](payloadIdx)
          Row.fromSeq(row.toSeq :+ resizeOne(p, targetW, targetH).orNull)
        }
      }
    }(Encoders.row(schema))
  }

  /** Decode → bilinear scale → PNG re-encode for one payload; None when
    * the payload is not an ImageIO-decodable image. Uses the same
    * header-dimension bound as [[decodeViaImageIO]] (ImageIO.read
    * directly would decode a declared-huge bomb before we could check). */
  private[multimodal] def resizeOne(p: Array[Byte], tw: Int,
                                    th: Int): Option[Array[Byte]] = {
    if (p == null || !looksLikeImage(p)) return None
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(p))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        if (reader.getWidth(0).toLong * reader.getHeight(0) > MaxDecodePixels)
          return None
        val img = reader.read(0)
        val out = new java.awt.image.BufferedImage(
          tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
        val g2 = out.createGraphics()
        try {
          g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g2.drawImage(img, 0, 0, tw, th, null)
        } finally g2.dispose()
        val baos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(out, "png", baos)
        Some(baos.toByteArray)
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (iis != null) iis.close()
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
