package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val assets =
    Multimodal.assetsFromDocuments(Tables.documents(spark, sf0001)).cache()

  test("asset schema carries binary payload + typed metadata") {
    val f = assets.schema("payload")
    assert(f.dataType.typeName === "binary")
    assert(assets.schema("meta").dataType.typeName === "struct")
  }

  test("feature extraction: fixed width, first feature = byte length") {
    val feats = Multimodal.extractFeatures(assets)
    val bad = feats.filter(
      size(col("features")) =!= 6 ||
      element_at(col("features"), 1) =!= length(col("payload")).cast("double"))
    assert(bad.count() === 0)
  }

  test("feature extraction preserves row count and is deterministic") {
    val a = Multimodal.extractFeatures(assets)
    assert(a.count() === assets.count())
    val s1 = a.agg(round(sum(element_at(col("features"), 2)), 6)).collect()(0).getDouble(0)
    val s2 = Multimodal.extractFeatures(assets)
      .agg(round(sum(element_at(col("features"), 2)), 6)).collect()(0).getDouble(0)
    assert(s1 === s2)
  }

  test("frame sampling produces non-empty frame arrays") {
    val framed = Multimodal.sampleFrames(assets)
    assert(framed.filter(size(col("frames")) < 1).count() === 0)
  }

  test("PPM decode is bit-exact on hand-computed fixture") {
    // 2x2 image, seed 0: bytes 0..11; channel sums R=0+3+6+9=18,
    // G=1+4+7+10=22, B=2+5+8+11=26; means /4
    val info = Multimodal.decodeImage(Multimodal.ppmFixtureBytes(2, 2, 0L)).get
    assert(info === Multimodal.ImageInfo("ppm", 2, 2, 4.5, 5.5, 6.5))
    // comments and multi-digit dims parse
    val withComment =
      ("P6\n# a comment\n2 2\n255\n".getBytes("US-ASCII") ++
        Multimodal.ppmFixtureBytes(2, 2, 0L).drop("P6\n2 2\n255\n".length))
    assert(Multimodal.decodeImage(withComment) === Some(info))
  }

  test("BMP decode handles padding, BGR order and bottom-up rows") {
    // 3x2 24-bit BMP: rowBytes=9, pad=3. Pixel (x,y) = (R=10x+y, G=100, B=7)
    val w = 3; val h = 2
    val pad = (4 - (w * 3) % 4) % 4
    val body = new java.io.ByteArrayOutputStream()
    def le32(v: Int) = (0 to 3).foreach(s => body.write((v >> (8 * s)) & 0xff))
    def le16(v: Int) = (0 to 1).foreach(s => body.write((v >> (8 * s)) & 0xff))
    body.write('B'); body.write('M')
    le32(54 + (w * 3 + pad) * h); le32(0); le32(54) // size, reserved, offset
    le32(40); le32(w); le32(h); le16(1); le16(24)   // DIB, w, h, planes, bpp
    le32(0); le32(0); le32(0); le32(0); le32(0); le32(0) // BI_RGB + tail
    for (y <- (h - 1) to 0 by -1) { // bottom-up
      for (x <- 0 until w) {
        body.write(7); body.write(100); body.write(10 * x + y) // B,G,R
      }
      (0 until pad).foreach(_ => body.write(0))
    }
    val info = Multimodal.decodeImage(body.toByteArray).get
    // R mean = (0+10+20 + 1+11+21)/6 = 63/6 = 10.5
    assert(info === Multimodal.ImageInfo("bmp", 3, 2, 10.5, 100.0, 7.0))
  }

  test("hostile BMP headers return None, never throw (negative offset, w*3 overflow)") {
    def bmp(dataOffset: Int, w: Int, h: Int): Array[Byte] = {
      val body = new java.io.ByteArrayOutputStream()
      def le32(v: Int) = (0 to 3).foreach(s => body.write((v >> (8 * s)) & 0xff))
      def le16(v: Int) = (0 to 1).foreach(s => body.write((v >> (8 * s)) & 0xff))
      body.write('B'); body.write('M')
      le32(58); le32(0); le32(dataOffset)
      le32(40); le32(w); le32(h); le16(1); le16(24)
      le32(0); le32(0); le32(0); le32(0); le32(0); le32(0)
      body.write(0); body.write(0); body.write(0); body.write(0)
      body.toByteArray
    }
    // negative data offset (i32 reads the field signed)
    assert(Multimodal.decodeImage(bmp(-1, 1, 1)) === None)
    // offset pointing inside the header
    assert(Multimodal.decodeImage(bmp(10, 1, 1)) === None)
    // w*3 overflows Int to a tiny positive number
    assert(Multimodal.decodeImage(bmp(54, 0x55555556, 1)) === None)
    // h = Int.MinValue: math.abs stays negative
    assert(Multimodal.decodeImage(bmp(54, 1, Int.MinValue)) === None)
  }

  test("ImageIO decode: lossless PNG/BMP fixtures match the PPM closed form exactly") {
    // imageFixtureBytes encodes the SAME pixels as ppmFixtureBytes;
    // lossless round-trips must land on the identical channel means
    for ((w, h, seed) <- Seq((4, 3, 0L), (8, 6, 17L), (5, 5, 200L))) {
      val ppm = Multimodal.decodeImage(Multimodal.ppmFixtureBytes(w, h, seed)).get
      val png = Multimodal.decodeImage(
        Multimodal.imageFixtureBytes(w, h, seed, "png")).get
      assert(png.format === "png" && png.width === w && png.height === h)
      assert((png.meanR, png.meanG, png.meanB) ===
        ((ppm.meanR, ppm.meanG, ppm.meanB)), s"png means diverged at $w x $h")
      // ImageIO-WRITTEN BMP and TIFF decoded by ImageIO must also be
      // exact (both lossless; the TIFF reader/writer ship in the JDK
      // since 9)
      for (fmt <- Seq("bmp", "tiff")) {
        val got = Multimodal.decodeImage(
          Multimodal.imageFixtureBytes(w, h, seed, fmt)).get
        assert(got.width === w && got.height === h, s"$fmt dims")
        assert((got.meanR, got.meanG, got.meanB) ===
          ((ppm.meanR, ppm.meanG, ppm.meanB)),
          s"$fmt means diverged at $w x $h")
      }
    }
  }

  test("ImageIO decode: JPEG dims exact, means near the source (lossy bound)") {
    for ((w, h, seed) <- Seq((4, 3, 0L), (8, 6, 17L))) {
      val src = Multimodal.decodeImage(Multimodal.ppmFixtureBytes(w, h, seed)).get
      val jpg = Multimodal.decodeImage(
        Multimodal.imageFixtureBytes(w, h, seed, "jpg")).get
      assert(jpg.format === "jpeg" && jpg.width === w && jpg.height === h)
      // the fixture ramps each channel by 3/pixel (smooth), so the mean
      // survives DCT quantization to within a few levels
      assert(math.abs(jpg.meanR - src.meanR) <= 16.0 &&
             math.abs(jpg.meanG - src.meanG) <= 16.0 &&
             math.abs(jpg.meanB - src.meanB) <= 16.0,
        s"jpeg means too far from source at $w x $h: $jpg vs $src")
    }
    // and the decode is deterministic within this JDK
    val a = Multimodal.decodeImage(Multimodal.imageFixtureBytes(8, 6, 17L, "jpg"))
    val b = Multimodal.decodeImage(Multimodal.imageFixtureBytes(8, 6, 17L, "jpg"))
    assert(a === b)
  }

  test("GIF decode: dims exact (palette formats route through ImageIO)") {
    val gif = Multimodal.decodeImage(
      Multimodal.imageFixtureBytes(4, 3, 5L, "gif")).get
    assert(gif.format === "gif" && gif.width === 4 && gif.height === 3)
  }

  test("fuzz: decoders never throw on random or bit-flipped payloads") {
    // the per-payload contract is "None (or byte-stats) for anything
    // malformed, never an exception" — a bad blob must not kill a
    // 100 TB scan task. Seeded fuzz: pure-random buffers plus
    // bit-flipped valid fixtures (the nastier case: plausible headers,
    // corrupt bodies).
    val rng = new scala.util.Random(42)
    val fixtures = Seq(
      Multimodal.ppmFixtureBytes(4, 3, 7L),
      Multimodal.imageFixtureBytes(4, 3, 7L, "png"),
      Multimodal.imageFixtureBytes(4, 3, 7L, "jpg"),
      Multimodal.imageFixtureBytes(4, 3, 7L, "bmp"),
      Multimodal.wavFixtureBytes(8, 2, 8000, 7L))
    val payloads =
      (1 to 100).map(_ => Array.fill(rng.nextInt(200))(rng.nextInt().toByte)) ++
      (1 to 100).map { _ =>
        val f = fixtures(rng.nextInt(fixtures.length)).clone()
        (0 until 1 + rng.nextInt(8)).foreach { _ =>
          val i = rng.nextInt(f.length)
          f(i) = (f(i) ^ (1 << rng.nextInt(8))).toByte
        }
        f
      } ++
      fixtures.map(_.take(7)) // truncated headers
    payloads.foreach { p =>
      Multimodal.decodeImage(p)   // Option or nothing — must not throw
      Multimodal.decodeWav(p)
      Multimodal.resizeOne(p, 4, 4)
      val feats = Multimodal.decodeStub(p)
      assert(feats.length === 6)
    }
  }

  test("resizeImages round-trips: resized PNG decodes at target dims") {
    import spark.implicits._
    val fixture = Seq(
      (1L, Multimodal.imageFixtureBytes(4, 3, 1L, "png")),
      (2L, Multimodal.imageFixtureBytes(8, 6, 2L, "jpg")),
      (3L, "not an image".getBytes))
      .toDF("asset_id", "payload")
    val resized = Multimodal.resizeImages(fixture, targetW = 8, targetH = 8)
    val rows = resized.select("asset_id", "resized_img").collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(rows(3L) === null, "non-image payload should not resize")
    for (id <- Seq(1L, 2L)) {
      val info = Multimodal.decodeImage(rows(id)).get
      assert(info.format === "png" && info.width === 8 && info.height === 8,
        s"asset $id resized to $info")
    }
    // solid-color image resizes to the same solid color (bilinear is
    // exact on a constant field) — pins that scaling touches pixels,
    // not just headers
    val solid = {
      val img = new java.awt.image.BufferedImage(6, 6,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 6; x <- 0 until 6) img.setRGB(x, y, 0x405060)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos); baos.toByteArray
    }
    val r2 = Multimodal.resizeOne(solid, 3, 3).get
    val i2 = Multimodal.decodeImage(r2).get
    assert((i2.meanR, i2.meanG, i2.meanB) === ((0x40.toDouble, 0x50.toDouble, 0x60.toDouble)))
  }

  test("WAV decode is bit-exact on a hand-computed fixture; stereo frames divide") {
    // 4 frames mono, seed 0: samples 0..3 → value (i - 32768), abs =
    // 32768 - i; mean = (32768+32767+32766+32765)/4 = 32766.5, peak 32768
    val mono = Multimodal.decodeWav(
      Multimodal.wavFixtureBytes(4, 1, 8000, 0L)).get
    assert(mono === Multimodal.AudioInfo("wav", 1, 8000, 4, 32766.5, 32768))
    // stereo: 4 frames x 2 channels = 8 samples, frames = samples/channels
    val stereo = Multimodal.decodeWav(
      Multimodal.wavFixtureBytes(4, 2, 16000, 100L)).get
    assert(stereo.channels === 2 && stereo.sampleRate === 16000 &&
      stereo.nFrames === 4)
    // the platform decoder (javax.sound, also pure JVM) agrees on the
    // format facts — pins the hand-rolled header walk against AudioSystem
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(
        Multimodal.wavFixtureBytes(4, 2, 16000, 100L)))
    assert(ais.getFormat.getChannels === 2)
    assert(ais.getFormat.getSampleRate === 16000.0f)
    assert(ais.getFormat.getSampleSizeInBits === 16)
    assert(ais.getFrameLength === 4L)
  }

  test("audioFrameFeatures: windows tile the samples; tail partial; energy exact") {
    import spark.implicits._
    // 5 mono frames, frameLen 2 → windows of 2 samples: [0,1],[2,3],[4]
    val fixture = Seq((7L, Multimodal.wavFixtureBytes(5, 1, 8000, 0L)))
      .toDF("asset_id", "payload")
    val rows = Multimodal.audioFrameFeatures(fixture, frameLen = 2)
      .select("frame_idx", "n_samples", "mean_abs", "peak_abs", "energy")
      .orderBy("frame_idx").collect()
    assert(rows.length === 3)
    assert(rows.map(_.getLong(1)).toSeq === Seq(2L, 2L, 1L))
    // seed 0: sample i = i - 32768; |s| = 32768 - i; energy Σ (i-32768)²
    def e(i: Long) = (i - 32768L) * (i - 32768L)
    assert(rows(0).getLong(4) === e(0) + e(1))
    assert(rows(2).getLong(4) === e(4))
    assert(rows(0).getDouble(2) === (32768.0 + 32767.0) / 2)
    assert(rows(2).getLong(3) === 32764L)
    // windows sum back to the whole-file stats
    val whole = Multimodal.decodeWav(
      Multimodal.wavFixtureBytes(5, 1, 8000, 0L)).get
    assert(rows.map(_.getLong(1)).sum === 5L)
    assert(rows.map(r => r.getDouble(2) * r.getLong(1)).sum / 5.0
      === whole.meanAbs)
    // junk payloads produce zero frame rows, never a throw
    val junk = Seq((8L, "not audio".getBytes)).toDF("asset_id", "payload")
    assert(Multimodal.audioFrameFeatures(junk, frameLen = 2).count() === 0L)
  }

  test("hostile/malformed WAV returns None, never throws") {
    val good = Multimodal.wavFixtureBytes(4, 1, 8000, 0L)
    assert(Multimodal.decodeWav(null) === None)
    assert(Multimodal.decodeWav("RIFFxxxx".getBytes) === None) // truncated
    assert(Multimodal.decodeWav(good.take(40)) === None)       // cut header
    // data chunk length larger than the payload
    val liar = good.clone()
    liar(43) = 0x7f // inflate the data length field
    assert(Multimodal.decodeWav(liar) === None)
    // non-PCM audioFormat
    val nonPcm = good.clone(); nonPcm(20) = 3
    assert(Multimodal.decodeWav(nonPcm) === None)
    // text payloads fall through instantly
    assert(Multimodal.decodeWav("not audio at all, just text".getBytes) === None)
  }

  test("extractFeatures routes audio payloads through the WAV decode") {
    import spark.implicits._
    val fixture = Seq(
      (1L, Multimodal.wavFixtureBytes(8, 2, 8000, 0L)),
      (2L, "plain text".getBytes))
      .toDF("asset_id", "payload")
    val feats = Multimodal.extractFeatures(fixture)
      .select("asset_id", "features").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(feats(1L)(0) === 2.0, "channels")          // audio branch
    assert(feats(1L)(1) === 8000.0, "sample rate")
    assert(feats(1L)(2) === 8.0, "frames")
    assert(feats(2L)(0) === "plain text".length.toDouble) // byte-stats branch
  }

  test("non-image payloads fall back to None; decodeImages appends nulls") {
    assert(Multimodal.decodeImage("not an image".getBytes) === None)
    assert(Multimodal.decodeImage(Array[Byte]('P', '6')) === None) // truncated
    assert(Multimodal.decodeImage(null) === None)
    val out = Multimodal.decodeImages(assets) // text payloads: none decode
    assert(out.filter(col("format").isNotNull).count() === 0)
    assert(out.count() === assets.count())
  }

  test("resize bounds payload size and keeps small payloads intact") {
    val resized = Multimodal.resize(assets, targetBytes = 100)
    // decimation by ceil(len/target) keeps at most target bytes
    assert(resized.filter(length(col("resized")) > 100).count() === 0)
    assert(resized.filter(length(col("resized")) < 1).count() === 0)
    // payloads already under target pass through byte-identical
    val small = resized.filter(length(col("payload")) <= 100)
    assert(small.filter(col("resized") =!= col("payload")).count() === 0)
    assert(resized.count() === assets.count())
  }

  test("animated GIF frames decode losslessly to the closed form") {
    for ((w, h, n, seed) <- Seq((4, 3, 1, 0L), (5, 4, 3, 7L),
        (8, 6, 4, 250L))) {
      val frames = Multimodal.decodeFrames(
        Multimodal.gifFixtureBytes(w, h, n, seed))
        .getOrElse(fail(s"no frames for ($w,$h,$n,$seed)"))
      assert(frames.size === n)
      frames.foreach { fi =>
        assert(fi.format === "gif" && fi.width === w && fi.height === h)
        val expected = (0 until w * h)
          .map(p => (seed + 7L * fi.frameIdx + p) % 256).sum.toDouble / (w * h)
        assert(fi.meanR === expected, s"frame ${fi.frameIdx}")
        assert(fi.meanG === expected && fi.meanB === expected)
      }
    }
  }

  test("decodeFrames: single-frame formats give one frame; junk gives none") {
    val png = Multimodal.imageFixtureBytes(4, 3, 5L, "png")
    val fs = Multimodal.decodeFrames(png).get
    assert(fs.size === 1 && fs.head.format === "png")
    assert(Multimodal.decodeFrames("not an image".getBytes).isEmpty)
    assert(Multimodal.decodeFrames(Array.emptyByteArray).isEmpty)
    // truncated GIF: header survives, frame data does not — never throws
    val gif = Multimodal.gifFixtureBytes(4, 3, 2, 1L)
    val truncated = gif.take(gif.length / 3)
    Multimodal.decodeFrames(truncated) // must not throw
  }
}
