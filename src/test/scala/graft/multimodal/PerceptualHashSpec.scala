package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PerceptualHashSpec extends SparkSpec {

  import spark.implicits._

  test("format-invariant: same pixels through PNG, BMP, and PPM hash equal") {
    for (id <- 0L until 10L) {
      val w = (4 + id % 5).toInt; val h = (3 + id % 4).toInt
      val png = PerceptualHash.aHash(Multimodal.imageFixtureBytes(w, h, id, "png"))
      val bmp = PerceptualHash.aHash(Multimodal.imageFixtureBytes(w, h, id, "bmp"))
      val ppm = PerceptualHash.aHash(Multimodal.ppmFixtureBytes(w, h, id))
      assert(png.isDefined && png === bmp && png === ppm, s"id=$id")
    }
  }

  test("re-encode and upscale survive; different images diverge") {
    // 16×16 half-dark/half-bright image and its 32×32 upscale: block
    // averages over the 8×8 grid are identical → identical hash
    def img(n: Int): Array[Byte] = {
      val b = new java.awt.image.BufferedImage(n, n,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until n; x <- 0 until n)
        b.setRGB(x, y, if (x < n / 2) 0x202020 else 0xE0E0E0)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", out); out.toByteArray
    }
    val h16 = PerceptualHash.aHash(img(16)).get
    val h32 = PerceptualHash.aHash(img(32)).get
    assert(h16 === h32)
    // left-bright mirror image is maximally different on every cell
    def mirror(n: Int): Array[Byte] = {
      val b = new java.awt.image.BufferedImage(n, n,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until n; x <- 0 until n)
        b.setRGB(x, y, if (x >= n / 2) 0x202020 else 0xE0E0E0)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(b, "png", out); out.toByteArray
    }
    val hm = PerceptualHash.aHash(mirror(16)).get
    assert(java.lang.Long.bitCount(h16 ^ hm) === 64)
  }

  test("undecodable payloads hash to null, not an exception") {
    val df = Seq(
      (1L, "not an image".getBytes("UTF-8")),
      (2L, Multimodal.ppmFixtureBytes(4, 4, 7L)),
      (3L, Array.empty[Byte]))
      .toDF("asset_id", "payload")
    val out = PerceptualHash.hashImages(df).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(out(1L).isEmpty && out(3L).isEmpty && out(2L).isDefined)
  }

  test("banded pair generation ≡ naive all-pairs Hamming filter") {
    val fixture = (0L until 40L).map(id => (id, Multimodal.ppmFixtureBytes(
      (4 + id % 5).toInt, (3 + id % 4).toInt, id))).toDF("asset_id", "payload")
    val hashed = PerceptualHash.hashImages(fixture)
    val got = PerceptualHash.nearDupPairs(hashed, "asset_id",
        maxDist = 3, nBands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val hs = hashed.collect().map(r => r.getLong(0) -> r.getLong(2))
    val naive = (for {
      (ia, ha) <- hs; (ib, hb) <- hs if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(got === naive)
    assert(got.nonEmpty, "fixture produced no near pairs to test against")
    // lossless-banding precondition is enforced
    intercept[IllegalArgumentException] {
      PerceptualHash.nearDupPairs(hashed, "asset_id", maxDist = 4, nBands = 4)
    }
  }

  test("hashFrames: one hash per frame, equal to aHash of the still") {
    // a 1-frame GIF's frame hash must equal the whole-image aHash of
    // the same pixels — the two paths share hashLuma by construction
    val gif1 = Multimodal.gifFixtureBytes(5, 4, 1, 17L)
    val frames = PerceptualHash.hashFrames(
      Seq((1L, gif1)).toDF("asset_id", "payload"))
      .select("frame_idx", "fhash").collect()
    assert(frames.length === 1 && frames(0).getLong(0) === 0L)
    assert(frames(0).getLong(1) === PerceptualHash.aHash(gif1).get)
    // multi-frame: one row per frame, frame f of seed s ≡ frame 0 of
    // seed s+7f (the fixture's pixel rule)
    val gif = Multimodal.gifFixtureBytes(5, 4, 4, 100L)
    val multi = PerceptualHash.hashFrames(
      Seq((2L, gif)).toDF("asset_id", "payload"))
      .orderBy("frame_idx").select("fhash").collect().map(_.getLong(0))
    assert(multi.length === 4)
    multi.zipWithIndex.foreach { case (hf, f) =>
      val still = Multimodal.gifFixtureBytes(5, 4, 1, 100L + 7L * f)
      assert(hf === PerceptualHash.aHash(still).get, s"frame $f")
    }
  }

  test("videoNearDupPairs: shifted copies pair up, distinct footage does not") {
    // three "videos": A and B share 3 of 4 frames (one-frame trim);
    // C is unrelated footage. Seeds straddle the fixture's mod-256
    // wrap so each frame's ramp breaks at a different pixel and the
    // four frames hash DISTINCTLY (an unwrapped ramp hashes the same
    // for every s — a degenerate all-frames-equal signature)
    def vid(seed: Long) = Multimodal.gifFixtureBytes(7, 5, 4, seed)
    val assets = Seq((1L, vid(230L)), (2L, vid(237L)), (3L, vid(100L)))
      .toDF("asset_id", "payload")
    val pairs = PerceptualHash.videoNearDupPairs(
        PerceptualHash.hashFrames(assets), "asset_id", minJaccard = 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(pairs.contains((1L, 2L)), s"trimmed copy not detected: $pairs")
    val (shared, jac) = pairs((1L, 2L))
    assert(shared === 3L && jac === 0.6) // 3 shared / (4+4-3)
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L),
      "unrelated footage paired")
  }

  test("videoNearDupPairs: the stopword cap drops corpus-wide frames") {
    // a black frame shared by EVERY video must not create pairs by
    // itself once its frequency exceeds the cap
    def blackFirst(seed: Long) = {
      // frame 0 constant (seed multiple of 256 keeps v flat? no —
      // build a 1-frame flat GIF by w*h=1: a single pixel is constant)
      Multimodal.gifFixtureBytes(1, 1, 1, seed)
    }
    // 1-pixel frames all hash to 0 (single cell never beats the mean)
    val assets = (1L to 5L).map(i => (i, blackFirst(0L)))
      .toDF("asset_id", "payload")
    val capped = PerceptualHash.videoNearDupPairs(
      PerceptualHash.hashFrames(assets), "asset_id",
      minJaccard = 0.4, maxHashFreq = 3)
    assert(capped.count() === 0)
    // without the cap the universal frame pairs everything
    val uncapped = PerceptualHash.videoNearDupPairs(
      PerceptualHash.hashFrames(assets), "asset_id",
      minJaccard = 0.4, maxHashFreq = 1000)
    assert(uncapped.count() === 10) // C(5,2)
  }

  test("videoNearDupPairs: hamming tolerance catches a re-encode luma shift") {
    // A (seed 230) vs A' (seed 232): a +2 luma shift ACROSS the
    // fixture's mod-256 wrap moves every frame's wrap pixel by 2, so
    // each frame hash lands at Hamming distance 2 from its twin —
    // the re-encode shape exact matching walks straight through.
    // C (seed 100) never wraps: all frames share the far-away ramp
    // hash. Within A, frame wrap points are 7 apart (> 4), so
    // tolerance t=4 merges ONLY true frame twins.
    def vid(seed: Long) = Multimodal.gifFixtureBytes(7, 5, 4, seed)
    val assets = Seq((1L, vid(230L)), (2L, vid(232L)), (3L, vid(100L)))
      .toDF("asset_id", "payload")
    val hashes = PerceptualHash.hashFrames(assets)
    // exact matching: the shifted copy shares ZERO frames — missed
    assert(PerceptualHash.videoNearDupPairs(hashes, "asset_id",
      minJaccard = 0.4).count() === 0)
    // t=4: every frame canonicalizes with its shifted twin → jaccard 1
    val tol = PerceptualHash.videoNearDupPairs(hashes, "asset_id",
        minJaccard = 0.4, maxFrameDist = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(tol.keySet === Set((1L, 2L)), s"pairs: $tol")
    assert(tol((1L, 2L)) === ((4L, 1.0)))
  }

  test("shotBoundaries: cuts where the hash jumps, one keyframe per shot") {
    // hand frame hashes: popcount(0^1)=1 stays in shot, 1^255 -> 7
    // bits opens a new one; frame 0 is always a keyframe
    val frames = Seq((1L, 0L, 0L), (1L, 1L, 0L), (1L, 2L, 1L),
      (1L, 3L, 1L), (1L, 4L, 255L),
      (2L, 0L, 42L), (2L, 1L, 42L)) // static video: one shot
      .toDF("asset_id", "frame_idx", "fhash")
    val out = PerceptualHash.shotBoundaries(frames, "asset_id",
        maxDist = 4)
      .orderBy("asset_id", "frame_idx").collect()
    val v1 = out.filter(_.getLong(0) == 1L)
    assert(v1.map(_.getLong(4)).toSeq === Seq(0L, 0L, 0L, 0L, 1L))
    assert(v1.map(_.getLong(5)).toSeq === Seq(1L, 0L, 0L, 0L, 1L))
    assert(v1(0).isNullAt(3) && v1(2).getLong(3) === 1L
      && v1(4).getLong(3) === 7L)
    val v2 = out.filter(_.getLong(0) == 2L)
    assert(v2.map(_.getLong(5)).sum === 1L, "static video: one keyframe")
    // maxDist 0: every hash change cuts -> shots 0,0,1,1,2 on video 1
    val strict = PerceptualHash.shotBoundaries(frames, "asset_id",
        maxDist = 0)
      .filter(col("asset_id") === 1L)
      .orderBy("frame_idx").collect().map(_.getLong(4)).toSeq
    assert(strict === Seq(0L, 0L, 1L, 1L, 2L))
  }

  /** Raw P6 with luma(x, y) = v(x, y) (red channel carries it). */
  private def ppmOf(w: Int, h: Int, v: (Int, Int) => Int): Array[Byte] = {
    val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
    val px = new Array[Byte](3 * w * h)
    for (y <- 0 until h; x <- 0 until w)
      px(3 * (y * w + x)) = v(x, y).toByte
    header ++ px
  }

  test("dHash: hand bits from adjacent compares") {
    // 4×1 luma [10, 20, 5, 30] → bits 1,0,1 → 0b101 = 5
    val p = ppmOf(4, 1, (x, _) => Seq(10, 20, 5, 30)(x))
    assert(PerceptualHash.dHash(p) === Some(5L))
  }

  test("dHash survives the smooth lighting shift that flips aHash") {
    // ±35 alternating texture (40/110), then the same texture under a
    // +16-per-column lighting ramp — all values stay in byte range:
    // every adjacent compare keeps its sign (70 swing vs 16 step) so
    // dHash is IDENTICAL, while odd column x=1 (126) falls below the
    // new global mean (131) and aHash moves
    val base = ppmOf(8, 4, (x, _) => if (x % 2 == 0) 40 else 110)
    val lit16 = ppmOf(8, 4,
      (x, _) => (if (x % 2 == 0) 40 else 110) + 16 * x)
    assert(PerceptualHash.dHash(base) === PerceptualHash.dHash(lit16),
      "gradient bits are lighting-shift invariant")
    assert(PerceptualHash.aHash(base) !== PerceptualHash.aHash(lit16),
      "the mean hash moves under the same shift (why both exist)")
  }

  test("dHash: flat images hash to zero; decode failures stay None") {
    assert(PerceptualHash.dHash(ppmOf(6, 3, (_, _) => 77)) === Some(0L))
    assert(PerceptualHash.dHash(Array[Byte](1, 2, 3)) === None)
  }

  test("borders: planted letterbox measured exactly; edge semantics") {
    val boxed = Multimodal.ppmBorderFixtureBytes(12, 9,
      top = 2, bottom = 1, left = 3, right = 0, seed = 5L)
    assert(PerceptualHash.borders(boxed) === Some((2, 1, 3, 0)))
    // borderless content reads all zeros
    val clean = ppmOf(8, 6, (x, y) => 60 + (x + 3 * y) % 40)
    assert(PerceptualHash.borders(clean) === Some((0, 0, 0, 0)))
    // an all-black frame: the leading side owns the full run and the
    // opposite side is CLAMPED to 0, so top+bottom ≤ h and
    // left+right ≤ w — interior-crop arithmetic (h−top−bottom) stays
    // non-negative even on this degenerate frame
    val black = ppmOf(5, 4, (_, _) => 0)
    assert(PerceptualHash.borders(black) === Some((4, 0, 5, 0)))
    // a uniform BRIGHT frame is NOT a letterbox (blank needs <= thresh)
    val bright = ppmOf(5, 4, (_, _) => 200)
    assert(PerceptualHash.borders(bright) === Some((0, 0, 0, 0)))
    assert(PerceptualHash.borders(Array[Byte](9)) === None)
  }
}
