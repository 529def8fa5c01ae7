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
}
