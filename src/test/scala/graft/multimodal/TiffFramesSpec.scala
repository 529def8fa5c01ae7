package graft.multimodal

import graft.SparkSpec

/** Multi-page TIFF — the second multi-frame container through the same
  * reader walk and pixel rule as the GIF fixture. */
class TiffFramesSpec extends SparkSpec {

  import spark.implicits._

  test("tiff fixture decodes losslessly: closed-form per-frame means") {
    val b = Multimodal.tiffFixtureBytes(5, 4, 3, 100L)
    val fr = Multimodal.decodeFrames(b)
    assert(fr.isDefined, "tiff did not decode")
    val frames = fr.get
    assert(frames.length === 3)
    assert(frames.forall(_.format === "tif"))
    // mean of (100+7f+p)%256 over p<20 (no wrap): 100 + 7f + 9.5
    frames.foreach { f =>
      assert(f.width === 5 && f.height === 4)
      assert(f.meanR === 100.0 + 7 * f.frameIdx + 9.5)
      assert(f.meanG === f.meanR && f.meanB === f.meanR)
    }
  }

  test("hashFrames over TIFF equals hashFrames over the same-pixels GIF") {
    // container-invariance: the video-dedup chain must not care whether
    // the frames arrived as GIF or TIFF
    val seeds = Seq(230L, 237L)
    val gifs = seeds.zipWithIndex.map { case (s, i) =>
      (i.toLong, Multimodal.gifFixtureBytes(7, 5, 4, s)) }
      .toDF("asset_id", "payload")
    val tiffs = seeds.zipWithIndex.map { case (s, i) =>
      (i.toLong, Multimodal.tiffFixtureBytes(7, 5, 4, s)) }
      .toDF("asset_id", "payload")
    def hashes(df: org.apache.spark.sql.DataFrame) =
      PerceptualHash.hashFrames(df)
        .select("asset_id", "frame_idx", "fhash")
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2))
        .toMap
    assert(hashes(gifs) === hashes(tiffs))
  }
}
