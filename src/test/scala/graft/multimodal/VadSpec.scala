package graft.multimodal

import graft.SparkSpec

class VadSpec extends SparkSpec {

  import spark.implicits._

  // hand frame table: asset 1 voiced at frames {2,3,6,7,10}, others
  // silent; energies are per-sample so n_samples matters
  private def frames(voiced: Set[Long], n: Long = 12) =
    (0L until n).map(f => (1L, f, 32L,
      if (voiced(f)) 32L * 200L else 32L * 5L))
      .toDF("asset_id", "frame_idx", "n_samples", "energy")

  test("hangover merges short gaps; click filter drops singletons") {
    val f = frames(Set(2L, 3L, 6L, 7L, 10L))
    // hangover 1: gaps of 1 unvoiced frame merge; 3→6 (gap 2) splits,
    // 7→10 (gap 2) splits, 10 alone is a click → dropped
    val r1 = Vad.segments(f, threshPerSample = 100, hangover = 1,
      minFrames = 2).collect()
      .map(x => (x.getLong(2), x.getLong(3), x.getLong(4))).toSet
    assert(r1 === Set((2L, 3L, 2L), (6L, 7L, 2L)), r1.toString)
    // hangover 2: gaps of 2 merge everything into one segment
    val r2 = Vad.segments(f, threshPerSample = 100, hangover = 2,
      minFrames = 2).collect()
      .map(x => (x.getLong(2), x.getLong(3), x.getLong(4))).toSet
    assert(r2 === Set((2L, 10L, 5L)), r2.toString)
  }

  test("per-sample threshold judges partial tail windows fairly") {
    // tail window: 8 samples at the same per-sample energy as a loud
    // full window — must be voiced despite 4x smaller total energy
    val f = Seq((1L, 0L, 32L, 32L * 200L), (1L, 1L, 8L, 8L * 200L))
      .toDF("asset_id", "frame_idx", "n_samples", "energy")
    val r = Vad.segments(f, threshPerSample = 150, hangover = 0,
      minFrames = 2).collect()
    assert(r.length === 1 && r.head.getLong(4) === 2L, r.mkString)
  }

  test("speech ratio reads the voiced share") {
    val f = frames(Set(2L, 3L, 6L, 7L, 10L))
    val r = Vad.speechRatio(f, threshPerSample = 100).head
    assert(r.getLong(1) === 12L && r.getLong(2) === 5L)
    assert(math.abs(r.getDouble(3) - 5.0 / 12.0) < 1e-6)
  }

  test("end-to-end on the block WAV fixture: 2 segments per asset") {
    val fixture = Seq((7L, Multimodal.wavBlockFixtureBytes(230, 8000, 7L)))
      .toDF("asset_id", "payload")
    val fr = Multimodal.audioFrameFeatures(fixture, frameLen = 32)
    val segs = Vad.segments(fr, threshPerSample = 100000000L,
      hangover = 1, minFrames = 2)
      .collect().map(x => (x.getLong(2), x.getLong(3))).toSet
    // 230 samples → windows 0..7 (tail 6 samples in window 7); blocks
    // of 64: windows 0,1 quiet / 2,3 loud / 4,5 quiet / 6,7 loud
    assert(segs === Set((2L, 3L), (6L, 7L)), segs.toString)
  }
}
