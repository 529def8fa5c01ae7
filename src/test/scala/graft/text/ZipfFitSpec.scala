package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZipfFitSpec extends SparkSpec {

  import spark.implicits._

  test("an exact power law fits with slope -1 and r2 ~ 1") {
    // term_i appears round(2000 / i) times, i = 1..20
    val text = (1 to 20).flatMap(i =>
      Seq.fill(math.round(2000.0 / i).toInt)(s"t$i")).mkString(" ")
    val r = ZipfFit.fit(Seq(text).toDF("text"), "text", topN = 20).head()
    assert(r.getLong(0) === 20L)
    assert(math.abs(r.getDouble(1) + 1.0) < 0.02, s"slope ${r.getDouble(1)}")
    assert(r.getDouble(3) > 0.999, s"r2 ${r.getDouble(3)}")
  }

  test("uniform token soup: slope ~ 0, r2 ~ 0, never NaN") {
    // y is constant so the unrounded fit is exactly flat; the 6-dp
    // product rounding leaves a ~1e-6 residue (identical in both
    // engines) rather than an exact zero — assert the magnitude
    val text = (1 to 15).flatMap(i => Seq.fill(10)(s"w$i")).mkString(" ")
    val r = ZipfFit.fit(Seq(text).toDF("text"), "text", topN = 15).head()
    assert(math.abs(r.getDouble(1)) < 1e-4, s"slope ${r.getDouble(1)}")
    assert(r.getDouble(3) < 0.01 && !r.getDouble(3).isNaN,
      s"r2 ${r.getDouble(3)}")
  }

  test("duplication bends the curve: r2 drops vs natural shape") {
    val natural = (1 to 20).flatMap(i =>
      Seq.fill(math.round(1000.0 / i).toInt)(s"t$i")).mkString(" ")
    // a boilerplate corpus: two giant terms, then a flat tail
    val boiler = (Seq.fill(5000)("the") ++ Seq.fill(4900)("click") ++
      (1 to 18).flatMap(i => Seq.fill(10)(s"t$i"))).mkString(" ")
    val rN = ZipfFit.fit(Seq(natural).toDF("text"), "text", 20).head()
    val rB = ZipfFit.fit(Seq(boiler).toDF("text"), "text", 20).head()
    assert(rB.getDouble(3) < rN.getDouble(3),
      s"boilerplate r2 ${rB.getDouble(3)} !< natural ${rN.getDouble(3)}")
  }

  test("heaps: all-unique tokens fit beta = 1 exactly (V = N)") {
    val docs = (1 to 64).map(i =>
      (i.toLong, (1 to 10).map(j => s"d${i}_t$j").mkString(" ")))
      .toDF("doc_id", "text")
    val r = ZipfFit.heapsFit(docs, "doc_id", "text").head()
    assert(r.getLong(0) === 16L, s"n_points ${r.getLong(0)}")
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-4, s"beta ${r.getDouble(1)}")
    assert(r.getDouble(3) > 0.9999, s"r2 ${r.getDouble(3)}")
  }

  test("heaps: identical boilerplate docs fit beta ~ 0, never NaN") {
    val docs = (1 to 64).map(i => (i.toLong, "a b c d e f g h i j"))
      .toDF("doc_id", "text")
    val r = ZipfFit.heapsFit(docs, "doc_id", "text").head()
    assert(math.abs(r.getDouble(1)) < 1e-4, s"beta ${r.getDouble(1)}")
    assert(!r.getDouble(3).isNaN && r.getDouble(3) < 0.01,
      s"r2 ${r.getDouble(3)}")
  }

  test("heaps: saturation ranks between unique soup and boilerplate") {
    // half of each doc is shared vocabulary, half is novel
    val docs = (1 to 64).map(i => (i.toLong,
      ("s1 s2 s3 s4 s5 " +
        (1 to 5).map(j => s"u${i}_$j").mkString(" "))))
      .toDF("doc_id", "text")
    val r = ZipfFit.heapsFit(docs, "doc_id", "text").head()
    assert(r.getDouble(1) > 0.5 && r.getDouble(1) < 1.0,
      s"beta ${r.getDouble(1)}")
  }
}
