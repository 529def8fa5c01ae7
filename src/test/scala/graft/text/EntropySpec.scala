package graft.text

import graft.SparkSpec

class EntropySpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed entropy: uniform, point-mass, and mixed docs") {
    val docs = Seq(
      (1L, "a b c d"),        // uniform over 4 types → H = 2 bits
      (2L, "x x x x"),        // point mass → H = 0
      (3L, "a a b"),          // H = log2(3) − (2·1)/3 = 0.918296
      (4L, "solo"))           // single token → H = 0, ttr = 1
      .toDF("doc_id", "text")
    val r = Entropy.tokenEntropy(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    assert(r(1L) === ((4L, 4L, 2.0, 1.0)), r(1L).toString)
    assert(r(2L) === ((4L, 1L, 0.0, 0.25)), r(2L).toString)
    assert(r(3L)._1 === 3L && r(3L)._2 === 2L)
    assert(math.abs(r(3L)._3 - 0.918296) < 1e-6, r(3L).toString)
    assert(r(4L) === ((1L, 1L, 0.0, 1.0)), r(4L).toString)
  }

  test("SEO-spam signature: long repetitive doc scores below dense prose") {
    val dense = (1 to 50).map(i => s"w$i").mkString(" ")
    val spam = Seq.fill(10)("buy cheap pills now").mkString(" ")
    val r = Entropy.tokenEntropy(
      Seq((1L, dense), (2L, spam)).toDF("doc_id", "text"),
      "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r(1L) > r(2L) + 2.0, s"dense ${r(1L)} vs spam ${r(2L)}")
  }

  test("token-less docs are absent, not zero-row poison") {
    val r = Entropy.tokenEntropy(
      Seq((1L, "one token"), (2L, ""), (3L, "   ")).toDF("doc_id", "text"),
      "doc_id", "text").collect()
    assert(r.map(_.getLong(0)).toSet === Set(1L))
  }
}
