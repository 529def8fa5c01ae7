package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkSpec {

  private val k = 8
  private val w = 4

  test("winnowing: identical docs share every fingerprint") {
    import spark.implicits._
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val df = Seq((1L, text), (2L, text)).toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(df, "doc_id", "text", k, w)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    assert(fps(1L) === fps(2L))
    assert(fps(1L).nonEmpty)
  }

  test("winnowing: shared substring >= w+k-1 chars guarantees a shared fingerprint") {
    import spark.implicits._
    // the guarantee from the MOSS paper: any common substring of length
    // >= w + k - 1 contributes at least one common selected hash
    val common = "entirely unmistakable shared passage of text"
    val a = s"alpha begins differently yet contains $common somewhere inside"
    val b = s"totally other framing words but $common appears here too"
    val df = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(df, "doc_id", "text", k, w)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    assert(fps(1L).intersect(fps(2L)).nonEmpty,
      "documents sharing a long substring must share a fingerprint")
  }

  test("winnowing: disjoint-alphabet docs share nothing; short docs vanish") {
    import spark.implicits._
    val df = Seq(
      (1L, "aaaa bbbb cccc dddd eeee ffff gggg"),
      (2L, "1111 2222 3333 4444 5555 6666 7777"),
      (3L, "tiny")).toDF("doc_id", "text")
    val fps = Winnowing.fingerprints(df, "doc_id", "text", k, w)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet)
    assert(fps(1L).intersect(fps(2L)).isEmpty)
    assert(!fps.contains(3L), "doc shorter than k chars has no k-grams")
  }

  test("overlapPairs: finds the planted overlap, respects doc-frequency cap") {
    import spark.implicits._
    val shared = "this shared boilerplate sentence lives in exactly two documents"
    val everywhere = "universal footer on every single page of the site"
    val docs = Seq(
      (1L, s"first doc body text $shared and then $everywhere"),
      (2L, s"second doc other words $shared trailing stuff $everywhere"),
      (3L, s"third unrelated content entirely $everywhere"),
      (4L, s"fourth also unrelated material $everywhere")).toDF("doc_id", "text")
    val pairs = Winnowing.overlapPairs(docs, "doc_id", "text", k, w,
      minShared = 2, maxDocFreq = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), "planted shared passage not detected")
    // with the cap tightened below 4, the universal footer's fingerprints
    // drop out and only the genuinely-shared pair survives
    val capped = Winnowing.overlapPairs(docs, "doc_id", "text", k, w,
      minShared = 2, maxDocFreq = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === Set((1L, 2L)),
      s"df cap should isolate the true overlap, got $capped")
  }

  test("winnowing: hash matches the hand-computed Horner value") {
    import spark.implicits._
    // "abcd" with k=4: ((0*31+97)*31+98)*31+99)*31+100 = 2987074
    val df = Seq((1L, "abcd")).toDF("doc_id", "text")
    val h = df
      .select(Winnowing.gramHashes(Winnowing.normalize(col("text")), 4).as("gh"))
      .head().getSeq[Long](0)
    assert(h === Seq(2987074L))
    // the composed reference path agrees
    val hc = df.withColumn("__codes",
        Winnowing.charCodes(Winnowing.normalize(col("text"))))
      .select(Winnowing.gramHashesComposed(col("__codes"), 4).as("gh"))
      .head().getSeq[Long](0)
    assert(hc === Seq(2987074L))
  }
}
