package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  // 4-doc corpus with known term statistics:
  //   d1 "apple banana"        d2 "apple apple cherry"
  //   d3 "banana cherry date"  d4 "cherry cherry cherry"
  // N=4, avgdl=(2+3+3+3)/4=2.75; df: apple 2, banana 2, cherry 3, date 1
  private def corpus = Seq(
    (1L, "apple banana"), (2L, "apple apple cherry"),
    (3L, "banana cherry date"), (4L, "cherry cherry cherry")
  ).toDF("doc_id", "text")

  private def bm25(tf: Long, df: Long, dl: Long, n: Long = 4L,
                   total: Long = 11L, k1: Double = 1.2,
                   b: Double = 0.75): Double = {
    val idf = math.log((n - df + 0.5) / (df + 0.5) + 1)
    val c = idf * (tf * (k1 + 1.0)) /
      (tf + k1 * (1.0 - b + b * dl.toDouble * n / total))
    math.rint(c * 1e6) / 1e6
  }

  test("scores match the closed form and rank by saturated tf·idf") {
    val q = Seq((100L, "apple date")).toDF("doc_id", "text")
    val got = Bm25.topK(corpus, "doc_id", "text", q, "doc_id", "text", k = 4)
      .select(col("doc_id"), col("score").cast("double"), col("rank"))
      .as[(Long, Double, Long)].collect().sortBy(_._3)
    // candidates: d1, d2 (apple), d3 (date); d4 matches nothing
    val exp = Map(
      1L -> bm25(1, 2, 2),                 // apple in d1
      2L -> bm25(2, 2, 3),                 // apple twice in d2
      3L -> bm25(1, 1, 3))                 // date (rarest) in d3
    assert(got.map(_._1).toSet === Set(1L, 2L, 3L))
    got.foreach { case (id, s, _) => assert(math.abs(s - exp(id)) < 1e-9,
      s"doc $id: got $s expected ${exp(id)}") }
    // date's idf (df=1) outweighs apple's (df=2) at equal tf/dl: d3 first
    assert(got.head._1 === 3L)
    // tf saturation still orders d2 (tf=2) above d1 (tf=1)
    assert(got.map(_._1).indexOf(2L) < got.map(_._1).indexOf(1L))
  }

  test("df stopping drops corpus-dominant terms before candidate generation") {
    val q = Seq((100L, "cherry date")).toDF("doc_id", "text")
    // cherry df=3 of 4 docs > 0.5 → stopped; only date survives
    val got = Bm25.topK(corpus, "doc_id", "text", q, "doc_id", "text",
      k = 4, maxDfFraction = 0.5)
      .select("doc_id").as[Long].collect()
    assert(got.toSeq === Seq(3L))
  }

  test("query terms missing from the corpus yield no rows; k caps per query") {
    val q = Seq((1L, "zzz qqq"), (2L, "cherry")).toDF("doc_id", "text")
    val got = Bm25.topK(corpus, "doc_id", "text", q, "doc_id", "text", k = 2)
      .select("query_id", "doc_id", "rank").as[(Long, Long, Long)].collect()
    assert(!got.exists(_._1 == 1L))
    assert(got.count(_._1 == 2L) === 2) // 3 cherry docs, capped at k=2
    // ties (d3, d4 tf differ so scores differ) rank deterministically
    assert(got.filter(_._1 == 2L).map(_._3).sorted.toSeq === Seq(1L, 2L))
  }

  test("matches brute-force BM25 on real documents at sf0.001") {
    val docs = graft.Tables.documents(spark, sf0001)
    val res = Bm25.topK(docs.filter(col("doc_id") >= 10), "doc_id", "text",
      docs.filter(col("doc_id") < 10), "doc_id", "text", k = 3)
    val rows = res.select("query_id", "doc_id", "score", "rank")
      .as[(Long, Long, Double, Long)].collect()
    assert(rows.nonEmpty)
    // per query: ranks are 1..n with descending (score, -id) order
    rows.groupBy(_._1).foreach { case (_, g) =>
      val byRank = g.sortBy(_._4)
      assert(byRank.map(_._4).toSeq === (1L to byRank.length).toSeq)
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 > b._3 || (a._3 == b._3 && a._2 < b._2))
        case _ =>
      }
    }
  }
}
