package graft.similarity

import graft.SparkSpec

class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  // 4 docs: id 1 is the query; 2 is a lexical-only match, 3 a dense-only
  // match, 4 matches both and must win at any interior weight
  private lazy val docs = Seq(
    (1L, "query text about spark"),
    (2L, "spark spark spark spark"),
    (3L, "nothing relevant here at all"),
    (4L, "spark spark spark here")
  ).toDF("doc_id", "text")
  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f)),
    (3L, Array(1.0f, 0.0f)),
    (4L, Array(0.9f, 0.1f))
  ).toDF("doc_id", "embedding")

  private def run(w: Double) =
    HybridSearch.search(docs, vecs, "doc_id", "text", "embedding",
      terms = Seq("spark"), queryId = 1L, k = 4, lexWeight = w)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))

  test("both-signal doc wins at interior weights; extremes isolate each signal") {
    assert(run(0.5).head._1 === 4L)
    // pure lexical: doc 2 (all tokens match) ties doc 4? no — 4/4 vs 3/4
    assert(run(1.0).head._1 === 2L)
    // pure dense: doc 3 is exactly the query direction (cos = 1)
    assert(run(0.0).head._1 === 3L)
  }

  test("scores are bounded and the ranking is (score desc, id asc)") {
    val rows = run(0.5)
    assert(rows.forall { case (_, s) => s >= 0.0 && s <= 1.0 })
    assert(rows.sortBy { case (id, s) => (-s, id) }.toSeq === rows.toSeq)
  }

  test("query row is excluded from results") {
    assert(!run(0.5).exists(_._1 == 1L))
  }
}
