package graft.similarity

import graft.SparkSpec

class RetrievalEvalSpec extends SparkSpec {

  import spark.implicits._

  private def gain(rank: Long): Long =
    math.floor(1e9 * math.log(2.0) / math.log(rank + 1.0) + 0.5).toLong

  private def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6

  test("hand-computed recall/MRR/nDCG at k=3; unjudged and " +
    "unretrieved queries handled honestly") {
    val run = Seq(
      ("q1", 101L, 1L), ("q1", 102L, 2L), ("q1", 103L, 3L),
      // q2 retrieves nothing relevant
      ("q2", 101L, 1L), ("q2", 102L, 2L),
      // q4 has judgments but appears only via qrels (nothing retrieved)
      ("q3", 101L, 1L)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq(
      ("q1", 101L), ("q1", 103L), ("q1", 104L), // n_rel = 3
      ("q2", 104L),                             // relevant never retrieved
      ("q4", 101L))                             // never retrieved at all
      .toDF("query_id", "doc_id")
    val r = RetrievalEval.metrics(run, qrels, k = 3).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r.keySet === Set("q1", "q2", "q3", "q4"))

    val q1 = r("q1")
    assert(q1.getLong(1) === 3L && q1.getLong(2) === 3L &&
      q1.getLong(3) === 2L)
    assert(q1.getDouble(4) === r6(2.0 / 3.0)) // recall
    assert(q1.getDouble(5) === 1.0)           // first hit at rank 1
    val dcg = gain(1) + gain(3)
    val idcg = gain(1) + gain(2) + gain(3)
    assert(q1.getDouble(6) === r6(dcg.toDouble / idcg.toDouble))

    val q2 = r("q2")
    assert(q2.getDouble(4) === 0.0 && q2.getDouble(5) === 0.0 &&
      q2.getDouble(6) === 0.0, "judged but nothing relevant retrieved")

    val q3 = r("q3")
    assert(q3.getLong(1) === 0L, "q3 has no judgments")
    assert(q3.isNullAt(4) && q3.isNullAt(6),
      "recall and nDCG are 0/0 — must be null, not 0")
    assert(q3.getDouble(5) === 0.0)

    val q4 = r("q4")
    assert(q4.getLong(2) === 0L && q4.getDouble(4) === 0.0 &&
      q4.getDouble(5) === 0.0 && q4.getDouble(6) === 0.0,
      "judged query with an empty run scores zero across the board")
  }

  test("a query retrieved only PAST rank k still reports (n_ret = 0) — " +
    "an unjudged bad run must not vanish from the report") {
    val run = Seq(
      ("good", 1L, 1L),
      // "late" retrieves, but everything lands past k = 2
      ("late", 7L, 3L), ("late", 8L, 4L)).toDF("query_id", "doc_id", "rank")
    val qrels = Seq(("good", 1L), ("late", 7L)).toDF("query_id", "doc_id")
    val r = RetrievalEval.metrics(run, qrels, k = 2).collect()
      .map(x => x.getString(0) -> x).toMap
    assert(r.keySet === Set("good", "late"),
      "query spine must come from the UNFILTERED run")
    val late = r("late")
    assert(late.getLong(1) === 1L && late.getLong(2) === 0L &&
      late.getLong(3) === 0L)
    assert(late.getDouble(4) === 0.0 && late.getDouble(5) === 0.0 &&
      late.getDouble(6) === 0.0)
  }

  test("a perfect run scores 1.0 on all three metrics") {
    val run = Seq(("q", 1L, 1L), ("q", 2L, 2L)).toDF(
      "query_id", "doc_id", "rank")
    val qrels = Seq(("q", 1L), ("q", 2L)).toDF("query_id", "doc_id")
    val r = RetrievalEval.metrics(run, qrels, k = 5).collect().head
    assert(r.getDouble(4) === 1.0 && r.getDouble(5) === 1.0 &&
      r.getDouble(6) === 1.0)
  }

  test("nDCG penalizes late hits: swapping a relevant doc from rank 1 " +
    "to rank k strictly lowers ndcg, leaves recall unchanged") {
    val qrels = Seq(("q", 1L)).toDF("query_id", "doc_id")
    def run(relRank: Long) = Seq(
      (1L to 3L).map(i => ("q", if (i == relRank) 1L else 100L + i, i)): _*)
      .toDF("query_id", "doc_id", "rank")
    def ndcg(relRank: Long): Double =
      RetrievalEval.metrics(run(relRank), qrels, 3).collect().head
        .getDouble(6)
    assert(ndcg(1) === 1.0)
    assert(ndcg(3) < ndcg(2) && ndcg(2) < ndcg(1))
    val rec = RetrievalEval.metrics(run(3), qrels, 3).collect().head
    assert(rec.getDouble(4) === 1.0)
  }
}
