package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BudgetSelectSpec extends SparkSpec {
  import spark.implicits._

  test("keeps best-quality docs in rank order until the budget is exhausted") {
    // rank order: (0.9: id 1, id 4), (0.5: id 2), (0.1: id 3)
    val docs = Seq(
      (1L, 0.9, 40L), (4L, 0.9, 30L), (2L, 0.5, 40L), (3L, 0.1, 10L)
    ).toDF("doc_id", "quality", "n_tokens")
    def ids(budget: Long) =
      BudgetSelect.selectToBudget(docs, "doc_id", "quality", "n_tokens", budget)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(120L) === Set(1L, 4L, 2L, 3L))   // everything fits (120 total)
    assert(ids(110L) === Set(1L, 4L, 2L))       // doc 3 starts at 110 > 110-10
    assert(ids(100L) === Set(1L, 4L))           // doc 2 would end at 110
    assert(ids(69L) === Set(1L))                // doc 4 would end at 70
    assert(ids(0L) === Set.empty[Long])
    // a doc that straddles the boundary is skipped, but NOTHING after
    // it is admitted in its place (prefix semantics, not knapsack)
    assert(ids(75L) === Set(1L, 4L), "budget 75: doc 2 must not fit")
  }

  test("within-bin ties resolve by id; equals the naive one-window form on the corpus") {
    val scored = graft.Tables.documents(spark, sf0001).select(col("doc_id"),
      TextFunctions.qualityScore(col("text")).as("q"),
      TextFunctions.wordCount(col("text")).as("n"))
    val got = BudgetSelect.selectToBudget(scored, "doc_id", "q", "n", 100000L)
      .select("doc_id", "start_off")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("q").desc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val naive = scored
      .withColumn("start_off", coalesce(sum(col("n")).over(w), lit(0L)))
      .filter(col("start_off") + col("n") <= 100000L)
      .select("doc_id", "start_off")
    assert(got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty)
    assert(got.count() > 0)
  }
}
