package graft.operators

import graft.SparkSpec

class RankEvalSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed AUC: perfect, inverted, ties, and the midpoint") {
    // perfect separation: every pos scores above every neg → 1.0
    val perfect = Seq((1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1))
      .toDF("label", "score")
    assert(RankEval.auc(perfect, "label", "score").collect().head
      .getDouble(2) === 1.0)
    // inverted → 0.0
    val inverted = Seq((0, 0.9), (0, 0.8), (1, 0.2), (1, 0.1))
      .toDF("label", "score")
    assert(RankEval.auc(inverted, "label", "score").collect().head
      .getDouble(2) === 0.0)
    // all tied → 0.5 exactly (tie halves)
    val tied = Seq((1, 0.5), (1, 0.5), (0, 0.5), (0, 0.5))
      .toDF("label", "score")
    assert(RankEval.auc(tied, "label", "score").collect().head
      .getDouble(2) === 0.5)
    // hand case: pos {0.8, 0.4}, neg {0.6, 0.2}
    // pairs: (.8>.6)+(.8>.2)+(.4<.6=0)+(.4>.2) = 3 of 4 → 0.75
    val hand = Seq((1, 0.8), (1, 0.4), (0, 0.6), (0, 0.2))
      .toDF("label", "score")
    assert(RankEval.auc(hand, "label", "score").collect().head
      .getDouble(2) === 0.75)
  }

  test("AUC ≡ Mann–Whitney U / (n·m) on real data; degenerate class " +
    "yields null") {
    val rows = graft.Tables.embeddings(spark, sf0001).select(
      org.apache.spark.sql.functions.expr(
        "CAST(label < 5 AS INT)").as("label"),
      org.apache.spark.sql.functions.expr(
        "floor(CAST(embedding[0] AS DOUBLE) * 1e6 + 0.5) / 1e6")
        .as("score"))
    val a = RankEval.auc(rows, "label", "score").collect().head
    val mw = Experiment.mannWhitney(
      rows.withColumn("variant",
        org.apache.spark.sql.functions.expr(
          "CASE WHEN label = 1 THEN 'pos' ELSE 'neg' END")),
      "variant", "score", a = "pos", b = "neg").collect().head
    val expected = math.floor(
      mw.getDouble(2) / (mw.getLong(0) * mw.getLong(1)).toDouble
        * 1e6 + 0.5) / 1e6
    assert(a.getDouble(2) === expected,
      "AUC and U/(n·m) are the same statistic")
    // one-class input → null, not 0.5
    val oneClass = Seq((1, 0.3), (1, 0.7)).toDF("label", "score")
    assert(RankEval.auc(oneClass, "label", "score").collect().head
      .isNullAt(2))
  }
}
