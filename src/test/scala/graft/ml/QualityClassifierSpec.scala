package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Deterministic junk: digit soup / repeated chars / no-vowel hash
  * noise — the shapes crawl filters actually see. Top-level so the
  * Dataset closure serializes without dragging the suite along. */
object JunkTexts extends Serializable {
  def text(i: Long): String = (i % 3) match {
    case 0 => Seq.fill(40)((i * 7919 % 100000).toString).mkString(" ")
    case 1 => ("z" * 300)
    case _ => Seq.fill(60)("xq" + (i * 104729 % 997)).mkString(" ")
  }
}

class QualityClassifierSpec extends SparkSpec {

  import spark.implicits._

  private lazy val clean = Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("text")).withColumn("label", lit(1.0))
  private lazy val junk = spark.range(0, 120)
    .select((col("id") + 100000).as("doc_id"))
    .as[Long].map(i => (i, JunkTexts.text(i))).toDF("doc_id", "text")
    .withColumn("label", lit(0.0))

  test("learns to separate clean docs from junk (holdout accuracy)") {
    val all = clean.unionByName(junk)
    val train = all.filter(col("doc_id") % 5 =!= 0)
    val holdout = all.filter(col("doc_id") % 5 === 0)
    val model = QualityClassifier.train(train, "text", "label")
    val scored = QualityClassifier.score(holdout, "text", model)
    val acc = scored.select(
      avg(((col("lr_quality") > 0.5).cast("double") === col("label"))
        .cast("double")).cast("double")).as[Double].head()
    assert(acc > 0.9, s"holdout accuracy $acc")
  }

  test("junk scores strictly below clean on average, with a wide margin") {
    val model = QualityClassifier.train(clean.unionByName(junk), "text", "label")
    def meanScore(df: org.apache.spark.sql.DataFrame): Double =
      QualityClassifier.score(df, "text", model)
        .select(avg("lr_quality").cast("double")).as[Double].head()
    val c = meanScore(clean); val j = meanScore(junk)
    assert(c > j + 0.5, s"clean $c vs junk $j")
  }

  test("scoring preserves rows and stays in [0,1]; empty text survives") {
    val model = QualityClassifier.train(clean.unionByName(junk), "text", "label")
    val weird = Seq((1L, ""), (2L, " "), (3L, "one two three")).toDF("doc_id", "text")
    val s = QualityClassifier.score(weird, "text", model)
    assert(s.count() === 3)
    assert(s.filter(col("lr_quality") < 0 || col("lr_quality") > 1).count() === 0)
  }
}
