package graft.ml

import graft.text.TextFunctions
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINED quality filter — the model-based complement to the
  * heuristic gate (`TextFunctions.qualityScore`): real curation
  * pipelines (the fastText-classifier pattern) learn a quality model
  * from weak labels (known-good vs known-junk sources) and gate on its
  * score, because a trained decision surface adapts to the corpus
  * where hand-tuned thresholds do not.
  *
  * Features are the library's existing deterministic text signals —
  * log token count, mean word length, distinct-token ratio, English
  * stopword ratio, digit/uppercase/whitespace character ratios — as
  * pure Column arithmetic (codegen'd, no UDF), assembled with
  * `array_to_vector`. Training is MLlib logistic regression: one
  * `treeAggregate` gradient pass per iteration over cached features —
  * the same all-reduce shape as the distributed RBM trainer, linear in
  * rows, no shuffle of the corpus. Scoring is a broadcast of the
  * (tiny) coefficient vector into a per-row dot product.
  *
  * Like every trained operator here, the float reduction order makes
  * coefficients reproducible only to ~1e-12 across partitionings, so
  * driver queries are rows-only; QualityClassifierSpec pins semantics
  * (junk scores below clean, holdout accuracy) instead.
  */
object QualityClassifier {

  /** The deterministic feature columns (fixed order — the model's
    * coefficient layout). */
  def featureColumns(text: Column): Seq[Column] = {
    val chars = length(text).cast("double")
    def charRatio(cls: String) =
      when(chars === 0, lit(0.0)).otherwise(
        (chars - length(regexp_replace(text, cls, ""))) / chars)
    Seq(
      log1p(TextFunctions.wordCount(text).cast("double")),
      TextFunctions.avgWordLength(text),
      TextFunctions.distinctTokenRatio(text),
      TextFunctions.stopwordRatio(text, "en"),
      charRatio("[0-9]"),
      charRatio("[A-Z]"),
      charRatio("\\s"))
  }

  /** Adds `features: Vector` built from `textCol`. */
  def featurize(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("features",
      array_to_vector(array(featureColumns(col(textCol)): _*)))

  /** Train on (text, label ∈ {0.0, 1.0}) weak labels. */
  def train(labeled: DataFrame, textCol: String, labelCol: String,
            maxIter: Int = 50, regParam: Double = 0.01)
      : LogisticRegressionModel =
    new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam).setTol(1e-8)
      .setFeaturesCol("features").setLabelCol(labelCol)
      .fit(featurize(labeled, textCol)
        .select(col(labelCol).cast("double").as(labelCol), col("features")))

  /** Adds `lr_quality` ∈ [0,1]: P(label = 1 | text) under `model`. */
  def score(df: DataFrame, textCol: String,
            model: LogisticRegressionModel): DataFrame = {
    val scored = model.transform(featurize(df, textCol))
    val p1 = element_at(
      org.apache.spark.ml.functions.vector_to_array(col("probability")), 2)
    scored.withColumn("lr_quality", p1)
      .drop("features", "rawPrediction", "probability", "prediction")
  }
}
