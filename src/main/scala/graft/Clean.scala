package graft

import graft.ml.{RbmImputer, RbmTuner}
import org.apache.spark.sql.DataFrame

/** The reference's public API, 1:1 (upstream: `boltzmannclean.clean(
  * dataframe, numerical_columns, categorical_columns, tune_rbm)` —
  * SURVEY.md §0.5; /root/reference was empty, semantics derive from the
  * public upstream repo): fill missing values (null/NaN) in the named
  * columns of a DataFrame with a denoising RBM; every other cell and
  * column passes through untouched.
  *
  * A user of the reference switches by replacing the pandas frame with
  * a DataFrame and adding `keyCol` (any numeric key column) — Spark has
  * no implicit row index, and the deterministic noise fill needs a key
  * that survives repartitioning.
  */
object Clean {

  def clean(dataframe: DataFrame,
            numericalColumns: Seq[String],
            categoricalColumns: Seq[String] = Seq.empty,
            keyCol: String,
            tuneRbm: Boolean = false,
            nHidden: Int = 16,
            learnRate: Double = 0.1,
            batchSize: Int = 64,
            dropoutFraction: Double = 0.5,
            maxEpochs: Int = 30,
            adagrad: Boolean = true,
            seed: Long = 42L): DataFrame = {
    val imputer = new RbmImputer()
      .setNumericCols(numericalColumns)
      .setCategoricalCols(categoricalColumns)
      .setKeyCol(keyCol)
      .setNHidden(nHidden).setLearnRate(learnRate).setBatchSize(batchSize)
      .setDropoutFraction(dropoutFraction).setMaxEpochs(maxEpochs)
      .setAdagrad(adagrad).setSeed(seed)
    val model =
      if (tuneRbm) RbmTuner.fitTuned(imputer, dataframe).model
      else imputer.fit(dataframe)
    model.transform(dataframe)
  }
}
