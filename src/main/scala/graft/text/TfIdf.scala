package graft.text

import org.apache.spark.ml.feature.{HashingTF, IDF, IDFModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** TF-IDF vectorization (SURVEY §2 C5) via the MLlib feature pipeline:
  * whitespace tokens → `HashingTF` (hashing trick, no global vocab —
  * the property that makes it 100 TB-safe: no driver-side dictionary,
  * fixed-width vectors regardless of corpus vocabulary) → `IDF` fit
  * (one distributed pass) → sparse TF-IDF vectors.
  *
  * Hash-based features are engine-specific (murmur3), so this operator
  * is invariant-tested rather than DuckDB-oracled.
  */
object TfIdf {

  /** Adds `tokens`, `tf` (sparse vector) and `tfidf` columns. */
  def transform(docs: DataFrame, textCol: String,
                numFeatures: Int = 1 << 16): (DataFrame, IDFModel) = {
    val tokenized = docs.withColumn("tokens",
      filter(split(lower(col(textCol)), "\\s+"), t => length(t) > 0))
    val tf = new HashingTF().setInputCol("tokens").setOutputCol("tf")
      .setNumFeatures(numFeatures)
    val withTf = tf.transform(tokenized)
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf").fit(withTf)
    (idf.transform(withTf), idf)
  }
}
