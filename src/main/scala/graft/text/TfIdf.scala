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

  /** Exact (non-hashed) TF-IDF over the real vocabulary — the
    * deterministic, oracle-able sibling of [[transform]]: explode tokens
    * → per-(doc, term) counts → document frequency per term → MLlib's
    * smoothed idf `ln((N+1)/(df+1))`. All relational (two hash aggs +
    * one join on `term` + one 1-row broadcast for N); the vocabulary is
    * never collected to the driver, so the shape survives 100 TB — the
    * hashed variant only wins when downstream needs fixed-width vectors.
    *
    * Returns one row per (doc, term): `idCol, term, tf, df, tfidf`
    * (tfidf rounded to 6 dp so cross-engine ln/× ulp drift is absorbed).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val pairs = docs
      .select(col(idCol), explode(TextFunctions.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val docFreq = pairs.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.select(count(lit(1)).as("__n"))
    pairs.join(docFreq, "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", round(col("tf").cast("double") *
        log((col("__n").cast("double") + lit(1.0)) /
            (col("df").cast("double") + lit(1.0))), 6))
      .select(col(idCol), col("term"), col("tf"), col("df"), col("tfidf"))
  }
}
