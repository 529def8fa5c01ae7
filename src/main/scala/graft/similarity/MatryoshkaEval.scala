package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MATRYOSHKA TRUNCATION EVAL — "how many dimensions does retrieval
  * actually need": recall@k of PREFIX-dimension cosine search against
  * the full-dimension ground truth, per candidate prefix length. MRL
  * embeddings (Kusupati et al. 2022) are trained so prefixes work;
  * before serving a truncated index (4× memory/IO at dim/4) you
  * measure THIS curve on your corpus — a flat-near-1.0 curve says
  * truncate, a steep one says the model wasn't matryoshka-trained.
  * The decision input for every IVF/PQ memory budget.
  *
  * Scale shape: the anchor side is a bounded batch
  * ([[HardNegatives]]' contract) broadcast against one corpus scan
  * per prefix length; per-anchor top-k windows partition on the
  * anchor axis. |dims| scans of the same corpus — the eval is
  * batch-sized, not corpus-quadratic.
  *
  * Determinism: exact cosine (fixed-order fold) on prefix slices,
  * 6-dp round, (score DESC, id ASC) ranks, and recall is an exact
  * integer overlap count — the whole curve sits under the bit-exact
  * oracle. Output: `(dim, n_anchors, mean_recall (6 dp))`. */
object MatryoshkaEval {

  private def topkIds(df: DataFrame, anchors: DataFrame, dim: Int,
                      k: Int): DataFrame = {
    val corpus = df.select(col("__id").as("b"),
      slice(col("__v"), 1, dim).as("__vb"))
    val anc = anchors.select(col("__id").as("a"),
      slice(col("__v"), 1, dim).as("__va"))
    val w = Window.partitionBy(col("a"))
      .orderBy(col("__score").desc, col("b"))
    broadcast(anc).join(corpus, col("a") =!= col("b"))
      .withColumn("__score",
        round(Cosine.cosine(col("__va"), col("__vb")), 6))
      .withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col("a"), col("b"))
  }

  /** Recall@`k` of prefix-`dims` search vs the full-`fullDim` ground
    * truth, over the anchor rows selected by `anchorPred`. */
  def truncationRecall(df: DataFrame, idCol: String, vecCol: String,
                       anchorPred: Column, dims: Seq[Int], fullDim: Int,
                       k: Int = 10, maxAnchors: Long = 10000L):
      DataFrame = {
    require(dims.nonEmpty && dims.forall(d => d >= 1 && d <= fullDim))
    require(k >= 1)
    val base = df.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"))
    val anchors = base.filter(anchorPred)
    val nAnchors = anchors.count()
    require(nAnchors > 0 && nAnchors <= maxAnchors,
      s"anchor batch $nAnchors outside (0, $maxAnchors]")
    val truth = topkIds(base, anchors, fullDim, k)
      .withColumnRenamed("a", "__ta").withColumnRenamed("b", "__tb")
    val spark = df.sparkSession
    import spark.implicits._
    dims.map { d =>
      val hits = topkIds(base, anchors, d, k)
        .join(truth, col("a") === col("__ta") && col("b") === col("__tb"))
        .count()
      (d.toLong, nAnchors,
        math.floor(hits.toDouble / (nAnchors * k).toDouble * 1e6 + 0.5)
          / 1e6)
    }.toDF("dim", "n_anchors", "mean_recall")
  }

  /** DuckDB twin of [[truncationRecall]]: `vecsSql` must select
    * `(id, v)` with v a DOUBLE list; `anchorPredSql` is a predicate
    * with `{}` standing for the anchor id column (e.g. `"{} < 20"`). */
  def sqlTruncationRecall(vecsSql: String, anchorPredSql: String,
                          dims: Seq[Int], fullDim: Int,
                          k: Int = 10): String = {
    def pred(c: String) = anchorPredSql.replace("{}", c)
    def cos(a: String, b: String) =
      s"""round(CASE WHEN sqrt(list_dot_product($a, $a))
        * sqrt(list_dot_product($b, $b)) = 0 THEN 0.0e0
        ELSE list_dot_product($a, $b)
          / (sqrt(list_dot_product($a, $a))
             * sqrt(list_dot_product($b, $b))) END, 6)"""
    def topk(d: Int, name: String) = s"""
      $name AS (
        SELECT a, b FROM (
          SELECT anc.id AS a, corp.id AS b,
            row_number() OVER (PARTITION BY anc.id
              ORDER BY ${cos(s"anc.v[1:$d]", s"corp.v[1:$d]")} DESC,
                corp.id ASC) AS rnk
          FROM v anc, v corp
          WHERE (${pred("anc.id")}) AND anc.id != corp.id)
        WHERE rnk <= $k)"""
    val ctes = (topk(fullDim, "truth") +: dims.map(d => topk(d, s"t$d")))
      .mkString(",")
    val dimRows = dims.map { d =>
      s"""
      SELECT CAST($d AS BIGINT) AS dim, na.n AS n_anchors,
        floor((SELECT CAST(count(*) AS DOUBLE)
               FROM t$d x JOIN truth t ON x.a = t.a AND x.b = t.b)
          / (CAST(na.n AS DOUBLE) * $k) * 1e6 + 0.5e0) / 1e6
          AS mean_recall
      FROM na"""
    }.mkString(" UNION ALL ")
    s"""
    WITH v AS MATERIALIZED (SELECT id, v FROM ($vecsSql)),
    na AS (SELECT CAST(count(*) AS BIGINT) AS n FROM v
           WHERE (${pred("id")})),
    $ctes
    $dimRows"""
  }
}
