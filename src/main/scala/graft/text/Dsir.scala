package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-STYLE DATA SELECTION — importance resampling toward a target
  * distribution (Xie et al. 2023, "Data Selection for Language Models
  * via Importance Resampling"): score every raw document by how much
  * more likely its tokens are under a TARGET language model than under
  * the SOURCE (whole-corpus) model, then draw a weighted sample
  * proportional to that likelihood ratio. This is the published
  * pretraining-curation move for "give me k crawl documents that look
  * like my high-quality reference set" — the composition of two
  * operators this library already ships: the add-1 unigram LM scoring
  * of `c7_unigram_logprob` and [[graft.operators.Sampling.ppsSystematic]].
  *
  * Per document: r(x) = mean over tokens of
  * ln p̂_target(tok) − ln p̂_source(tok), both add-1-smoothed over the
  * SHARED vocabulary (so the ratio is defined for unseen-in-target
  * tokens); weight = ⌊e^clamp(r,±5)·10⁶ + ½⌋ (clamped so one outlier
  * doc can't absorb the whole sample). The mean is the repo's standard
  * deterministic fold: per-token terms rounded to 6 dp into
  * DECIMAL(18,6), summed exactly, one final double division — no
  * unordered double agg. Zero-token documents drop out (no tokens to
  * score) in both engines.
  *
  * Scale shape: tokenize+explode is narrow and scales with the scan;
  * the two LM count tables are one hash agg each; scoring is one
  * equi-join per token (the same shape as the BM25/TF-IDF family);
  * selection inherits ppsSystematic's two-level prefix sum — no global
  * sort, no driver loop. */
object Dsir {

  /** Per-document importance weights toward `isTarget`'s distribution:
    * `(idCol, n_tokens, mean_ratio (6dp), weight)`. `weight` is the
    * exact-BIGINT PPS weight (≥ 1). */
  def importanceWeights(docs: DataFrame, idCol: String, textCol: String,
                        isTarget: Column): DataFrame = {
    // materialized once: the token frame feeds BOTH LM count builds
    // and the probe side (the c7_bigram_logprob checkpoint pattern)
    val toks = docs.select(col(idCol), isTarget.as("__t"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .localCheckpoint()
    val counts = toks.groupBy(col("tok"))
      .agg(count(when(col("__t"), lit(1))).as("__ct"),
        count(lit(1)).as("__cs"))
    val vocab = counts.agg(count(lit(1)).as("__v"))
    val totals = toks.agg(
      count(when(col("__t"), lit(1))).as("__nt"),
      count(lit(1)).as("__ns"))
    def d(c: Column) = c.cast("double")
    val term = round(
      log((d(col("__ct")) + lit(1.0)) / (d(col("__nt")) + d(col("__v"))))
        - log((d(col("__cs")) + lit(1.0)) / (d(col("__ns")) + d(col("__v")))),
      6).cast("decimal(18,6)")
    val r = col("__sum").cast("double") / col("n_tokens").cast("double")
    val clamped = least(greatest(r, lit(-5.0)), lit(5.0))
    toks.join(counts, "tok")
      .crossJoin(broadcast(vocab))
      .crossJoin(broadcast(totals))
      .withColumn("__term", term)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__term")).as("__sum"))
      .select(col(idCol), col("n_tokens"),
        round(r, 6).as("mean_ratio"),
        greatest(floor(exp(clamped) * lit(1e6) + lit(0.5)).cast("long"),
          lit(1L)).as("weight"))
  }

  /** Importance-resample exactly `k` picks (Σ n_picks = k) toward the
    * target: [[importanceWeights]] piped into the exact-BIGINT PPS
    * systematic sampler. Output: `(idCol, n_tokens, mean_ratio,
    * weight, n_picks)`. */
  def select(docs: DataFrame, idCol: String, textCol: String,
             isTarget: Column, k: Int): DataFrame =
    graft.operators.Sampling.ppsSystematic(
      importanceWeights(docs, idCol, textCol, isTarget),
      idCol, "weight", k)

  /** DuckDB twin of [[importanceWeights]]: `docsSql` must select
    * `(id, t, toks)` — boolean target flag and the token list; the id
    * is emitted as `idOut` to match the Spark column name. */
  def sqlImportanceWeights(docsSql: String, idOut: String = "id"): String = {
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val term = s"""CAST(round(
        ln((${d("c_t")} + 1.0e0) / (${d("n_t")} + ${d("v")}))
      - ln((${d("c_s")} + 1.0e0) / (${d("n_s")} + ${d("v")})), 6)
      AS DECIMAL(18,6))"""
    val r = s"(CAST(s AS DOUBLE) / CAST(n_tokens AS DOUBLE))"
    val clamped = s"least(greatest($r, -5.0e0), 5.0e0)"
    s"""
    WITH tk AS (
      SELECT id, t, unnest(toks) AS tok FROM ($docsSql)
    ), cnt AS (
      SELECT tok, CAST(count(CASE WHEN t THEN 1 END) AS BIGINT) AS c_t,
        CAST(count(*) AS BIGINT) AS c_s
      FROM tk GROUP BY tok
    ), vocab AS (SELECT CAST(count(*) AS BIGINT) AS v FROM cnt),
    tot AS (
      SELECT CAST(count(CASE WHEN t THEN 1 END) AS BIGINT) AS n_t,
        CAST(count(*) AS BIGINT) AS n_s
      FROM tk
    ), byd AS (
      SELECT id, CAST(count(*) AS BIGINT) AS n_tokens,
        sum($term) AS s
      FROM tk JOIN cnt USING (tok), vocab, tot
      GROUP BY id)
    SELECT id AS $idOut, n_tokens, round($r, 6) AS mean_ratio,
      greatest(CAST(floor(exp($clamped) * 1000000.0e0 + 0.5e0) AS BIGINT),
        1) AS weight
    FROM byd"""
  }
}
