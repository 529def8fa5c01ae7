package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** N-GRAM LM PERPLEXITY SCORING — the CCNet move (Wenzek et al. 2020):
  * train a small language model on a TRUSTED reference slice, score
  * every crawl document by its per-token cross-entropy under that
  * model, and let the perplexity rank drive curation (low = looks
  * like the reference, high = noise/boilerplate/other-language). This
  * is the quality signal the heuristic gates ([[TextFunctions]]) and
  * the trained LR filter ([[graft.ml.QualityClassifier]]) cannot
  * produce: it scores FLUENCY under a corpus-level model, not
  * surface ratios.
  *
  * The model is an add-α bigram LM with BOS and open-vocabulary UNK:
  *
  *   P(w | h) = (c(h,w) + α) / (c(h) + α·V),   V = |vocab| + 1
  *
  * where vocab = the reference slice's unigram types, any scored
  * token outside it maps to `<unk>` BEFORE bigram formation, and
  * every document is scored as `<s> w₁ … wₙ` (n scored transitions).
  * Real CCNet ships a 5-gram KenLM; the bigram keeps the surface
  * oracle-able while preserving the exact pipeline shape (train on
  * trusted text → per-token cross-entropy → rank).
  *
  * Scale shape (100 TB): training is two hash aggregates over the
  * reference slice (bigram counts, context counts — both partial-agg,
  * vocabulary-bounded outputs). Scoring is scan-shaped: tokenize +
  * posexplode (corpus-sized, narrow), a per-doc `lag` window (bounded
  * by document length, keyed on doc id — no global window), then three
  * vocabulary-keyed equi-joins (token→vocab, (h,w)→c2, h→c1); all
  * joins hash equi-joins on bounded model tables, broadcast-able when
  * the vocabulary fits. No windows over the corpus axis, no
  * cross-products, nothing quadratic.
  *
  * Determinism (bit-exact oracle): every count is BIGINT; each
  * transition's log-probability is ONE fixed IEEE sequence
  * `ln((c2+α)/(c1+α·V))` (libm-1-ulp class) quantized to the 1e-6
  * integer grid with the floor-portable round — so the per-document
  * total is an exact BIGINT sum, immune to summation order in BOTH
  * engines. Cross-entropy and perplexity are one division and one
  * `exp` off that exact total, rounded to 6 dp. */
object NgramLm {

  /** Per-document cross-entropy under a bigram LM trained on
    * `refDocs`. Both frames must carry `idCol` (document key) and
    * `textCol`. Output: `(idCol, n_tok, n_oov, xent, ppl)` — scored
    * transitions, out-of-vocabulary token count, per-token
    * cross-entropy in nats (6 dp), perplexity e^xent (6 dp). Empty
    * documents are dropped (no transitions to score, documented). */
  def perplexity(docs: DataFrame, refDocs: DataFrame, idCol: String,
                 textCol: String, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be positive: $alpha")

    // ---- train: bigram + context counts over the reference slice ----
    val refTok = refDocs
      .select(col(idCol).as("__d"),
        posexplode(TextFunctions.tokens(col(textCol)))
          .as(Seq("__p", "__w")))
    val vocab = refTok.select(col("__w")).distinct()
    val nVocab = vocab.count() + 1L // + <unk>
    val refBi = refTok
      .withColumn("__h",
        lag(col("__w"), 1, "<s>").over(
          Window.partitionBy(col("__d")).orderBy(col("__p"))))
    val c2 = refBi.groupBy(col("__h"), col("__w"))
      .agg(count(lit(1)).as("__c2"))
    val c1 = refBi.groupBy(col("__h")).agg(count(lit(1)).as("__c1"))

    // ---- score: map OOV → <unk>, form transitions, join counts ------
    val vocabIv = vocab.select(col("__w").as("__vw"), lit(1).as("__iv"))
    val c2k = c2.select(col("__h").as("__h2"), col("__w").as("__w2"),
      col("__c2"))
    val c1k = c1.select(col("__h").as("__h1"), col("__c1"))
    val scored = docs
      .select(col(idCol), posexplode(TextFunctions.tokens(col(textCol)))
        .as(Seq("__p", "__w0")))
      .join(vocabIv, col("__w0") === col("__vw"), "left")
      .select(col(idCol), col("__p"),
        when(col("__iv").isNull, "<unk>").otherwise(col("__w0")).as("__cur"),
        col("__iv"))
      .withColumn("__prev",
        lag(col("__cur"), 1, "<s>").over(
          Window.partitionBy(col(idCol)).orderBy(col("__p"))))
      .join(c2k, col("__prev") === col("__h2") && col("__cur") === col("__w2"),
        "left")
      .join(c1k, col("__prev") === col("__h1"), "left")
    val num = coalesce(col("__c2"), lit(0L)).cast("double") + lit(alpha)
    val den = coalesce(col("__c1"), lit(0L)).cast("double") +
      lit(alpha) * lit(nVocab.toDouble)
    val lpMicro = floor(log(num / den) * lit(1e6) + lit(0.5)).cast("bigint")
    scored
      .withColumn("__lp", lpMicro)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("__iv").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(col("__lp")).as("__s"))
      .select(col(idCol), col("n_tok"), col("n_oov"),
        // floor-portable rounds (§5.3): xent = (grid sum)/1e6/n lands
        // on EXACT decimal ties whenever n divides the micro-nat sum
        // (2 tie cells at sf0.1) — round(·,6) half-ups through
        // BigDecimal in Spark but rounds the binary value in DuckDB
        (floor(-col("__s").cast("double") / lit(1e6) /
          col("n_tok").cast("double") * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("xent"),
        (floor(exp(-col("__s").cast("double") / lit(1e6) /
          col("n_tok").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("ppl"))
  }

  /** CCNet's SECOND half — perplexity BUCKETS: split each language's
    * documents into head/middle/tail thirds by perplexity under the
    * reference LM (Wenzek et al. 2020 §4.3 — pipelines then sample
    * head-heavy mixes, or keep the middle and drop the tail). Cutoffs
    * are the per-group exact type-7 terciles of ppl (Spark
    * `percentile` ≡ DuckDB `quantile_cont`, [[graft.impute.Robust]]'s
    * convention), rounded to 6 dp before the compare so both engines
    * cut identically. Output: `(idCol, groupCol, ppl, bucket)`.
    *
    * Scale: scoring is [[perplexity]]'s scan shape; the cutoffs are
    * one grouped percentile aggregate over the (already 6-dp) ppl
    * column broadcast back — the Robust stats-attach pattern, with
    * the same documented exact-percentile buffer hazard (per-group
    * value buffer; at corpus scale swap the cutoff agg for the
    * GK sketch the way the fence family does). */
  def perplexityBuckets(docs: DataFrame, refDocs: DataFrame, idCol: String,
                        textCol: String, groupCol: String,
                        alpha: Double = 0.5): DataFrame = {
    val scored = perplexity(docs, refDocs, idCol, textCol, alpha)
      .join(docs.select(col(idCol), col(groupCol)), idCol)
    // floor-portable cut rounds: tercile interpolation midway between
    // two 6-dp ppl values is an exact 7-dp tie — the same §5.3 class
    // as xent
    val cuts = scored.groupBy(col(groupCol))
      .agg((floor(expr("percentile(ppl, 0.3333333333333333e0)")
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("__c1"),
        (floor(expr("percentile(ppl, 0.6666666666666666e0)")
          * lit(1e6) + lit(0.5)) / lit(1e6)).as("__c2"))
    scored.join(broadcast(cuts), Seq(groupCol))
      .select(col(idCol), col(groupCol), col("ppl"),
        when(col("ppl") <= col("__c1"), "head")
          .when(col("ppl") <= col("__c2"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** DuckDB twin of [[perplexityBuckets]]: `groupsSql` must select
    * `(id, g)` mapping each document to its group. */
  def sqlPerplexityBuckets(docsSql: String, refSql: String,
                           groupsSql: String, idOut: String,
                           groupOut: String,
                           alpha: Double = 0.5): String = s"""
    WITH ppl0 AS (${sqlPerplexity(docsSql, refSql, "id", alpha)}),
    scored AS (
      SELECT p.id, g.g, p.ppl
      FROM ppl0 p JOIN ($groupsSql) g ON p.id = g.id
    ), cuts AS (
      SELECT g,
        floor(quantile_cont(ppl, 0.3333333333333333e0) * 1e6 + 0.5e0)
          / 1e6 AS c1,
        floor(quantile_cont(ppl, 0.6666666666666666e0) * 1e6 + 0.5e0)
          / 1e6 AS c2
      FROM scored GROUP BY g
    )
    SELECT s.id AS $idOut, s.g AS $groupOut, s.ppl,
      CASE WHEN s.ppl <= c.c1 THEN 'head'
        WHEN s.ppl <= c.c2 THEN 'middle'
        ELSE 'tail' END AS bucket
    FROM scored s JOIN cuts c ON s.g = c.g"""

  /** DuckDB twin of [[perplexity]]: `docsSql` / `refSql` must each
    * select `(id, toks)` with `toks` the whitespace token list
    * ([[graft.queries.TextQueries.sqlToks]]). */
  def sqlPerplexity(docsSql: String, refSql: String, idOut: String,
                    alpha: Double = 0.5): String = {
    import graft.functions.Noise.sqlDouble
    val a = sqlDouble(alpha)
    s"""
    WITH ref AS ($refSql),
    reftok AS (
      SELECT id AS d, CAST(t.i AS BIGINT) AS p, toks[t.i] AS w
      FROM ref, LATERAL unnest(range(1, len(toks) + 1)) AS t(i)
    ), vocab AS (SELECT DISTINCT w FROM reftok),
    nv AS (SELECT CAST(count(*) + 1 AS BIGINT) AS v FROM vocab),
    refbi AS (
      SELECT coalesce(lag(w) OVER (PARTITION BY d ORDER BY p), '<s>') AS h,
        w
      FROM reftok
    ), c2 AS (
      SELECT h, w, CAST(count(*) AS BIGINT) AS c2 FROM refbi GROUP BY h, w
    ), c1 AS (
      SELECT h, CAST(count(*) AS BIGINT) AS c1 FROM refbi GROUP BY h
    ), doc AS ($docsSql),
    doctok AS (
      SELECT id, CAST(t.i AS BIGINT) AS p, toks[t.i] AS w0
      FROM doc, LATERAL unnest(range(1, len(toks) + 1)) AS t(i)
    ), mapped AS (
      SELECT id, p,
        CASE WHEN v.w IS NULL THEN '<unk>' ELSE w0 END AS cur,
        CASE WHEN v.w IS NULL THEN 1 ELSE 0 END AS oov
      FROM doctok LEFT JOIN vocab v ON doctok.w0 = v.w
    ), trans AS (
      SELECT id, oov,
        coalesce(lag(cur) OVER (PARTITION BY id ORDER BY p), '<s>') AS h,
        cur
      FROM mapped
    ), lp AS (
      SELECT id, oov,
        CAST(floor(ln((CAST(coalesce(c2.c2, 0) AS DOUBLE) + $a)
            / (CAST(coalesce(c1.c1, 0) AS DOUBLE)
               + $a * CAST(nv.v AS DOUBLE))) * 1e6 + 0.5e0) AS BIGINT)
          AS lpm
      FROM trans
      LEFT JOIN c2 ON trans.h = c2.h AND trans.cur = c2.w
      LEFT JOIN c1 ON trans.h = c1.h
      CROSS JOIN nv
    )
    SELECT id AS $idOut, CAST(count(*) AS BIGINT) AS n_tok,
      CAST(sum(oov) AS BIGINT) AS n_oov,
      floor(-CAST(sum(lpm) AS DOUBLE) / 1e6
        / CAST(count(*) AS DOUBLE) * 1e6 + 0.5e0) / 1e6 AS xent,
      floor(exp(-CAST(sum(lpm) AS DOUBLE) / 1e6
        / CAST(count(*) AS DOUBLE)) * 1e6 + 0.5e0) / 1e6 AS ppl
    FROM lp GROUP BY id"""
  }
}
