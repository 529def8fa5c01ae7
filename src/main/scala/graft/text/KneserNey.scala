package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KNESER–NEY-SMOOTHED TRIGRAM LM PERPLEXITY — the published smoothing
  * behind the CCNet quality signal ([[NgramLm]] ships the add-α bigram
  * surrogate and says so; real pipelines score under a KN-smoothed
  * KenLM, Wenzek et al. 2020 / Heafield 2011). Interpolated KN with a
  * single absolute discount D (Chen & Goodman 1999, eq. 4.25):
  *
  *   P(w|u,v) = (max(c(uvw)−D, 0) + D·N₁₊(uv·)·P(w|v)) / c(uv·)
  *   P(w|v)   = (max(N₁₊(·vw)−D, 0) + D·N₁₊(v·)·P(w)) / N₁₊(·v·)
  *   P(w)     = (N₁₊(·w) + 1) / (N₁₊(··) + V)
  *
  * where N₁₊ are CONTINUATION counts (distinct-extension type counts —
  * the KN idea: "how many contexts has w completed", not "how often"),
  * the unigram level carries add-one over the V = |vocab|+1 event
  * space so `<unk>` keeps nonzero mass, and unseen histories back off
  * a level (c(uv·) = 0 → P(w|v); N₁₊(·v·) = 0 → P(w)). Every level
  * normalizes EXACTLY to 1 over vocab ∪ {unk} — Σ_w max(c−D,0) =
  * c(uv·) − D·N₁₊(uv·) because positive counts are ≥ 1 > D — which is
  * the spec's sharpest correctness check (KneserNeySpec).
  *
  * Documents are scored as `<s> <s> w₁ … wₙ` (n transitions, double
  * BOS so w₁ has a full trigram history); OOV tokens map to `<unk>`
  * BEFORE n-gram formation, exactly the [[NgramLm]] convention.
  *
  * Scale shape (100 TB): training is ONE trigram hash aggregate over
  * the reference slice followed by four PROJECTIONS of that bounded
  * count table (context totals, continuation counts per (v,w), per v,
  * per w) — all partial-agg, all vocabulary-bounded. Scoring is the
  * NgramLm scan: tokenize + posexplode (corpus-sized, narrow), two
  * per-doc `lag` windows (keyed on doc id — no global window), then
  * five equi-joins against bounded model tables (broadcast-able while
  * the vocabulary fits). No corpus-axis windows, nothing quadratic.
  *
  * Determinism (§5.3): counts are BIGINT; each transition's
  * probability is ONE fixed IEEE arithmetic DAG over those integers
  * and the constants D/V/N₁₊(··) — +,−,×,/ are correctly rounded and
  * engine-identical, `ln` is libm-1-ulp class — quantized to the 1e-6
  * integer grid with the floor-portable round, so per-document totals
  * are exact BIGINT sums; xent/ppl finish on the 6-dp grid. */
object KneserNey {

  /** Per-document cross-entropy under an interpolated-KN trigram LM
    * trained on `refDocs`. Output: `(idCol, n_tok, n_oov, xent, ppl)`
    * — the [[NgramLm.perplexity]] surface (empty docs drop: no
    * transitions to score). `discount` must sit in (0, 1) so positive
    * counts never clip to zero mass. */
  def perplexity(docs: DataFrame, refDocs: DataFrame, idCol: String,
                 textCol: String, discount: Double = 0.75): DataFrame =
    perplexityFromState(docs, modelState(refDocs, idCol, textCol),
      idCol, textCol, discount)

  /** The KN model as MERGEABLE STATE — the trigram count table
    * `(__u, __v, __w, __c3)`, from which every derived quantity
    * (context totals, continuation counts, vocabulary, N₁₊ totals)
    * projects deterministically. Counter tables merge by summation
    * ([[mergeStates]]) with `merge(state(A), state(B)) ≡
    * state(A ∪ B)` holding BIT-EXACTLY (counts add; the distinct
    * trigram key set is the union), so a nightly LM refresh folds the
    * new slice's counts into yesterday's state instead of re-reading
    * the whole trusted corpus — the [[graft.operators.IncrementalAgg]]
    * convention applied to the language model. */
  def modelState(refDocs: DataFrame, idCol: String,
                 textCol: String): DataFrame = {
    val refTok = refDocs
      .select(col(idCol).as("__d"),
        posexplode(TextFunctions.tokens(col(textCol)))
          .as(Seq("__p", "__w")))
    val wDoc = Window.partitionBy(col("__d")).orderBy(col("__p"))
    refTok
      .withColumn("__v", lag(col("__w"), 1, "<s>").over(wDoc))
      .withColumn("__u", lag(col("__w"), 2, "<s>").over(wDoc))
      .groupBy(col("__u"), col("__v"), col("__w"))
      .agg(count(lit(1)).as("__c3"))
  }

  /** State ⊕ state — counter sum per trigram key. */
  def mergeStates(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("__u"), col("__v"), col("__w"))
      .agg(sum(col("__c3")).as("__c3"))

  /** Score `docs` against a trained/merged model state. */
  def perplexityFromState(docs: DataFrame, state: DataFrame,
                          idCol: String, textCol: String,
                          discount: Double = 0.75): DataFrame = {
    require(discount > 0 && discount < 1,
      s"discount must be in (0, 1): $discount")
    val c3 = state.localCheckpoint()
    // vocabulary = the ref slice's token TYPES: every ref token is the
    // `w` of exactly one trigram, so distinct __w recovers it from the
    // state alone (no second corpus pass)
    val vocab = c3.select(col("__w")).distinct()
    val nVocab = vocab.count() + 1L // + <unk>
    // history totals + distinct continuations per (u,v): c(uv·), N₁₊(uv·)
    val uvT = c3.groupBy(col("__u"), col("__v"))
      .agg(sum(col("__c3")).as("__cuv"), count(lit(1)).as("__n1uv"))
    // continuation counts: rows of c3 are DISTINCT (u,v,w) types, so
    // counting rows per (v,w) IS N₁₊(·vw), per v IS (N₁₊(·v·), N₁₊(v·))
    val vwT = c3.groupBy(col("__v"), col("__w"))
      .agg(count(lit(1)).as("__n1vw"))
    val vT = vwT.groupBy(col("__v"))
      .agg(sum(col("__n1vw")).as("__n1vmid"), count(lit(1)).as("__n1vfol"))
    val wT = vwT.groupBy(col("__w")).agg(count(lit(1)).as("__n1w"))
    // N₁₊(··) = total distinct (v,w) bigram types — model-sized count
    val n1Total = vwT.count()

    // ---- score: map OOV → <unk>, two-lag histories, five model joins
    val vocabIv = vocab.select(col("__w").as("__vw"), lit(1).as("__iv"))
    val scoredTok = docs
      .select(col(idCol), posexplode(TextFunctions.tokens(col(textCol)))
        .as(Seq("__p", "__w0")))
      .join(vocabIv, col("__w0") === col("__vw"), "left")
      .select(col(idCol), col("__p"),
        when(col("__iv").isNull, "<unk>").otherwise(col("__w0")).as("__cur"),
        col("__iv"))
    val wId = Window.partitionBy(col(idCol)).orderBy(col("__p"))
    val trans = scoredTok
      .withColumn("__pv", lag(col("__cur"), 1, "<s>").over(wId))
      .withColumn("__pu", lag(col("__cur"), 2, "<s>").over(wId))
      .join(c3.select(col("__u"), col("__v"), col("__w"), col("__c3")),
        col("__pu") === col("__u") && col("__pv") === col("__v") &&
          col("__cur") === col("__w"), "left")
      .join(uvT.select(col("__u").as("__u2"), col("__v").as("__v2"),
          col("__cuv"), col("__n1uv")),
        col("__pu") === col("__u2") && col("__pv") === col("__v2"), "left")
      .join(vwT.select(col("__v").as("__v3"), col("__w").as("__w3"),
          col("__n1vw")),
        col("__pv") === col("__v3") && col("__cur") === col("__w3"), "left")
      .join(vT.select(col("__v").as("__v4"), col("__n1vmid"),
          col("__n1vfol")),
        col("__pv") === col("__v4"), "left")
      .join(wT.select(col("__w").as("__w5"), col("__n1w")),
        col("__cur") === col("__w5"), "left")

    val dD = lit(discount)
    def dbl(c: Column): Column = coalesce(c, lit(0L)).cast("double")
    val pUni = (dbl(col("__n1w")) + lit(1.0)) /
      lit(n1Total.toDouble + nVocab.toDouble)
    val pBi = when(col("__n1vmid").isNotNull,
      (greatest(dbl(col("__n1vw")) - dD, lit(0.0)) +
        dD * dbl(col("__n1vfol")) * pUni) / dbl(col("__n1vmid")))
      .otherwise(pUni)
    val pTri = when(col("__cuv").isNotNull,
      (greatest(dbl(col("__c3")) - dD, lit(0.0)) +
        dD * dbl(col("__n1uv")) * pBi) / dbl(col("__cuv")))
      .otherwise(pBi)
    val lpMicro = floor(log(pTri) * lit(1e6) + lit(0.5)).cast("bigint")
    trans
      .withColumn("__lp", lpMicro)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tok"),
        sum(when(col("__iv").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(col("__lp")).as("__s"))
      .select(col(idCol), col("n_tok"), col("n_oov"),
        // floor-portable finishes (§5.3): the grid-sum ÷ count lands
        // on exact decimal ties, where round(·,6) half-up vs binary
        // round diverges — same class NgramLm documents
        (floor(-col("__s").cast("double") / lit(1e6) /
          col("n_tok").cast("double") * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("xent"),
        (floor(exp(-col("__s").cast("double") / lit(1e6) /
          col("n_tok").cast("double")) * lit(1e6) + lit(0.5)) / lit(1e6))
          .as("ppl"))
  }

  /** CCNet perplexity BUCKETS re-seated on the KN model — the same
    * head/middle/tail tercile surface as [[NgramLm.perplexityBuckets]]
    * (Wenzek et al. 2020 §4.3), but ranked by the published smoothing
    * instead of the add-α surrogate: per-group exact type-7 terciles
    * of the 6-dp ppl, floor-portable-rounded before the compare.
    * Output: `(idCol, groupCol, ppl, bucket)`. */
  def perplexityBuckets(docs: DataFrame, refDocs: DataFrame, idCol: String,
                        textCol: String, groupCol: String,
                        discount: Double = 0.75): DataFrame = {
    val scored = perplexity(docs, refDocs, idCol, textCol, discount)
      .join(docs.select(col(idCol), col(groupCol)), idCol)
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
    * `(id, g)`. */
  def sqlPerplexityBuckets(docsSql: String, refSql: String,
                           groupsSql: String, idOut: String,
                           groupOut: String,
                           discount: Double = 0.75): String = s"""
    WITH ppl0 AS MATERIALIZED (${sqlPerplexity(docsSql, refSql, "id",
      discount)}),
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
    * ([[graft.queries.TextQueries.sqlToks]]). Identical count chain
    * and probability DAG, term for term. */
  def sqlPerplexity(docsSql: String, refSql: String, idOut: String,
                    discount: Double = 0.75): String = {
    import graft.functions.Noise.sqlDouble
    val d = sqlDouble(discount)
    s"""
    WITH ref AS ($refSql),
    reftok AS (
      SELECT id AS dd, CAST(t.i AS BIGINT) AS p, toks[t.i] AS w
      FROM ref, LATERAL unnest(range(1, len(toks) + 1)) AS t(i)
    ), vocab AS (SELECT DISTINCT w FROM reftok),
    nv AS (SELECT CAST(count(*) + 1 AS BIGINT) AS v FROM vocab),
    reftri AS (
      SELECT
        coalesce(lag(w, 2) OVER (PARTITION BY dd ORDER BY p), '<s>') AS u,
        coalesce(lag(w, 1) OVER (PARTITION BY dd ORDER BY p), '<s>') AS v,
        w
      FROM reftok
    ), c3 AS (
      SELECT u, v, w, CAST(count(*) AS BIGINT) AS c3
      FROM reftri GROUP BY u, v, w
    ), uvt AS (
      SELECT u, v, CAST(sum(c3) AS BIGINT) AS cuv,
        CAST(count(*) AS BIGINT) AS n1uv
      FROM c3 GROUP BY u, v
    ), vwt AS (
      SELECT v, w, CAST(count(*) AS BIGINT) AS n1vw FROM c3 GROUP BY v, w
    ), vt AS (
      SELECT v, CAST(sum(n1vw) AS BIGINT) AS n1vmid,
        CAST(count(*) AS BIGINT) AS n1vfol
      FROM vwt GROUP BY v
    ), wt AS (
      SELECT w, CAST(count(*) AS BIGINT) AS n1w FROM vwt GROUP BY w
    ), n1tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM vwt),
    doc AS ($docsSql),
    doctok AS (
      SELECT id, CAST(t.i AS BIGINT) AS p, toks[t.i] AS w0
      FROM doc, LATERAL unnest(range(1, len(toks) + 1)) AS t(i)
    ), mapped AS (
      SELECT id, p,
        CASE WHEN vv.w IS NULL THEN '<unk>' ELSE w0 END AS cur,
        CASE WHEN vv.w IS NULL THEN 1 ELSE 0 END AS oov
      FROM doctok LEFT JOIN vocab vv ON doctok.w0 = vv.w
    ), trans AS (
      SELECT id, oov,
        coalesce(lag(cur, 2) OVER (PARTITION BY id ORDER BY p), '<s>') AS pu,
        coalesce(lag(cur, 1) OVER (PARTITION BY id ORDER BY p), '<s>') AS pv,
        cur
      FROM mapped
    ), lp AS (
      SELECT id, oov,
        CAST(floor(ln(
          CASE WHEN uvt.cuv IS NOT NULL THEN
            (greatest(CAST(coalesce(c3.c3, 0) AS DOUBLE) - $d, 0.0e0)
              + $d * CAST(coalesce(uvt.n1uv, 0) AS DOUBLE) *
              (CASE WHEN vt.n1vmid IS NOT NULL THEN
                (greatest(CAST(coalesce(vwt.n1vw, 0) AS DOUBLE) - $d, 0.0e0)
                  + $d * CAST(coalesce(vt.n1vfol, 0) AS DOUBLE) *
                    ((CAST(coalesce(wt.n1w, 0) AS DOUBLE) + 1.0e0)
                     / (CAST(n1tot.t AS DOUBLE) + CAST(nv.v AS DOUBLE))))
                / CAST(vt.n1vmid AS DOUBLE)
              ELSE ((CAST(coalesce(wt.n1w, 0) AS DOUBLE) + 1.0e0)
                    / (CAST(n1tot.t AS DOUBLE) + CAST(nv.v AS DOUBLE)))
              END)) / CAST(uvt.cuv AS DOUBLE)
          ELSE
            (CASE WHEN vt.n1vmid IS NOT NULL THEN
              (greatest(CAST(coalesce(vwt.n1vw, 0) AS DOUBLE) - $d, 0.0e0)
                + $d * CAST(coalesce(vt.n1vfol, 0) AS DOUBLE) *
                  ((CAST(coalesce(wt.n1w, 0) AS DOUBLE) + 1.0e0)
                   / (CAST(n1tot.t AS DOUBLE) + CAST(nv.v AS DOUBLE))))
              / CAST(vt.n1vmid AS DOUBLE)
            ELSE ((CAST(coalesce(wt.n1w, 0) AS DOUBLE) + 1.0e0)
                  / (CAST(n1tot.t AS DOUBLE) + CAST(nv.v AS DOUBLE)))
            END)
          END) * 1e6 + 0.5e0) AS BIGINT) AS lpm
      FROM trans
      LEFT JOIN c3 ON trans.pu = c3.u AND trans.pv = c3.v
        AND trans.cur = c3.w
      LEFT JOIN uvt ON trans.pu = uvt.u AND trans.pv = uvt.v
      LEFT JOIN vwt ON trans.pv = vwt.v AND trans.cur = vwt.w
      LEFT JOIN vt ON trans.pv = vt.v
      LEFT JOIN wt ON trans.cur = wt.w
      CROSS JOIN nv CROSS JOIN n1tot
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
