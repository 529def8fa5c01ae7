package graft.queries

import graft.Tables
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

/** Text-analysis queries (C5/C7) over `documents`, with DuckDB oracles
  * that mirror the tokenization/arithmetic expression-for-expression.
  * Ratios are exact integer divisions (bit-identical across engines);
  * only cross-row averages get a 6-dp round to absorb sum-order noise.
  */
object TextQueries extends Registry {

  /** Shared by the c7_stratified_sample query and its oracle (declared
    * before the query maps — object vals initialize in order). */
  private val SampleFractions =
    Map("en" -> 0.35, "fr" -> 0.6, "de" -> 0.9)

  /** Target domain mixture for c7_domain_mixture (4 of the 20 sources;
    * the rest drop). Rates derive from these weights AND the observed
    * counts — see Sampling.mixture. */
  private val MixtureWeights =
    Map("src0" -> 0.35, "src1" -> 0.15, "src2" -> 0.2, "src17" -> 0.3)

  /** Train/val/test weights for the split-assignment queries — one val
    * shared by the Spark plan and the oracle SQL so the cumulative
    * integer thresholds can never diverge between engines. */
  private val SplitWeights =
    Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)

  /** Synthetic crawl URLs for the c7_url_* queries: consecutive doc-id
    * PAIRS share a page id (g = doc_id - doc_id % 2) and a host derived
    * from g, and differ only in canonicalization noise — case-shifted
    * scheme/host, `www.`, default port, tracking params, param order,
    * trailing slash, fragment — so canonical forms collide exactly in
    * pairs. Even ids take the noisy verbose form, odd ids the near-
    * canonical form; pairs alternate http/https families. The oracle
    * builds the same strings (sqlUrlFixture). */
  private def urlFixture(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val gl = col("doc_id") - (col("doc_id") % 2)
    val g = gl.cast("string")
    val site = concat(lit("site"), (gl % 50).cast("string"))
    val raw = when(col("doc_id") % 4 === 0,
        concat(lit("HTTP://WWW."), upper(site),
          lit(".EXAMPLE.COM:80/Docs/"), g,
          lit("/?b=2&a=1&utm_source=news#frag")))
      .when(col("doc_id") % 4 === 1,
        concat(lit("http://"), site, lit(".example.com/Docs/"), g,
          lit("?a=1&b=2&gclid=1")))
      .when(col("doc_id") % 4 === 2,
        concat(lit("HTTPS://WWW."), upper(site),
          lit(".EXAMPLE.COM:443/p/"), g,
          lit("/?utm_campaign=x&z=9&y=8")))
      .otherwise(
        concat(lit("https://"), site, lit(".example.com/p/"), g,
          lit("/?y=8&z=9&fbclid=f")))
    docs.select(col("doc_id"), raw.as("url"))
  }

  /** DuckDB CTE twin of [[urlFixture]] (yields table `f`: doc_id, url). */
  private def sqlUrlFixture: String =
    """f AS (
      |        SELECT doc_id,
      |          CASE WHEN doc_id % 4 = 0
      |               THEN 'HTTP://WWW.' || upper(site) || '.EXAMPLE.COM:80/Docs/'
      |                    || g || '/?b=2&a=1&utm_source=news#frag'
      |               WHEN doc_id % 4 = 1
      |               THEN 'http://' || site || '.example.com/Docs/'
      |                    || g || '?a=1&b=2&gclid=1'
      |               WHEN doc_id % 4 = 2
      |               THEN 'HTTPS://WWW.' || upper(site) || '.EXAMPLE.COM:443/p/'
      |                    || g || '/?utm_campaign=x&z=9&y=8'
      |               ELSE 'https://' || site || '.example.com/p/'
      |                    || g || '/?y=8&z=9&fbclid=f' END AS url
      |        FROM (SELECT doc_id,
      |                CAST(doc_id - doc_id % 2 AS VARCHAR) AS g,
      |                'site' || CAST((doc_id - doc_id % 2) % 50 AS VARCHAR) AS site
      |              FROM documents))""".stripMargin

  /** DuckDB fragment: whitespace tokens of lowercased text. */
  private[queries] def sqlToks(text: String): String =
    s"list_filter(string_split_regex(lower($text), '\\s+'), x -> len(x) > 0)"

  /** DuckDB fragment: word n-gram shingles (mirrors TextFunctions.shingles,
    * including its n==1 short-circuit — the CASE branch would emit ['']
    * for an empty doc where Spark emits []). */
  private[queries] def sqlShingles(toks: String, n: Int): String =
    if (n == 1) toks
    else
      s"""CASE WHEN len($toks) < $n THEN [array_to_string($toks, ' ')]
         | ELSE list_transform(range(0, len($toks) - $n + 1),
         |        i -> array_to_string(($toks)[i+1:i+$n], ' ')) END""".stripMargin

  /** DuckDB fragment: the wc / diversity / awl inputs of the quality
    * score, projected from a `toks` column (shared by every oracle that
    * recomputes TextFunctions.qualityScore — keep the single source). */
  private def sqlQualityInputs: String =
    """CAST(len(toks) AS DOUBLE) AS wc,
      |          CASE WHEN len(toks) = 0 THEN 0.0e0
      |               ELSE CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS diversity,
      |          CASE WHEN len(toks) = 0 THEN 0.0e0
      |               ELSE CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE)
      |                    / CAST(len(toks) AS DOUBLE) END AS awl""".stripMargin

  /** DuckDB fragment: the composite quality score over wc/diversity/awl
    * (term-for-term twin of TextFunctions.qualityScore). */
  private def sqlQualityExpr: String =
    """round(least(wc / 50.0e0, 1.0e0) * (CASE WHEN wc > 2000 THEN 0.5e0 ELSE 1.0e0 END) * 0.4e0
      |                + diversity * 0.4e0
      |                + (CASE WHEN awl >= 3 AND awl <= 10 THEN 1.0e0 ELSE 0.5e0 END) * 0.2e0, 6)""".stripMargin

  /** Shared WITH-prefix of the v4 curation chain's DuckDB twin —
    * stage CTEs through the temperature mixture (`mx`), consumed by
    * both c7_curation_v4 (adds split + packing) and its funnel (adds
    * the first-fail flags). Heavy stages MATERIALIZED: DuckDB inlines
    * CTEs per reference, and the nested stage builders reference
    * their inputs 2–3× each. */
  private lazy val v4SqlChain: String = {
    val cleanedSql = graft.text.ExactSubstring.sqlDedupSubstrings(
      "SELECT doc_id, text FROM documents WHERE doc_id >= 100", 8)
    val bpSql = graft.text.Boilerplate.sqlStripFrequentSpans(
      "SELECT doc_id, source AS g, clean_text AS text FROM gtd", 4, 3)
    val mxSql = graft.operators.Sampling.sqlTemperatureMixture(
      "mxin", "doc_id", "source", Seq("final_text"))
    s"""
      WITH cleaned AS MATERIALIZED ($cleanedSql),
      evt AS (SELECT ${sqlToks("text")} AS toks FROM documents
              WHERE doc_id < 100),
      ev AS MATERIALIZED (SELECT DISTINCT sh FROM (
          SELECT unnest(${sqlShingles("toks", 8)}) AS sh FROM evt)
        WHERE len(sh) > 0),
      ct AS MATERIALIZED (SELECT doc_id, clean_text,
          ${sqlToks("clean_text")} AS toks FROM cleaned),
      dg AS (SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id, unnest(${sqlShingles("toks", 8)}) AS sh FROM ct)
        WHERE len(sh) > 0),
      sc AS MATERIALIZED (SELECT doc_id,
          round(CAST(sum(CASE WHEN sh IN (SELECT sh FROM ev)
              THEN 1 ELSE 0 END) AS DOUBLE) / count(*), 6) AS contamination
        FROM dg GROUP BY doc_id),
      q0 AS (SELECT ct.doc_id, ct.clean_text, ct.toks
        FROM ct JOIN sc ON ct.doc_id = sc.doc_id
        WHERE sc.contamination <= 0.2e0),
      p4 AS (SELECT doc_id, clean_text,
          $sqlQualityInputs
        FROM q0),
      qq AS MATERIALIZED (SELECT doc_id, clean_text,
          $sqlQualityExpr AS quality
        FROM p4),
      gtd AS MATERIALIZED (SELECT qq.doc_id, d.source, qq.clean_text
        FROM qq JOIN documents d ON qq.doc_id = d.doc_id
        WHERE qq.quality >= 0.5e0),
      bp AS MATERIALIZED ($bpSql),
      mxin AS MATERIALIZED (SELECT bp.doc_id, d.source,
          bp.clean_text AS final_text
        FROM bp JOIN documents d ON bp.doc_id = d.doc_id),
      mx AS MATERIALIZED ($mxSql)"""
  }

  /** DuckDB fragment: winnowing fingerprints, one row per (doc_id, fp) —
    * mirrors graft.text.Winnowing expression-for-expression (Horner
    * rolling hash base 31 mod 1e9+7 via list_reduce; window minima;
    * per-doc distinct). Spark sequence(1,n) ↔ DuckDB range(1,n+1). */
  private[queries] def sqlWinnowFps(k: Int, w: Int): String = s"""
      winnow_t AS (
        SELECT doc_id, array_to_string(${sqlToks("text")}, ' ') AS norm
        FROM documents
      ), winnow_g AS (
        SELECT doc_id,
          CASE WHEN len(norm) < $k THEN CAST([] AS BIGINT[])
          ELSE list_transform(range(1, len(norm) - $k + 2),
            i -> list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(i, i + $k),
                     j -> CAST(ascii(norm[j:j]) AS BIGINT))),
                 (a, c) -> (a * 31 + c) % 1000000007)) END AS gh
        FROM winnow_t
      ), winnow_f AS (
        SELECT doc_id, unnest(
          CASE WHEN len(gh) = 0 THEN CAST([] AS BIGINT[])
          ELSE list_distinct(list_transform(
                 range(1, greatest(len(gh) - $w + 1, 1) + 1),
                 p -> list_min(gh[p:p+${w - 1}]))) END) AS fp
        FROM winnow_g
      )"""

  /** Stage frames of the v4 curation chain, shared by c7_curation_v4
    * and its funnel. Returns (docs, cleaned, contam, quality [decon
    * survivors + quality col, PRE-gate], stripped, mixed).
    *
    * With `checkpoint = true` each stage frame is localCheckpoint'd
    * (the Bpe/CC lineage convention) — the FUNNEL's setting: it
    * left-joins FIVE of these frames and each one's lineage would
    * otherwise re-derive the shared chain prefix (`mixed` alone
    * re-runs everything — the chain executed ~2–3× inside one query,
    * the round-12 bench's heaviest row; measured 11.3 → 7.1 s).
    * The LINEAR v4 query keeps `checkpoint = false`: inside one plan
    * Catalyst reuses the repeated `cleaned` exchange already, and
    * eagerly materializing the wide text frames measured 38% SLOWER
    * than the fused pipeline. The ops are deterministic, so both
    * settings are bit-identical (oracle-verified). */
  private def v4Stages(s: org.apache.spark.sql.SparkSession, d: String,
                       checkpoint: Boolean = false) = {
    def cp(df: org.apache.spark.sql.DataFrame) =
      if (checkpoint) df.localCheckpoint() else df
    val docs = Tables.documents(s, d)
    val cleaned = cp(graft.text.ExactSubstring.dedupSubstrings(
      docs.filter(col("doc_id") >= 100), "doc_id", "text", n = 8))
    val contam = cp(graft.dedup.Decontaminate.contaminationScoreExact(
      cleaned,
      docs.filter(col("doc_id") < 100).select(col("text").as("clean_text")),
      "doc_id", "clean_text")
      .select(col("doc_id"), col("contamination")))
    val quality = cp(cleaned
      .join(contam, "doc_id")
      .filter(col("contamination") <= 0.2)
      .withColumn("quality", TextFunctions.qualityScore(col("clean_text"))))
    val gated = quality.filter(col("quality") >= 0.5)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val stripped = cp(graft.text.Boilerplate.stripFrequentSpans(
      gated.select(col("doc_id"), col("source"), col("clean_text")),
      "doc_id", "clean_text", "source", spanTokens = 4, minDf = 3))
    val mixed = cp(graft.operators.Sampling.temperatureMixture(
      stripped.select(col("doc_id"), col("clean_text").as("final_text"))
        .join(docs.select(col("doc_id"), col("source")), "doc_id"),
      "doc_id", "source"))
    (docs, cleaned, contam, quality, stripped, mixed)
  }

  val queries: Map[String, Q] = Map(
    // C5: winnowing document fingerprints (MOSS) — per-doc fingerprint
    // stats; the fingerprint arithmetic is BIGINT Horner hashing, exact
    // in both engines.
    "c5_winnow_fingerprints" -> ((s, d) =>
      graft.text.Winnowing.fingerprints(Tables.documents(s, d), "doc_id", "text")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_fp"),
             min(col("fp")).as("fp_min"),
             max(col("fp")).as("fp_max"))),
    // C5: corpus statistics per (lang, source).
    "c5_text_stats" -> ((s, d) => {
      val text = col("text")
      val toks = TextFunctions.tokens(text)
      val tokChars = aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
      Tables.documents(s, d)
        .withColumn("__wc", TextFunctions.wordCount(text))
        .withColumn("__tokchars", tokChars)
        .withColumn("__dr", TextFunctions.distinctTokenRatio(text))
        .groupBy(col("lang"), col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("__wc")).as("total_words"),
          sum(length(text).cast("bigint")).as("total_chars"),
          (sum(col("__tokchars")).cast("double") / sum(col("__wc")).cast("double"))
            .as("mean_word_len"),
          round(avg(col("__dr")), 6).as("mean_distinct_ratio"))
    }),
    // C5: readability — Flesch ease + FK grade per doc: the
    // complexity signal next to the quality gates (boilerplate vs
    // encyclopedic vs legalese), on portable vowel-run/sentence-run
    // length arithmetic. Narrow projection fused into the scan.
    "c5_readability" -> ((s, d) =>
      graft.text.Readability.scores(
        Tables.documents(s, d), Seq("doc_id"), "text")),
    // C5: heuristic language ID — stopword-lexicon argmax per doc.
    "c5_lang_id" -> ((s, d) => {
      val text = col("text")
      val langs = TextFunctions.stopwords.keys.toSeq.sorted
      val base = Tables.documents(s, d).select(col("doc_id"), text, col("lang"))
      val withScores = langs.foldLeft(base) { (df, l) =>
        df.withColumn(s"ratio_$l", TextFunctions.stopwordRatio(text, l))
      }
      withScores
        .withColumn("lang_pred", TextFunctions.langId(text))
        .select(Seq(col("doc_id"), col("lang"), col("lang_pred")) ++
          langs.map(l => col(s"ratio_$l")): _*)
    }),
    // C5: language-ID CONFUSION MATRIX — the eval harness for the
    // heuristic classifier above: (labeled, predicted) counts plus
    // per-cell share of the labeled class. This is how a pipeline
    // decides whether the cheap n-gram/stopword ID is good enough to
    // gate a corpus, and the shape generalizes to any classifier eval.
    // C7: CURATION FUNNEL — "where did my 40% go": per sequential gate
    // (length floor → quality score → language allowlist), rows
    // reaching it, dropped by it (first-fail attribution — exactly the
    // composed .filter chain's behavior), surviving it. One scan, one
    // bounded-gate-axis histogram.
    "c7_curation_funnel" -> ((s, d) =>
      graft.operators.CurationFunnel.report(Tables.documents(s, d), Seq(
        "min_chars" -> (col("n_chars") >= 100),
        "quality" -> (TextFunctions.qualityScore(col("text")) >= 0.5),
        "lang" -> col("lang").isin("en", "fr", "es")))),
    // C5: COHEN'S κ — the confusion matrix's chance-corrected scalar
    // (raw agreement flatters itself on skewed label distributions):
    // labeled lang vs the heuristic prediction, the label-quality
    // number a pipeline actually alerts on.
    "c5_langid_kappa" -> ((s, d) =>
      graft.operators.Agreement.cohenKappa(
        Tables.documents(s, d)
          .select(col("lang").as("a"),
            graft.text.TextFunctions.langId(col("text")).as("b")),
        "a", "b")),
    // C7: CALIBRATION of the quality score — a score of 0.8 should be
    // "right" 80% of the time or every threshold chosen from it is
    // miscalibrated. Reliability bins + ECE against a deterministic
    // length criterion; every cell exact (decimal score sums, integer
    // accuracy ratios, bounded-bin ordered fold).
    "c7_quality_calibration" -> ((s, d) =>
      graft.operators.Calibration.reliability(
        Tables.documents(s, d)
          .select(TextFunctions.qualityScore(col("text")).as("score"),
            (col("n_chars") >= 200).cast("int").as("label")),
        "score", "label")),
    // C7: Brier + Murphy decomposition — the single-number twin of the
    // reliability table split into its causes: miscalibration (REL) vs
    // discrimination (RES) vs task noise (UNC). Same score/label pair.
    "c7_brier_decomposition" -> ((s, d) =>
      graft.operators.Calibration.brierDecomposition(
        Tables.documents(s, d)
          .select(TextFunctions.qualityScore(col("text")).as("score"),
            (col("n_chars") >= 200).cast("int").as("label")),
        "score", "label")),
    // C7: the calibration FIX — isotonic (PAV) step map over the same
    // score/label pair: one bounded-bin hash agg, exact integer
    // pooling driver-side. Iterative fixpoint → rows-only,
    // CalibrationSpec pins the semantics.
    "c7_isotonic_calibration" -> ((s, d) =>
      graft.operators.Calibration.isotonic(
        Tables.documents(s, d)
          .select(TextFunctions.qualityScore(col("text")).as("score"),
            (col("n_chars") >= 200).cast("int").as("label")),
        "score", "label", nBins = 50)),
    "c5_langid_confusion" -> ((s, d) => {
      val byLabel =
        org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      Tables.documents(s, d)
        .withColumn("lang_pred", graft.text.TextFunctions.langId(col("text")))
        .groupBy(col("lang"), col("lang_pred"))
        .agg(count(lit(1)).as("n"))
        .withColumn("share_of_label", round(
          col("n").cast("double") /
            sum(col("n")).over(byLabel).cast("double"), 6))
    }),
    // C7: quality gate — composite score + filter, the standard corpus
    // cleaning step before training.
    "c7_quality_filter" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("word_count", TextFunctions.wordCount(col("text")))
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
        .filter(col("quality") >= 0.5)
        .select("doc_id", "lang", "source", "word_count", "quality")),
    // C7b: deterministic stratified sampling (training-data mixing:
    // downsample dominant languages, keep rare ones) — keyed hash-noise
    // decision, so the exact sampled row set is oracle-able.
    "c7_stratified_sample" -> ((s, d) =>
      graft.operators.Sampling.stratified(Tables.documents(s, d),
          "doc_id", "lang", SampleFractions, defaultFraction = 0.1)
        .select("doc_id", "lang", "source", "n_chars")),
    // C7c: the end-to-end curation pipeline — the composed form of the
    // ops a real corpus cleaning job chains before training: quality
    // gate → language self-consistency gate (predicted == recorded
    // lang) → order-insensitive exact dedup keeping the min doc id.
    // Every stage is deterministic, so the WHOLE pipeline sits under
    // one oracle row (the point: operators compose without losing the
    // correctness gate). The dedup keep is min(doc_id) per fingerprint
    // via agg + re-join, NOT a window: a partial-aggregatable hash agg
    // collapses a skewed fingerprint (one giant boilerplate dup
    // cluster) map-side, where `min over (partition by __fp)` would
    // pin the whole cluster to a single window task (the same shape
    // StreamingNearDedup.resolveKept uses). The gated frame feeds both
    // the agg and the probe side, so it is materialized once — without
    // the checkpoint the quality/lang-id scans run twice.
    "c7_curation_pipeline" -> ((s, d) => {
      val text = col("text")
      val gated = Tables.documents(s, d)
        .withColumn("quality", TextFunctions.qualityScore(text))
        .filter(col("quality") >= 0.5)
        .withColumn("lang_pred", TextFunctions.langId(text))
        .filter(col("lang_pred") === col("lang"))
        .withColumn("__fp", graft.dedup.Dedup.tokenSetFingerprint(text))
        .select(col("doc_id"), col("lang"), col("source"),
          col("quality"), col("__fp"))
        .localCheckpoint()
      val keep = gated.groupBy(col("__fp"))
        .agg(min(col("doc_id")).as("__keep"))
      gated.join(keep, "__fp")
        .filter(col("doc_id") === col("__keep"))
        .select("doc_id", "lang", "source", "quality")
    }),
    // C5: character-trigram profile — top-5 per lang (classic n-gram
    // language profile), over the native one-pass CharNgrams
    // expression (the per-position substring composition re-seeks the
    // string per gram — O(len²) per doc).
    "c5_char_ngram_profile" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("lang")).orderBy(col("cnt").desc, col("gram").asc)
      Tables.documents(s, d)
        .select(col("lang"),
          explode(TextFunctions.charNgrams(lower(col("text")), 3)).as("gram"))
        .groupBy(col("lang"), col("gram"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rank", row_number().over(w).cast("bigint"))
        .filter(col("rank") <= 5)
    }),
    // C5: TF-IDF (hashing trick — engine-specific hashes → rows-only).
    // The L2 norm stays in codegen: vector_to_array → native DotProduct
    // (same left-to-right accumulation a toArray fold would use) — no
    // ScalaUDF node anywhere in the plan.
    "c5_tfidf_norms" -> ((s, d) => {
      val (out, _) = graft.text.TfIdf.transform(
        Tables.documents(s, d), "text", numFeatures = 1 << 12)
      val norm = graft.similarity.Cosine.norm(
        org.apache.spark.ml.functions.vector_to_array(col("tfidf")))
      out.groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
             round(avg(norm), 4).as("mean_tfidf_norm"))
    }),
    // C5: exact TF-IDF (real vocabulary, no hashing) — top-3 terms per
    // doc by smoothed tf·idf. Fully relational, so it sits under the
    // DuckDB oracle (the hashed variant above is rows-only by design).
    "c5_tfidf_exact" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("tfidf").desc, col("term").asc)
      graft.text.TfIdf.exact(Tables.documents(s, d), "doc_id", "text")
        .withColumn("rank", row_number().over(w).cast("bigint"))
        .filter(col("rank") <= 3)
    }),
    // C7: unigram language-model scoring — mean negative log2
    // probability per token under the corpus's own add-1-smoothed
    // unigram distribution (the perplexity-style quality signal real
    // pipelines threshold on: gibberish and boilerplate both score
    // badly). Deterministic: per-token logs summed on a 6-dp decimal
    // grid, so cross-engine log/sum-order noise cannot move the mean.
    "c7_unigram_logprob" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"),
        explode(TextFunctions.tokens(col("text"))).as("tok"))
      val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("c_tok"))
      val vocab = counts.agg(count(lit(1)).as("v"),
        sum(col("c_tok")).as("n_total"))
      toks.join(counts, "tok").crossJoin(broadcast(vocab))
        .withColumn("__nll", round(
          -log2((col("c_tok").cast("double") + 1.0) /
            (col("n_total").cast("double") + col("v").cast("double"))), 6)
          .cast("decimal(18,6)"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"),
          (sum(col("__nll")).cast("double") / count(lit(1)))
            .as("mean_nll"))
    }),
    // C5: context-window chunking — the training-data packing step:
    // 32-token windows every 24 tokens (8-token overlap), one row per
    // chunk with its token count and content fingerprint. Pure integer
    // window arithmetic → exact oracle.
    "c5_doc_chunks" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("__toks", TextFunctions.tokens(col("text")))
        .select(col("doc_id"),
          posexplode(TextFunctions.chunks(col("__toks"), 32, 24)))
        .toDF("doc_id", "chunk_idx", "chunk")
        .select(col("doc_id"), col("chunk_idx").cast("bigint").as("chunk_idx"),
          org.apache.spark.sql.functions.size(split(col("chunk"), " "))
            .cast("bigint").as("n_tokens"),
          md5(col("chunk")).as("chunk_md5"))),
    // C5: collocation extraction — top-20 bigrams by pointwise mutual
    // information (the classic corpus-analysis op: which adjacent word
    // pairs co-occur far beyond chance). PMI is ranked on the ROUNDED
    // value with (a, b) tie-breaks so the cut is identical across
    // engines (ln can differ by an ulp between libm implementations).
    "c5_collocations" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val toks = docs.select(explode(TextFunctions.tokens(col("text"))).as("tok"))
      val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c_tok"))
      val uniTotal = toks.agg(count(lit(1)).as("n_uni"))
      val bi = docs.select(
          explode(TextFunctions.shingles(col("text"), 2)).as("bg"))
        .filter(col("bg").contains(" ")) // <2-token docs emit no bigram
      val biTotal = bi.agg(count(lit(1)).as("n_bi"))
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("pmi").desc, col("a").asc, col("b").asc)
      bi.groupBy(col("bg")).agg(count(lit(1)).as("c_ab"))
        .filter(col("c_ab") >= 5)
        .withColumn("a", split(col("bg"), " ").getItem(0))
        .withColumn("b", split(col("bg"), " ").getItem(1))
        .join(uni.select(col("tok").as("a"), col("c_tok").as("c_a")), "a")
        .join(uni.select(col("tok").as("b"), col("c_tok").as("c_b")), "b")
        .crossJoin(broadcast(uniTotal)).crossJoin(broadcast(biTotal))
        .withColumn("pmi", round(log(
          (col("c_ab").cast("double") / col("n_bi")) /
            ((col("c_a").cast("double") / col("n_uni")) *
             (col("c_b").cast("double") / col("n_uni")))), 6))
        .withColumn("rank", row_number().over(w).cast("bigint"))
        .filter(col("rank") <= 20)
        .select("a", "b", "c_ab", "pmi", "rank")
    }),
    // North-star token accounting: approx-BPE token counts per source.
    "c5_token_counts" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("__bpe", TextFunctions.approxBpeCount(col("text")))
        .groupBy(col("source"))
        .agg(sum(col("__bpe")).as("total_tokens"),
             max(col("__bpe")).as("max_doc_tokens"),
             count(lit(1)).as("n_docs"))),
    // C5: exact corpus-wide top-k frequent tokens (vocabulary heavy
    // hitters) — explode + hash agg + TakeOrderedAndProject; the
    // (count desc, token asc) tie-break makes the cut deterministic, so
    // unlike sketch-based heavy hitters this is fully oracle-able.
    // C5: top-50 tokens via graft_topk_freq — same Misra-Gries shape
    // as c5_heavy_hitter_shingles below (one O(capacity) summary per
    // partition, merged on the driver side of the agg, ONE row out)
    // instead of shuffling the full (token, count) histogram. Capacity
    // 65536 > the corpus' distinct unigrams, so counts are exact and
    // the DuckDB oracle applies unchanged.
    // C7: compression-ratio quality signal — rows-only by the zlib
    // contract (deflate byte counts are JVM-build-defined, not SQL-
    // expressible); CompressionSignalSpec pins the discriminative
    // ordering (repetitive < prose < random) and layout determinism.
    "c7_compression_ratio" -> ((s, d) =>
      graft.text.CompressionSignal.ratios(
          Tables.documents(s, d).select("doc_id", "text"), "text")
        .select("doc_id", "raw_len", "deflate_len", "compression_ratio")),
    // C5: vocabulary drift between two corpus drops — new/vanished
    // terms + JS divergence of the df distributions (the "did the
    // crawl change under us" alarm; ColumnProfile.drift's text
    // sibling). Contributions on the 12-dp decimal grid so the Σ is
    // order-insensitive.
    // The fixture's word-soup vocabulary is identical across any doc
    // split, so the "cur" drop simulates a real crawl shift: the token
    // `spark` is renamed `sparkv2` (one term vanishes, one appears,
    // every shared term's mass shifts) — a deterministic regex both
    // engines apply identically.
    "c5_vocab_drift" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.text.VocabDrift.summary(
        docs.filter(col("doc_id") >= 250)
          .withColumn("text",
            regexp_replace(col("text"), "\\bspark\\b", "sparkv2")),
        docs.filter(col("doc_id") < 250), "doc_id", "text")
    }),
    // C5: KEYED heavy hitters — per-language top tokens via the same
    // Misra–Gries aggregate, one summary per group (the shape the
    // streaming twin StreamingHeavyHitters folds incrementally;
    // stream == this batch == oracle in the exact-capacity regime).
    "c5_lang_top_tokens" -> ((s, d) =>
      graft.streaming.StreamingHeavyHitters.topKBatch(
        graft.streaming.StreamingHeavyHitters.toItems(
          Tables.documents(s, d)
            .select(col("lang"),
              explode(graft.text.TextFunctions.tokens(col("text"))).as("token")),
          "lang", "token"),
        k = 10, capacity = 65536)),
    "c5_frequent_tokens" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(TextFunctions.tokens(col("text"))).as("token"))
        .agg(expr("graft_topk_freq(token, 50, 65536)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("token"), col("e.cnt").as("n"))),
    // C5: concat-and-chunk sequence packing (GPT-style) — global token
    // offsets via the two-level block prefix-sum (Packing.scala: no
    // full-corpus single-partition window), then pure integer-division
    // sequence assignment at 256-token capacity. blockSize=64 so the
    // block structure is actually exercised at test scale; the oracle
    // is the naive one-window cumsum, which must agree exactly.
    "c5_sequence_packing" -> ((s, d) =>
      graft.text.Packing.docPacking(Tables.documents(s, d),
        "doc_id", "text", seqLen = 256, blockSize = 64)),
    // C7: weighted domain-mixture sampling — rates computed FROM the
    // observed per-source counts to hit the target mixture with the
    // largest corpus possible (Sampling.mixture); keep decisions are
    // keyed hash-noise, so the exact sampled row set is oracle-able.
    "c7_domain_mixture" -> ((s, d) =>
      graft.operators.Sampling.mixture(Tables.documents(s, d),
          "doc_id", "source", MixtureWeights)
        .select("doc_id", "source", "lang", "n_chars", "rate")),
    // C7: TEMPERATURE-scaled mixture (α = 1/2, the multilingual-
    // pretraining move): √count weights upsample low-resource sources
    // without letting giants dominate; √ is correctly rounded by IEEE
    // so the rate boundary is engine-exact.
    "c7_temperature_mixture" -> ((s, d) =>
      graft.operators.Sampling.temperatureMixture(Tables.documents(s, d),
          "doc_id", "lang")
        .select("doc_id", "source", "lang", "n_chars", "rate")),
    // C7: PII redaction — plant deterministic e-mails (doc_id % 3) and
    // IPv4s (doc_id % 5) into the synthetic corpus, then scrub with the
    // portable regex chain (Redact.scala) and report per-doc redaction
    // counts + the md5 of the scrubbed text. Counts are taken on the
    // planted text (pre-redaction) in both engines.
    "c7_pii_redact" -> ((s, d) => {
      val planted1 = when(pmod(col("doc_id"), lit(3)) === 0,
        concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"), lit("@example.com now")))
        .otherwise(col("text"))
      Tables.documents(s, d)
        .withColumn("__t1", planted1)
        .withColumn("__txt", when(pmod(col("doc_id"), lit(5)) === 0,
          concat(col("__t1"), lit(" host 10.0."),
            pmod(col("doc_id"), lit(256)).cast("string"), lit(".7 up")))
          .otherwise(col("__t1")))
        .select(col("doc_id"),
          graft.text.Redact.countEmails(col("__txt")).cast("bigint").as("n_emails"),
          graft.text.Redact.countIps(col("__txt")).cast("bigint").as("n_ips"),
          md5(graft.text.Redact.redactPii(col("__txt"))).as("clean_md5"))
    }),
    // C7: token-budget corpus selection (BudgetSelect.scala) — keep the
    // highest-quality docs whose running token total fits a 15k-token
    // budget, rank order (quality desc, doc_id). Two-level prefix sum
    // binned by the 6-dp quality grid; the oracle runs the naive
    // one-window cumsum and must agree exactly.
    "c7_budget_select" -> ((s, d) =>
      graft.text.BudgetSelect.selectToBudget(
        Tables.documents(s, d).select(col("doc_id"),
          TextFunctions.qualityScore(col("text")).as("quality"),
          TextFunctions.wordCount(col("text")).as("n_tokens")),
        "doc_id", "quality", "n_tokens", budget = 15000L)),
    // C7: curation pipeline v2 — the round-5 ops COMPOSED end-to-end
    // under one oracle row: quality gate → repetition gate (token
    // diversity floor) → token-budget selection over the survivors →
    // PII scrub of the selected text. Like c7_curation_pipeline, the
    // point is that independently-verified operators chain without
    // losing the exactness guarantee.
    "c7_curation_v2" -> ((s, d) => {
      val gated = Tables.documents(s, d)
        .withColumn("quality", TextFunctions.qualityScore(col("text")))
        .filter(col("quality") >= 0.5)
        .filter(TextFunctions.distinctTokenRatio(col("text")) >= 0.1)
        .withColumn("n_tokens", TextFunctions.wordCount(col("text")))
      graft.text.BudgetSelect.selectToBudget(gated,
          "doc_id", "quality", "n_tokens", budget = 10000L)
        .select(col("doc_id"), col("quality"), col("n_tokens"),
          col("start_off"),
          md5(graft.text.Redact.redactPii(col("text"))).as("clean_md5"))
    }),
    // C7: Gopher-style repetition signals (Repetition.scala) — per-doc
    // duplicate-token and duplicate-trigram fractions plus the
    // most-common-token share, the standard boilerplate/spam gates.
    "c7_repetition_stats" -> ((s, d) =>
      graft.text.Repetition.stats(Tables.documents(s, d), "doc_id", "text")),
    // C5: GROUPED Misra-Gries — top-10 tokens per language through the
    // same bounded-memory aggregate, one summary per (group, partition)
    // instead of a full per-lang histogram shuffle. Exact-capacity
    // regime → the plain GROUP BY oracle applies.
    "c5_topk_per_lang" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("lang"), explode(TextFunctions.tokens(col("text"))).as("token"))
        .groupBy(col("lang"))
        .agg(expr("graft_topk_freq(token, 10, 65536)").as("tk"))
        .select(col("lang"), explode(col("tk")).as("e"))
        .select(col("lang"), col("e.item").as("token"), col("e.cnt").as("n"))),
    // C7: bigram language-model scoring — mean negative log2 of the
    // add-1-smoothed conditional P(w_i | w_{i-1}), the stronger quality
    // signal over the unigram variant (repetitive boilerplate has
    // high-probability unigrams but degenerate transitions). Same
    // decimal-grid determinism as c7_unigram_logprob; docs with < 2
    // tokens have no transitions and drop out in both engines.
    "c7_bigram_logprob" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // materialized once: the (doc_id, bigram) frame feeds BOTH the
      // per-bigram count build side and the probe side of the join, and
      // Spark has no cross-branch CSE — without the checkpoint the
      // dominant tokenize+shingle+explode pipeline runs twice (the same
      // pattern confirmedPairs and keptBatch document)
      val bi = docs.select(col("doc_id"),
          explode(TextFunctions.shingles(col("text"), 2)).as("bg"))
        .filter(col("bg").contains(" "))
        .localCheckpoint()
      val biCounts = bi.groupBy(col("bg")).agg(count(lit(1)).as("c_bg"))
      val uniCounts = docs.select(
          explode(TextFunctions.tokens(col("text"))).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("c_tok"))
      val vocab = uniCounts.agg(count(lit(1)).as("v"))
      bi.join(biCounts, "bg")
        .withColumn("__prev", split(col("bg"), " ").getItem(0))
        .join(uniCounts.select(col("tok").as("__prev"), col("c_tok")), "__prev")
        .crossJoin(broadcast(vocab))
        .withColumn("__nll", round(
          -log2((col("c_bg").cast("double") + 1.0) /
            (col("c_tok").cast("double") + col("v").cast("double"))), 6)
          .cast("decimal(18,6)"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          (sum(col("__nll")).cast("double") / count(lit(1))).as("mean_nll"))
    }),
    // C7: deterministic train/val/test assignment — every doc mapped to
    // exactly one split from its own id (pure BIGINT bucket arithmetic:
    // exhaustive, disjoint, append-stable — Sampling.assignSplits).
    "c7_split_assign" -> ((s, d) =>
      graft.operators.Sampling.assignSplits(
        Tables.documents(s, d).select("doc_id", "lang"),
        "doc_id", SplitWeights)),
    // C7: LEAKAGE-SAFE split — exact-duplicate docs elect a cluster
    // representative (min id over normalized text) and inherit ITS
    // split, so two copies of one document can never straddle
    // train/test (the classic eval-inflation leak c7_split_assign
    // alone cannot prevent).
    "c7_split_leakage_safe" -> ((s, d) =>
      graft.operators.Sampling.assignSplitsLeakageSafe(
        Tables.documents(s, d).select("doc_id", "text"),
        "doc_id", "text", SplitWeights)
        .select(col("doc_id"), col("cluster_rep"), col("split"))),
    // C7: the NEAR-DUP tier of the leakage-safe split — the portable
    // MinHash-LSH pairs (the oracled c2 pipeline) closed transitively
    // (min-label components), every doc keyed on its component rep:
    // token-shuffled near-copies can't straddle train/test either.
    "c7_split_leakage_neardup" -> ((s, d) => {
      import graft.dedup.MinHashDedup
      val docs = Tables.documents(s, d)
      val pairs = MinHashDedup.portableCandidatePairs(docs,
          "doc_id", "text", shingleSize = 1)
        .select(col("a"), col("b"))
      val labels = MinHashDedup.connectedComponents(pairs)
        .select(col("id").as("__lid"), col("component"))
      docs.select(col("doc_id"))
        .join(labels, col("doc_id") === col("__lid"), "left")
        .select(col("doc_id"),
          coalesce(col("component"), col("doc_id")).as("cluster_rep"))
        .withColumn("split", graft.operators.Sampling.splitExpr(
          col("cluster_rep"), SplitWeights))
    }),
    // C7 rows-only (trained model → float-order ~1e-12 coefficient
    // jitter, per the SparkEntry contract): the fastText-pattern
    // TRAINED quality filter — weak labels from the corpus (clean = 1)
    // vs synthesized crawl junk (digit soup / char runs / hash noise,
    // label 0), logistic regression over the deterministic text
    // signals, then P(clean) per real doc. Semantics pinned in
    // QualityClassifierSpec (holdout accuracy, junk margin).
    "c7_lr_quality" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val clean = docs.select(col("doc_id"), col("text"))
        .withColumn("label", lit(1.0))
      val junk = s.range(0, 200).select(
        (col("id") + 1000000L).as("doc_id"),
        when(col("id") % 3 === 0,
          repeat(concat(pmod(col("id") * 7919, lit(100000))
            .cast("string"), lit(" ")), 40))
          .when(col("id") % 3 === 1, repeat(lit("z"), 300))
          .otherwise(repeat(concat(lit("xq"),
            pmod(col("id") * 104729, lit(997)).cast("string"), lit(" ")),
            60)).as("text"),
        lit(0.0).as("label"))
      val model = graft.ml.QualityClassifier.train(
        clean.unionByName(junk), "text", "label")
      graft.ml.QualityClassifier.score(
          docs.select(col("doc_id"), col("text")), "text", model)
        .select(col("doc_id"), round(col("lr_quality"), 2).as("lr_quality"))
    }),
    // C7: per-group fixed-size sample — exactly k docs per language
    // (eval-set drawing: "20 random-but-reproducible docs per lang"),
    // composed from the portable intRank (uniform, key-derived) and
    // the skew-safe two-level TopPerGroup — a hot group spreads over
    // 16 tasks, and the result is the naive window's, under oracle.
    "c7_group_sample" -> ((s, d) => {
      val docs = Tables.documents(s, d).select(col("doc_id"), col("lang"))
        .withColumn("__rk",
          graft.functions.Noise.intRank(col("doc_id"), 11))
      graft.operators.TopPerGroup.topN(docs, "lang", "__rk", "doc_id",
          n = 20)
        .select(col("doc_id"), col("lang"), col("rank"))
    }),
    // C7/D41: epoch shuffle — the deterministic per-epoch corpus
    // permutation (reproducible training order), computed with the
    // two-level bucket scheme instead of a global sort; the oracle runs
    // the naive single-window form of the same (bucket, rank, id)
    // order, so the scale-safe path is pinned to the reference
    // permutation bit-for-bit.
    "c7_epoch_shuffle" -> ((s, d) =>
      graft.operators.EpochShuffle.positions(
        Tables.documents(s, d).select("doc_id"), "doc_id",
        epoch = 3, nBuckets = 64)),
    // C7: LEAKAGE-SAFE split — keyed on the Horner hash of the SOURCE
    // domain instead of the doc id, so every doc of a domain lands in
    // the same split and near-duplicates within a crawl domain cannot
    // straddle train/test. The grouped output proves the property on
    // the driver gate: one (source, split) row per source.
    "c7_split_by_source" -> ((s, d) =>
      graft.operators.Sampling.assignSplits(
        Tables.documents(s, d).withColumn("__k",
          graft.dedup.MinHashDedup.portableShingleHash(col("source"))),
        "__k", SplitWeights, salt = 19)
        .groupBy(col("source"), col("split"))
        .agg(count(lit(1)).as("n_docs"))),
    // C7/D35: URL canonicalization — the crawl-side dedup key. The
    // fixture plants pairs of URLs that differ only in normalization
    // noise (case, www, default port, tracking params, param order,
    // trailing slash, fragment); row-level canonical forms under the
    // exact oracle.
    "c7_url_canonicalize" -> ((s, d) =>
      urlFixture(Tables.documents(s, d))
        .select(col("doc_id"), col("url"),
          graft.text.UrlNormalize.canonical(col("url"))
            .as("canonical_url"))),
    // D35b: crawl dedup BY canonical URL — the planted pairs collapse
    // 2:1 (every canonical has exactly two raw forms; keeper = min id).
    "c7_url_dedup" -> ((s, d) =>
      urlFixture(Tables.documents(s, d))
        .withColumn("canonical_url",
          graft.text.UrlNormalize.canonical(col("url")))
        .groupBy(col("canonical_url"))
        .agg(min(col("doc_id")).as("keeper_id"),
          count(lit(1)).as("n_copies"))),
    // C7: exact-size deterministic sample — 100 docs by smallest keyed
    // hash-noise; TakeOrderedAndProject, never a global sort.
    "c7_fixed_size_sample" -> ((s, d) =>
      graft.operators.Sampling.fixedSize(
        Tables.documents(s, d).select("doc_id", "lang", "source", "n_chars"),
        "doc_id", k = 100)),
    // C7: WEIGHTED exact-size sample — PPS systematic on the integer
    // grid (Sampling.ppsSystematic): longer documents proportionally
    // more likely, Σ n_picks = 100 always, bit-portable (no float at
    // the selection boundary).
    "c7_pps_sample" -> ((s, d) =>
      graft.operators.Sampling.ppsSystematic(
        Tables.documents(s, d).select("doc_id", "n_chars"),
        "doc_id", "n_chars", k = 100)),
    // C5: UNICODE CANONICALIZATION — NFC + accent folding via the
    // native graft_unicode_norm expression: precomposed (U+00E9) and
    // decomposed (e + U+0301) arrivals of the same visible text
    // normalize to identical bytes (the dedup-key prerequisite); the
    // folded form additionally drops diacritics (ß/Ł untouched — no
    // decomposition). Oracle: DuckDB nfc_normalize / strip_accents on
    // a chr()-built twin of the planted suffixes.
    "c5_unicode_normalize" -> ((s, d) => {
      val suffix = when(col("doc_id") % 4 === 0, lit(" café"))
        .when(col("doc_id") % 4 === 1, lit(" café"))
        .when(col("doc_id") % 4 === 2, lit(" CAFE"))
        .otherwise(lit(" Åland straße"))
      val str = concat(col("text"), suffix)
      Tables.documents(s, d).filter(col("doc_id") < 50)
        .select(col("doc_id"),
          TextFunctions.unicodeNorm(str, stripAccents = false).as("nfc"),
          TextFunctions.unicodeNorm(str, stripAccents = true).as("folded"))
    }),
    // C5: code-vs-prose routing — symbol density + keyword evidence
    // over a planted fixture (every third doc gets a code snippet
    // appended, the unicode_normalize injection convention): the
    // router that sends code and prose to different filter stacks.
    "c5_code_detect" -> ((s, d) => {
      val snippet = when(col("doc_id") % 3 === 0,
        lit(" def f(x) { return g(x); } import os; const y = [1];"))
        .otherwise(lit(" plain prose about a function of the state"))
      val str = concat(col("text"), snippet)
      Tables.documents(s, d).filter(col("doc_id") < 200)
        .select(col("doc_id"),
          round(TextFunctions.codeSymbolRatio(str), 6)
            .as("symbol_ratio"),
          TextFunctions.codeKeywordHits(str).as("kw_hits"),
          TextFunctions.isCode(str, symbolThreshold = 0.01)
            .as("is_code"))
    }),
    // C5: ZIPF FIT — OLS of ln(freq) on ln(rank) over the top terms:
    // natural text gives slope ≈ −1 with high R²; boilerplate/token
    // soup bends or flattens the curve. The corpus-health number pair
    // read before a training mix is signed off.
    "c5_zipf_fit" -> ((s, d) =>
      graft.text.ZipfFit.fit(Tables.documents(s, d), "text", topN = 40)),
    // C5: HEAPS' LAW FIT — vocabulary growth V(N) ≈ k·N^β along the
    // doc-id corpus order: β ≈ 0.4–0.6 is natural text, β → 1 means
    // unique-ID soup, β → 0 boilerplate. No global ordering is built:
    // first arrivals are min(doc_id) hash aggs against 16 broadcast
    // percentile checkpoints.
    "c5_heaps_law" -> ((s, d) =>
      graft.text.ZipfFit.heapsFit(Tables.documents(s, d), "doc_id",
        "text", points = 16)),
    // D154: waterfilling budget allocation — the training-mix planning
    // step: take small sources whole, cap large ones at one common
    // water level λ so allocations sum to the token budget (max-min
    // fair). Closed form on the sorted bounded domain axis.
    "d80_waterfill" -> ((s, d) =>
      graft.operators.Sampling.waterfill(
        Tables.documents(s, d).groupBy(col("source"))
          .agg(sum(col("n_chars")).as("avail")),
        "source", "avail", budget = 100000L)),
    // C5: TOKEN ENTROPY — bits/token of each doc's token distribution
    // plus type–token ratio: the information-density gate that catches
    // keyword-stuffed / menu-scrape docs every length heuristic passes.
    "c5_token_entropy" -> ((s, d) =>
      graft.text.Entropy.tokenEntropy(Tables.documents(s, d), "doc_id",
        "text")),
    // C5: DISTINCTIVE TERMS — Monroe et al. weighted log-odds with an
    // informative Dirichlet prior, per source: frequent AND skewed
    // vocabulary, the corpus-analysis readout raw counts (stopwords)
    // and TF-IDF (one-offs) both get wrong.
    "c5_distinctive_terms" -> ((s, d) =>
      graft.text.DistinctiveTerms.distinctiveTerms(
        Tables.documents(s, d), "source", "text", k = 5)),
    // C5: TEXTRANK keywords — PageRank over the token-adjacency graph
    // (centrality, not frequency); pure composition of the oracled
    // bigram pass and the BIGINT-grid PageRank, top-50 total-ordered.
    "c5_textrank" -> ((s, d) =>
      graft.text.TextRank.keywords(Tables.documents(s, d), "text",
        k = 50, iterations = 3)),
    // C5: n-gram LM perplexity (CCNet, Wenzek et al. 2020) — train an
    // add-α bigram LM on the even-doc_id "trusted" slice, score EVERY
    // document's per-token cross-entropy under it. The fluency signal
    // heuristic ratios can't produce; per-token log-probs quantized to
    // the 1e-6 integer grid so the doc sums are order-free and the
    // whole scorer sits under the bit-exact oracle.
    "c5_lm_perplexity" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.text.NgramLm.perplexity(
        docs, docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    }),
    // C5: Kneser–Ney-smoothed TRIGRAM LM perplexity — the published
    // smoothing (Chen & Goodman 1999) replacing the add-α bigram
    // surrogate above: continuation counts at the bigram level, exact
    // level-wise normalization (KneserNeySpec), same trusted-slice
    // train / score-everything shape. Per-transition log-probs on the
    // 1e-6 grid → order-free doc sums → bit-exact oracle.
    "c5_lm_perplexity_kn" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.text.KneserNey.perplexity(
        docs, docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    }),
    // C5: INCREMENTAL KN maintenance — the trigram count table is
    // mergeable state (counter sum, merge ≡ retrain bit-exactly), so
    // the trusted-slice LM refreshes by folding a new shard's counts
    // into yesterday's state instead of re-reading the corpus. The
    // oracle is the FULL-model SQL: the merge identity makes the
    // outputs literally identical.
    "c5_lm_perplexity_kn_incr" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val ref = docs.filter(col("doc_id") % 2 === 0)
      val merged = graft.text.KneserNey.mergeStates(
        graft.text.KneserNey.modelState(
          ref.filter(col("doc_id") % 4 === 0), "doc_id", "text"),
        graft.text.KneserNey.modelState(
          ref.filter(col("doc_id") % 4 =!= 0), "doc_id", "text"))
      graft.text.KneserNey.perplexityFromState(docs, merged,
        "doc_id", "text")
    }),
    // C7: CCNet buckets RE-SEATED on the KN model — the bucket
    // decision that drives mixture sampling, now ranked by the
    // published smoothing (the add-α surrogate orders short/
    // boilerplate docs materially differently).
    "c7_ppl_buckets_kn" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.text.KneserNey.perplexityBuckets(
        docs, docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        "lang")
    }),
    // C7: CCNet perplexity buckets — per-language head/middle/tail
    // thirds under the reference LM (the published sampling surface:
    // head-heavy mixes, drop-the-tail curation). Exact type-7 tercile
    // cutoffs broadcast back, 6-dp rounded so both engines cut alike.
    "c7_ppl_buckets" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.text.NgramLm.perplexityBuckets(
        docs, docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        "lang")
    }),
    // C7: DSIR data selection — importance-resample 100 docs toward
    // the ENGLISH target distribution (Xie et al. 2023): add-1 unigram
    // likelihood-ratio weights piped into the exact-BIGINT PPS
    // sampler. The end-to-end published curation move, under the
    // bit-exact oracle.
    "c7_dsir_select" -> ((s, d) =>
      graft.text.Dsir.select(Tables.documents(s, d), "doc_id", "text",
        col("lang") === "en", k = 100)),
    // C7: curation pipeline v3 — the ROUND-6 operators composed end to
    // end under one oracle row: span-level dedup of the train slice →
    // graded decontamination on the CLEANED text (≤ 20% eval-gram
    // overlap) → quality gate on the cleaned text → per-domain cap
    // (top 15 per source). Each stage is independently oracle-verified;
    // this row proves they chain without losing the exactness gate —
    // and that downstream stages legitimately consume UPSTREAM OUTPUT
    // (grams/quality of the deduped text, not the raw text).
    "c7_curation_v3" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cleaned = graft.text.SpanDedup.dedupSpans(
        docs.filter(col("doc_id") >= 100), "doc_id", "text", spanTokens = 8)
      val contam = graft.dedup.Decontaminate.contaminationScoreExact(
        cleaned,
        // the eval side reads the SAME textCol name as the train side
        docs.filter(col("doc_id") < 100).select(col("text").as("clean_text")),
        "doc_id", "clean_text")
      val gated = cleaned
        .join(contam.select(col("doc_id"), col("contamination")), "doc_id")
        .filter(col("contamination") <= 0.2)
        .withColumn("quality", TextFunctions.qualityScore(col("clean_text")))
        .filter(col("quality") >= 0.5)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
      graft.operators.TopPerGroup.topN(gated, "source", "quality",
          "doc_id", n = 15)
        .select(col("doc_id"), col("source"), col("quality"),
          col("n_kept"), col("rank"), md5(col("clean_text")).as("clean_md5"))
    }),
    // C7: DoReMi-style DOMAIN REWEIGHTING (Xie et al. 2023,
    // deterministic surrogate) — domain weights chosen BY the data:
    // exponentiated-gradient ascent on per-domain excess loss (proxy
    // loss = mean quality deficit per source on the micro grid),
    // 5 fixed rounds on integer weight/loss grids so the whole outer
    // loop sits under the bit-exact oracle.
    "c7_domain_reweight" -> ((s, d) => {
      val losses = Tables.documents(s, d)
        .withColumn("__qm",
          floor(TextFunctions.qualityScore(col("text")) * lit(1e6)
            + lit(0.5)).cast("bigint"))
        .groupBy(col("source").as("g"))
        .agg((lit(1000000L) - expr("sum(__qm) DIV count(1)")).as("loss"))
      graft.operators.DomainReweight.reweight(losses, "g", "loss",
        rounds = 5)
    }),
    // C7: DoReMi END-TO-END — the learned weights FEED the mixture
    // sampler: reweight (above) → collect the 20-row weight table →
    // Sampling.mixture resamples the corpus to the learned mix. The
    // driver-side rate arithmetic is the same IEEE sequence as the
    // oracle's SQL (the sqlMixture contract), and the weights are
    // exact nano-grid quotients, so the SAMPLED ROW SET is bit-exact.
    "c7_doremi_mixture" -> ((s, d) => {
      val losses = Tables.documents(s, d)
        .withColumn("__qm",
          floor(TextFunctions.qualityScore(col("text")) * lit(1e6)
            + lit(0.5)).cast("bigint"))
        .groupBy(col("source").as("g"))
        .agg((lit(1000000L) - expr("sum(__qm) DIV count(1)")).as("loss"))
      val weights = graft.operators.DomainReweight.reweight(
          losses, "g", "loss", rounds = 5)
        .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
      graft.operators.Sampling.mixture(Tables.documents(s, d),
          "doc_id", "source", weights)
        .select("doc_id", "source", "lang", "n_chars", "rate")
    }),
    // C7: GOPHER RULE GATES (Rae et al. 2021 A1.1) — the published
    // hard-gate heuristics as exact per-doc signals: word-count band,
    // mean word length, #/… symbol ratio, bullet-started and
    // ellipsis-ended line ratios, alphabetic-word share, required
    // stop words. Structure planted deterministically (the synthetic
    // corpus has no newlines) so every rule actually discriminates.
    "c7_gopher_rules" -> ((s, d) => {
      val planted = concat(col("text"),
        when(col("doc_id") % 4 === 0,
          lit("\n- bullet one\n- bullet two\n* bullet three"))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          lit("\ntrailing thought...\nand more..."))
          .otherwise(lit("")),
        when(col("doc_id") % 7 === 0, lit(" ### ## ..."))
          .otherwise(lit("")))
      graft.text.GopherRules.report(
        Tables.documents(s, d).withColumn("text", planted),
        "doc_id", "text", minWords = 20L)
    }),
    // C7: curation pipeline v4 — the ROUND-12 composition: exact-
    // substring dedup (8-gram, first copy survives) → graded
    // decontamination vs the eval slice on the CLEANED text → quality
    // gate (native expression) → frequency-based boilerplate removal
    // (4-token spans, df ≥ 3 per source — 4-spans can still repeat
    // after the 8-gram dedup; 8-spans cannot, by construction) →
    // temperature domain mixture (α = ½ over sources present) →
    // leakage-safe train/val/test split on the FINAL text → GPT-style
    // sequence packing of the train split. Every stage consumes the
    // PREVIOUS stage's output and the whole chain sits under one
    // bit-exact oracle row; c7_curation_v4_funnel charges each
    // dropped doc to its first failing stage (counts telescope,
    // CurationFunnelSpec convention).
    "c7_curation_v4" -> ((s, d) => {
      // checkpoint = true (the funnel twin's shape): each stage feeds
      // the next AND later consumers — without materialization the
      // final plan replicates the whole 6-stage chain per reference
      // (measured 120 Exchanges / 24 scans / 32 SMJs in one plan;
      // checkpointed: ~1/5 of that). `split` is referenced twice
      // (rows + packing input), so it materializes too.
      val (_, _, _, _, _, mixed) = v4Stages(s, d, checkpoint = true)
      val split = graft.operators.Sampling.assignSplitsLeakageSafe(
        mixed.select(col("doc_id"), col("final_text").as("text"),
          col("source"), col("rate")),
        "doc_id", "text", SplitWeights)
        .localCheckpoint()
      val packed = graft.text.Packing.docPacking(
        split.filter(col("split") === "train")
          .select(col("doc_id"), col("text")),
        "doc_id", "text", seqLen = 256, blockSize = 64)
      split.join(packed, Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"), col("cluster_rep"),
          col("split"), col("rate"), col("n_tokens"), col("start_off"),
          col("seq_first"), col("seq_last"), col("n_seqs"),
          md5(col("text")).as("clean_md5"))
    }),
    // C7: v4's funnel — first-fail attribution across the five
    // dropping stages (split/packing drop nothing). A cleaned doc
    // shorter than 8 tokens carries no eval-grams and fails the
    // decontamination gate in both engines (null predicate = fail,
    // the CurationFunnel contract).
    "c7_curation_v4_funnel" -> ((s, d) => {
      val (docs, cleaned, contam, quality, stripped, mixed) =
        v4Stages(s, d, checkpoint = true)
      // ONE pass over the five (already checkpointed) stage frames
      // instead of five sequential left joins: union the per-stage
      // marks, fold them onto doc_id in a single aggregate (each doc
      // appears at most once per stage, so max() is exact identity —
      // values keep their types, absent docs stay null exactly as the
      // old left joins left them), then one left join onto the base.
      // 5 join shuffles of the corpus-sized base → 1 agg + 1 join.
      def mark(df: org.apache.spark.sql.DataFrame, k: Int,
               c: org.apache.spark.sql.Column) =
        df.select(col("doc_id"), lit(k).as("__k"),
          c.cast("double").as("__v"))
      val marks = mark(cleaned, 0, lit(1.0))
        .unionByName(mark(contam, 1, col("contamination")))
        .unionByName(mark(quality, 2, col("quality")))
        .unionByName(mark(stripped, 3, lit(1.0)))
        .unionByName(mark(mixed, 4, lit(1.0)))
        .groupBy(col("doc_id"))
        .agg(max(when(col("__k") === 0, lit(true))).as("__g1"),
          max(when(col("__k") === 1, col("__v"))).as("contamination"),
          max(when(col("__k") === 2, col("__v"))).as("quality"),
          max(when(col("__k") === 3, lit(true))).as("__g4"),
          max(when(col("__k") === 4, lit(true))).as("__g5"))
      // materialize the narrow flags frame (one row per base doc):
      // CurationFunnel.report references its input from two subtrees
      // (histogram + total), and an unmaterialized flags frame would
      // re-run the whole stage-marks aggregation per reference
      val flags = docs.filter(col("doc_id") >= 100).select(col("doc_id"))
        .join(marks, Seq("doc_id"), "left")
        .localCheckpoint()
      graft.operators.CurationFunnel.report(flags, Seq(
        "substring_dedup" -> col("__g1"),
        "decontam" -> (col("contamination") <= 0.2),
        "quality" -> (col("quality") >= 0.5),
        "boilerplate" -> col("__g4"),
        "mixture" -> col("__g5")))
    }),
    // C7: HTML boilerplate stripping — the web-crawl first pass. The
    // fixture wraps each doc's text in deterministic markup (head,
    // style + script blocks, comment, entities around the body) so the
    // strip provably removes block elements wholesale and keeps the
    // payload text; the DuckDB twin builds and strips the SAME markup
    // (Java/RE2-common regex subset, see HtmlStrip), compared by md5
    // of the cleaned bytes.
    "c7_html_strip" -> ((s, d) => {
      val html = concat(
        lit("<html><head><title>t</title><style>p {color: red}</style>" +
          "</head><body><!-- id "),
        col("doc_id").cast("string"),
        lit(" --><h1>Q&amp;A</h1><p class=\"main\">"), col("text"),
        lit("</p><script type=\"text/javascript\">var x = 1;" +
          "</script></body></html>"))
      Tables.documents(s, d)
        .select(col("doc_id"),
          graft.text.HtmlStrip.strip(html).as("clean"))
        .select(col("doc_id"), md5(col("clean")).as("clean_md5"),
          length(col("clean")).cast("bigint").as("n_chars_clean"))
    }),
    // C7: per-domain quality cap (RefinedWeb "max N pages per domain")
    // — exact top-25 per source by (quality desc, doc_id), computed
    // with the salted two-level TopPerGroup so a hot domain spreads
    // over 16 tasks instead of pinning one window task; the result is
    // exactly the naive single-window top-N (TopPerGroupSpec), which
    // is what the oracle computes.
    "c7_domain_cap" -> ((s, d) =>
      graft.operators.TopPerGroup.topN(
        Tables.documents(s, d)
          .withColumn("quality", TextFunctions.qualityScore(col("text"))),
        groupCol = "source", orderCol = "quality", idCol = "doc_id", n = 25)
        .select("doc_id", "source", "quality", "rank")),
    // C5: heavy-hitter shingles via the graft_topk_freq Misra-Gries
    // aggregate (expressions/TopKFreq.scala) — bounded-memory top-k
    // with NO full histogram shuffle: one O(capacity) summary per
    // partition, merged, one row out. At 100 TB the exact variant
    // above shuffles the full (shingle, count) space; this never
    // does. Capacity 65536 > the corpus' distinct 3-shingles (27k at
    // sf0.1), so counts are exact here and the DuckDB oracle applies;
    // past capacity it degrades to the documented n/(cap+1) bound
    // (TopKFreqSpec covers that regime).
    "c5_heavy_hitter_shingles" -> ((s, d) =>
      Tables.documents(s, d)
        .select(explode(TextFunctions.shingles(col("text"), 3)).as("sh"))
        .agg(expr("graft_topk_freq(sh, 30, 65536)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("shingle"), col("e.cnt").as("n"))),
    // C5: BPE tokenizer training (graft.text.Bpe) — 30 merges learned
    // from the corpus: ONE distributed corpus pass (word frequencies),
    // then the merge loop runs driver-side over the bounded word table
    // with incremental pair stats (round 10: the per-merge Spark-job
    // latency cliff is gone — a 32k-merge vocab no longer means ~100k
    // sequential jobs). Rows-only by the no-oracle contract (iterative
    // data-dependent argmax isn't one SQL query); BpeSpec pins
    // learn ≡ learnDistributed ≡ an independent reference.
    "c5_bpe_merges" -> ((s, d) =>
      graft.text.Bpe.mergesDf(s,
        graft.text.Bpe.learn(Tables.documents(s, d).select("text"),
          "text", nMerges = 30))),
    // C5: tokenizer FERTILITY — tokens/word + chars/token per language
    // under the corpus-trained merges: the per-language tax a shipped
    // vocabulary levies, measured before it ships. Rows-only by the
    // BPE-family contract (driver-derived merge table).
    "c5_bpe_fertility" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val merges = graft.text.Bpe.learn(docs.select("text"), "text",
        nMerges = 30)
      graft.text.Bpe.fertility(docs, "lang", "text", merges)
    }),
    // C5: UNIGRAM-LM TOKENIZER (SentencePiece's default, Kudo 2018) —
    // the second production tokenizer family next to BPE: seed → hard
    // EM → prune driver-side over the bounded word table (the Bpe
    // two-phase shape), then the learned vocabulary re-applied to the
    // distinct word table via the distributed Viterbi encode so the
    // timed row exercises both halves. Iterative selection isn't one
    // SQL query → rows-only, spec-pinned (UnigramLmSpec).
    "c5_unigram_vocab" -> ((s, d) => {
      val docs = Tables.documents(s, d).select("text")
      val pieces = graft.text.UnigramLm.learn(docs, "text",
        vocabSize = 120, maxPieceLen = 5)
      val enc = graft.text.UnigramLm.encodeWords(
        graft.text.Bpe.wordFreq(docs, "text"), pieces)
      val usage = enc
        .select(explode(col("pieces")).as("piece"), col("freq"))
        .groupBy("piece").agg(sum(col("freq")).as("n_uses"))
      graft.text.UnigramLm.piecesDf(s, pieces)
        .join(usage, Seq("piece"), "left")
        .select(col("rank"), col("piece"), col("count"),
          col("log_prob"), coalesce(col("n_uses"), lit(0L)).as("n_uses"))
    }),
  )

  private val langs = TextFunctions.stopwords.keys.toSeq.sorted

  private def sqlRatio(l: String): String = {
    val lex = TextFunctions.stopwords(l).map(w => s"'$w'").mkString("[", ", ", "]")
    s"""CASE WHEN len(toks) = 0 THEN 0.0e0
       | ELSE CAST(len(list_filter(toks, t -> list_contains($lex, t))) AS DOUBLE)
       |      / CAST(len(toks) AS DOUBLE) END""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "c5_winnow_fingerprints" -> s"""
      WITH ${sqlWinnowFps(8, 4)}
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
             min(fp) AS fp_min, max(fp) AS fp_max
      FROM winnow_f GROUP BY doc_id""",
    "c5_text_stats" -> s"""
      WITH t AS (
        SELECT lang, source, ${sqlToks("text")} AS toks, text FROM documents
      ), p AS (
        SELECT lang, source,
          len(toks) AS wc,
          CAST(list_sum(list_transform(toks, t -> len(t))) AS BIGINT) AS tokchars,
          CASE WHEN len(toks) = 0 THEN 0.0e0
               ELSE CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS dr,
          len(text) AS chars
        FROM t)
      SELECT lang, source, count(*) AS n_docs,
        CAST(sum(wc) AS BIGINT) AS total_words,
        CAST(sum(chars) AS BIGINT) AS total_chars,
        CAST(sum(tokchars) AS DOUBLE) / CAST(sum(wc) AS DOUBLE) AS mean_word_len,
        round(avg(dr), 6) AS mean_distinct_ratio
      FROM p GROUP BY lang, source""",
    "c5_readability" -> graft.text.Readability.sql(
      "documents", Seq("doc_id"), "text"),
    "c5_lang_id" -> {
      val ratios = langs.map(l => s"${sqlRatio(l)} AS ratio_$l").mkString(",\n          ")
      val best = s"greatest(${langs.map(l => s"ratio_$l").mkString(", ")})"
      val pick = langs.map(l => s"WHEN ratio_$l = $best THEN '$l'")
        .mkString("CASE ", " ", " END")
      s"""
      WITH t AS (SELECT doc_id, lang, ${sqlToks("text")} AS toks FROM documents),
      r AS (SELECT doc_id, lang,
          $ratios
        FROM t)
      SELECT doc_id, lang, $pick AS lang_pred,
             ${langs.map(l => s"ratio_$l").mkString(", ")}
      FROM r"""
    },
    "c7_curation_funnel" -> graft.operators.CurationFunnel.sqlReport(
      s"""(WITH t AS (
            SELECT doc_id, lang, n_chars, ${sqlToks("text")} AS toks
            FROM documents
          ), p AS (
            SELECT doc_id, lang, n_chars, $sqlQualityInputs FROM t)
          SELECT doc_id, lang, n_chars, $sqlQualityExpr AS q FROM p)""",
      Seq(
        "min_chars" -> "n_chars >= 100",
        "quality" -> "q >= 0.5e0",
        "lang" -> "lang IN ('en', 'fr', 'es')")),
    "c5_langid_kappa" -> {
      val best = s"greatest(${langs.map(l => s"ratio_$l").mkString(", ")})"
      val pick = langs.map(l => s"WHEN ratio_$l = $best THEN '$l'")
        .mkString("CASE ", " ", " END")
      val ratios = langs.map(l => s"${sqlRatio(l)} AS ratio_$l")
        .mkString(",\n          ")
      graft.operators.Agreement.sqlCohenKappa(s"""
        WITH t AS (SELECT doc_id, lang, ${sqlToks("text")} AS toks
          FROM documents),
        r AS (SELECT doc_id, lang, $ratios FROM t)
        SELECT lang AS a, $pick AS b FROM r""")
    },
    "c7_quality_calibration" -> graft.operators.Calibration.sqlReliability(s"""
      WITH t AS (
        SELECT doc_id, n_chars, ${sqlToks("text")} AS toks FROM documents
      ), p AS (
        SELECT doc_id, n_chars, $sqlQualityInputs FROM t)
      SELECT $sqlQualityExpr AS score,
        CAST(n_chars >= 200 AS INT) AS label
      FROM p"""),
    "c7_brier_decomposition" ->
      graft.operators.Calibration.sqlBrierDecomposition(s"""
      WITH t AS (
        SELECT doc_id, n_chars, ${sqlToks("text")} AS toks FROM documents
      ), p AS (
        SELECT doc_id, n_chars, $sqlQualityInputs FROM t)
      SELECT $sqlQualityExpr AS score,
        CAST(n_chars >= 200 AS INT) AS label
      FROM p"""),
    "c5_langid_confusion" -> {
      val best = s"greatest(${langs.map(l => s"ratio_$l").mkString(", ")})"
      val pick = langs.map(l => s"WHEN ratio_$l = $best THEN '$l'")
        .mkString("CASE ", " ", " END")
      val ratios = langs.map(l => s"${sqlRatio(l)} AS ratio_$l").mkString(",\n          ")
      s"""
      WITH t AS (SELECT doc_id, lang, ${sqlToks("text")} AS toks FROM documents),
      r AS (SELECT doc_id, lang, $ratios FROM t),
      p AS (SELECT lang, $pick AS lang_pred FROM r),
      c AS (SELECT lang, lang_pred, count(*) AS n FROM p GROUP BY lang, lang_pred)
      SELECT lang, lang_pred, n,
        round(CAST(n AS DOUBLE) /
          CAST(sum(n) OVER (PARTITION BY lang) AS DOUBLE), 6) AS share_of_label
      FROM c"""
    },
    "c7_quality_filter" -> s"""
      WITH t AS (
        SELECT doc_id, lang, source, ${sqlToks("text")} AS toks FROM documents
      ), p AS (
        SELECT doc_id, lang, source,
          CAST(len(toks) AS BIGINT) AS word_count,
          $sqlQualityInputs
        FROM t)
      SELECT doc_id, lang, source, word_count,
        $sqlQualityExpr AS quality
      FROM p
      WHERE $sqlQualityExpr >= 0.5e0""",
    "c7_fixed_size_sample" -> s"""
      SELECT doc_id, lang, source, n_chars FROM documents
      ${graft.operators.Sampling.sqlFixedSize("doc_id", 100)}""",
    "c7_pps_sample" -> graft.operators.Sampling.sqlPps(
      "documents", "doc_id", "n_chars", 100, Seq("doc_id", "n_chars")),
    "c5_zipf_fit" -> graft.text.ZipfFit.sqlFit(
      s"SELECT ${sqlToks("text")} AS toks FROM documents", topN = 40),
    "c5_heaps_law" -> graft.text.ZipfFit.sqlHeapsFit(
      s"SELECT doc_id AS id, ${sqlToks("text")} AS toks FROM documents",
      points = 16),
    "d80_waterfill" -> graft.operators.Sampling.sqlWaterfill(
      """SELECT source AS domain, CAST(sum(n_chars) AS BIGINT) AS avail
         FROM documents GROUP BY source""", budget = 100000L),
    "c5_token_entropy" -> s"""
      SELECT id AS doc_id, n_tokens, n_types, entropy, ttr
      FROM (${graft.text.Entropy.sqlTokenEntropy(
        s"SELECT doc_id AS id, ${sqlToks("text")} AS toks FROM documents")})""",
    "c5_distinctive_terms" -> graft.text.DistinctiveTerms.sqlDistinctiveTerms(
      s"SELECT source AS g, ${sqlToks("text")} AS toks FROM documents",
      groupOut = "source", k = 5),
    "c5_textrank" -> graft.text.TextRank.sql(
      "documents", sqlToks("text"), k = 50, iterations = 3),
    "c5_lm_perplexity" -> graft.text.NgramLm.sqlPerplexity(
      s"SELECT doc_id AS id, ${sqlToks("text")} AS toks FROM documents",
      s"""SELECT doc_id AS id, ${sqlToks("text")} AS toks FROM documents
         WHERE doc_id % 2 = 0""",
      idOut = "doc_id"),
    "c5_lm_perplexity_kn" -> graft.text.KneserNey.sqlPerplexity(
      s"SELECT doc_id AS id, ${sqlToks("text")} AS toks FROM documents",
      s"""SELECT doc_id AS id, ${sqlToks("text")} AS toks FROM documents
         WHERE doc_id % 2 = 0""",
      idOut = "doc_id"),
    // merge(state(A), state(B)) ≡ state(A ∪ B) bit-exactly, so the
    // incremental query's oracle IS the full-model recompute
    "c5_lm_perplexity_kn_incr" -> graft.text.KneserNey.sqlPerplexity(
      s"SELECT doc_id AS id, ${sqlToks("text")} AS toks FROM documents",
      s"""SELECT doc_id AS id, ${sqlToks("text")} AS toks FROM documents
         WHERE doc_id % 2 = 0""",
      idOut = "doc_id"),
    "c7_ppl_buckets_kn" -> graft.text.KneserNey.sqlPerplexityBuckets(
      s"SELECT doc_id AS id, ${sqlToks("text")} AS toks FROM documents",
      s"""SELECT doc_id AS id, ${sqlToks("text")} AS toks FROM documents
         WHERE doc_id % 2 = 0""",
      "SELECT doc_id AS id, lang AS g FROM documents",
      idOut = "doc_id", groupOut = "lang"),
    "c7_ppl_buckets" -> graft.text.NgramLm.sqlPerplexityBuckets(
      s"SELECT doc_id AS id, ${sqlToks("text")} AS toks FROM documents",
      s"""SELECT doc_id AS id, ${sqlToks("text")} AS toks FROM documents
         WHERE doc_id % 2 = 0""",
      "SELECT doc_id AS id, lang AS g FROM documents",
      idOut = "doc_id", groupOut = "lang"),
    "c5_code_detect" -> """
      WITH f AS (
        SELECT doc_id, text || CASE WHEN doc_id % 3 = 0
            THEN ' def f(x) { return g(x); } import os; const y = [1];'
            ELSE ' plain prose about a function of the state' END AS s
        FROM documents WHERE doc_id < 200
      ), m AS (
        SELECT doc_id,
          CASE WHEN len(s) = 0 THEN 0.0e0
            ELSE CAST(len(s) - len(regexp_replace(s,
              '[{}();=<>\[\]]', '', 'g')) AS DOUBLE)
              / CAST(len(s) AS DOUBLE) END AS sr,
          CAST(len(regexp_extract_all(lower(s),
            '\b(def|return|import|class|function|var|const|void)\b'))
            AS BIGINT) AS kw
        FROM f)
      SELECT doc_id, round(sr, 6) AS symbol_ratio, kw AS kw_hits,
        CAST(sr > 1.0e-2 AND kw >= 2 AS INT) AS is_code
      FROM m""",
    "c5_unicode_normalize" -> """
      WITH f AS (
        SELECT doc_id, text || CASE CAST(doc_id % 4 AS INT)
            WHEN 0 THEN ' caf' || chr(233)
            WHEN 1 THEN ' cafe' || chr(769)
            WHEN 2 THEN ' CAFE'
            ELSE ' ' || chr(197) || 'land stra' || chr(223) || 'e' END
          AS s
        FROM documents WHERE doc_id < 50)
      SELECT doc_id, nfc_normalize(s) AS nfc,
        strip_accents(nfc_normalize(s)) AS folded
      FROM f""",
    "c7_dsir_select" -> graft.operators.Sampling.sqlPps(
      s"""(${graft.text.Dsir.sqlImportanceWeights(
        s"""SELECT doc_id AS id, lang = 'en' AS t,
              ${sqlToks("text")} AS toks
            FROM documents""", idOut = "doc_id")})""",
      "doc_id", "weight", 100,
      Seq("doc_id", "n_tokens", "mean_ratio", "weight")),
    "c7_url_canonicalize" -> s"""
      WITH $sqlUrlFixture
      SELECT doc_id, url,
        ${graft.text.UrlNormalize.sqlCanonical("url")} AS canonical_url
      FROM f""",
    "c7_url_dedup" -> s"""
      WITH $sqlUrlFixture
      SELECT ${graft.text.UrlNormalize.sqlCanonical("url")}
               AS canonical_url,
             min(doc_id) AS keeper_id,
             CAST(count(*) AS BIGINT) AS n_copies
      FROM f GROUP BY 1""",
    "c7_split_assign" -> s"""
      SELECT doc_id, lang,
        ${graft.operators.Sampling.sqlSplitExpr("doc_id", SplitWeights)}
          AS split
      FROM documents""",
    "c7_split_leakage_safe" -> graft.operators.Sampling
      .sqlSplitLeakageSafe(
        "SELECT doc_id, text FROM documents", "doc_id", SplitWeights),
    // near-dup tier: the oracled portable-pairs pipeline + recursive
    // transitive closure (the c1_entity_resolution precedent), rep =
    // min doc_id reachable, split keyed on the rep
    "c7_split_leakage_neardup" -> s"""
      WITH RECURSIVE pairs AS (
        ${DedupQueries.sqlPortablePairs}
      ), sym AS (
        SELECT a, b FROM pairs UNION SELECT b, a FROM pairs
      ), reach(node, root) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT sym.b, reach.root
        FROM reach JOIN sym ON sym.a = reach.node
      ), lab AS (
        SELECT node AS doc_id, CAST(min(root) AS BIGINT) AS cluster_rep
        FROM reach GROUP BY node)
      SELECT doc_id, cluster_rep,
        ${graft.operators.Sampling.sqlSplitExpr("cluster_rep",
          SplitWeights)} AS split
      FROM lab""",
    "c7_group_sample" -> s"""
      SELECT doc_id, lang, rank FROM (
        SELECT doc_id, lang, row_number() OVER (
          PARTITION BY lang
          ORDER BY ${graft.functions.Noise.sqlIntRank("doc_id", 11)} DESC,
                   doc_id ASC) AS rank
        FROM documents) WHERE rank <= 20""",
    "c7_epoch_shuffle" -> s"""
      SELECT doc_id,
        ${graft.operators.EpochShuffle.sqlPositionExpr("doc_id", 3, 64)}
          AS shuffle_pos
      FROM documents""",
    "c7_split_by_source" -> s"""
      WITH k AS (
        SELECT source, list_reduce(list_prepend(CAST(0 AS BIGINT),
          list_transform(range(1, len(source) + 1),
            j -> CAST(ascii(source[j:j]) AS BIGINT))),
          (a, c) -> (a * 31 + c) % 1000000007) AS kk
        FROM documents)
      SELECT source,
        ${graft.operators.Sampling.sqlSplitExpr("kk", SplitWeights,
          salt = 19)} AS split,
        CAST(count(*) AS BIGINT) AS n_docs
      FROM k GROUP BY source, split""",
    "c7_domain_reweight" -> graft.operators.DomainReweight.sqlReweight(
      s"""WITH p AS (
            SELECT source AS g,
              $sqlQualityInputs
            FROM (SELECT source, ${sqlToks("text")} AS toks
                  FROM documents)
          ), q AS (
            SELECT g,
              CAST(floor(($sqlQualityExpr) * 1e6 + 0.5e0) AS BIGINT) AS qm
            FROM p)
          SELECT g, 1000000 - (sum(qm) // count(*)) AS loss
          FROM q GROUP BY g""",
      rounds = 5),
    "c7_doremi_mixture" -> {
      val rwSql = graft.operators.DomainReweight.sqlReweight(
        s"""WITH p AS (
              SELECT source AS g,
                $sqlQualityInputs
              FROM (SELECT source, ${sqlToks("text")} AS toks
                    FROM documents)
            ), q AS (
              SELECT g,
                CAST(floor(($sqlQualityExpr) * 1e6 + 0.5e0) AS BIGINT) AS qm
              FROM p)
            SELECT g, 1000000 - (sum(qm) // count(*)) AS loss
            FROM q GROUP BY g""",
        rounds = 5)
      s"""
      WITH rw AS MATERIALIZED ($rwSql),
      __c AS (
        SELECT source, CAST(count(*) AS DOUBLE) AS __cnt,
          max(rw.weight) AS __w
        FROM documents JOIN rw ON documents.source = rw.g
        GROUP BY source
      ), __b AS (SELECT min(__cnt / __w) AS __budget FROM __c),
      __r AS (
        SELECT source, least(1.0e0, __budget * __w / __cnt) AS __rate
        FROM __c, __b)
      SELECT doc_id, source, lang, n_chars, round(__rate, 6) AS rate
      FROM documents JOIN __r USING (source)
      WHERE ${graft.functions.Noise.sqlNoise("doc_id", 11)} < __rate"""
    },
    "c7_gopher_rules" -> graft.text.GopherRules.sqlReport(
      """SELECT doc_id AS id,
           text
           || (CASE WHEN doc_id % 4 = 0 THEN chr(10) || '- bullet one'
                 || chr(10) || '- bullet two' || chr(10)
                 || '* bullet three' ELSE '' END)
           || (CASE WHEN doc_id % 5 = 0 THEN chr(10)
                 || 'trailing thought...' || chr(10) || 'and more...'
                 ELSE '' END)
           || (CASE WHEN doc_id % 7 = 0 THEN ' ### ## ...' ELSE '' END)
           AS text
         FROM documents""",
      idOut = "doc_id", minWords = 20L),
    "c7_curation_v4" -> s"""$v4SqlChain,
      spl AS MATERIALIZED (${graft.operators.Sampling.sqlSplitLeakageSafe(
        "SELECT doc_id, final_text AS text FROM mx", "doc_id",
        SplitWeights)}),
      pk AS (SELECT m.doc_id,
          CAST(len(${sqlToks("m.final_text")}) AS BIGINT) AS n_tokens
        FROM mx m JOIN spl ON m.doc_id = spl.doc_id
        WHERE spl.split = 'train'),
      pack AS MATERIALIZED (SELECT doc_id, n_tokens,
          CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS start_off
        FROM pk WHERE n_tokens > 0)
      SELECT mx.doc_id, mx.source, spl.cluster_rep, spl.split, mx.rate,
        pack.n_tokens, pack.start_off,
        pack.start_off // 256 AS seq_first,
        (pack.start_off + pack.n_tokens - 1) // 256 AS seq_last,
        (pack.start_off + pack.n_tokens - 1) // 256
          - pack.start_off // 256 + 1 AS n_seqs,
        md5(mx.final_text) AS clean_md5
      FROM mx JOIN spl ON mx.doc_id = spl.doc_id
      LEFT JOIN pack ON mx.doc_id = pack.doc_id""",
    "c7_curation_v4_funnel" -> graft.operators.CurationFunnel.sqlReport(
      s"""($v4SqlChain
        SELECT tr.doc_id,
          (ct.doc_id IS NOT NULL) AS g1,
          sc.contamination <= 0.2e0 AS g2,
          qq.quality >= 0.5e0 AS g3,
          (bp.doc_id IS NOT NULL) AS g4,
          (mx.doc_id IS NOT NULL) AS g5
        FROM (SELECT doc_id FROM documents WHERE doc_id >= 100) tr
        LEFT JOIN ct ON tr.doc_id = ct.doc_id
        LEFT JOIN sc ON tr.doc_id = sc.doc_id
        LEFT JOIN qq ON tr.doc_id = qq.doc_id
        LEFT JOIN bp ON tr.doc_id = bp.doc_id
        LEFT JOIN mx ON tr.doc_id = mx.doc_id)""",
      Seq("substring_dedup" -> "g1", "decontam" -> "g2",
        "quality" -> "g3", "boilerplate" -> "g4", "mixture" -> "g5")),
    "c7_curation_v3" -> s"""
      WITH tr AS (
        SELECT doc_id, ${sqlToks("text")} AS toks FROM documents
        WHERE doc_id >= 100
      ), s AS (
        SELECT doc_id, CAST(u.i AS BIGINT) AS span_idx,
          array_to_string(toks[u.i*8+1 : least(u.i*8+8, len(toks))], ' ') AS span
        FROM tr, LATERAL unnest(range(0,
          CASE WHEN len(toks) = 0 THEN 0
               ELSE 1 + (greatest(len(toks) - 8, 0) + 7) // 8 END)) AS u(i)
      ), k AS (
        SELECT doc_id, span_idx, span FROM (
          SELECT doc_id, span_idx, span, row_number()
            OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn
          FROM s) WHERE rn = 1
      ), cl AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
          string_agg(span, ' ' ORDER BY span_idx) AS clean_text
        FROM k GROUP BY doc_id
      ), evt AS (
        SELECT ${sqlToks("text")} AS toks FROM documents WHERE doc_id < 100
      ), ev AS (
        SELECT DISTINCT sh FROM (
          SELECT unnest(${sqlShingles("toks", 8)}) AS sh FROM evt)
        WHERE len(sh) > 0
      ), ct AS (
        SELECT doc_id, n_kept, clean_text,
          ${sqlToks("clean_text")} AS toks FROM cl
      ), dg AS (
        SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id, unnest(${sqlShingles("toks", 8)}) AS sh FROM ct)
        WHERE len(sh) > 0
      ), sc AS (
        SELECT doc_id,
          round(CAST(sum(CASE WHEN sh IN (SELECT sh FROM ev) THEN 1 ELSE 0 END)
            AS DOUBLE) / count(*), 6) AS contamination
        FROM dg GROUP BY doc_id
      ), q0 AS (
        SELECT ct.doc_id, ct.n_kept, ct.clean_text, ct.toks
        FROM ct JOIN sc ON ct.doc_id = sc.doc_id
        WHERE sc.contamination <= 0.2e0
      ), p AS (
        SELECT doc_id, n_kept, clean_text,
          $sqlQualityInputs
        FROM q0
      ), q AS (
        SELECT doc_id, n_kept, clean_text,
          $sqlQualityExpr AS quality
        FROM p
      ), f AS (
        SELECT q.doc_id, d.source, q.quality, q.n_kept, q.clean_text
        FROM q JOIN documents d ON q.doc_id = d.doc_id
        WHERE q.quality >= 0.5e0
      ), r AS (
        SELECT doc_id, source, quality, n_kept, clean_text,
          CAST(row_number() OVER (PARTITION BY source
            ORDER BY quality DESC, doc_id) AS BIGINT) AS rank
        FROM f)
      SELECT doc_id, source, quality, n_kept, rank, md5(clean_text) AS clean_md5
      FROM r WHERE rank <= 15""",
    "c7_html_strip" -> {
      val htmlExpr =
        """'<html><head><title>t</title><style>p {color: red}</style>""" +
        """</head><body><!-- id ' || CAST(doc_id AS VARCHAR) || """ +
        """' --><h1>Q&amp;A</h1><p class="main">' || text || """ +
        """'</p><script type="text/javascript">var x = 1;""" +
        """</script></body></html>'"""
      s"""
      WITH c AS (
        SELECT doc_id,
          ${graft.text.HtmlStrip.sqlStrip(htmlExpr)} AS clean
        FROM documents)
      SELECT doc_id, md5(clean) AS clean_md5,
        CAST(length(clean) AS BIGINT) AS n_chars_clean
      FROM c"""
    },
    "c7_domain_cap" -> s"""
      WITH t AS (
        SELECT doc_id, source, ${sqlToks("text")} AS toks FROM documents
      ), p AS (
        SELECT doc_id, source,
          $sqlQualityInputs
        FROM t
      ), q AS (
        SELECT doc_id, source,
          $sqlQualityExpr AS quality
        FROM p)
      SELECT doc_id, source, quality, rank FROM (
        SELECT doc_id, source, quality,
          CAST(row_number() OVER (PARTITION BY source
            ORDER BY quality DESC, doc_id) AS BIGINT) AS rank
        FROM q)
      WHERE rank <= 25""",
    "c7_curation_pipeline" -> {
      val ratios = langs.map(l => s"${sqlRatio(l)} AS ratio_$l").mkString(",\n          ")
      val best = s"greatest(${langs.map(l => s"ratio_$l").mkString(", ")})"
      val pick = langs.map(l => s"WHEN ratio_$l = $best THEN '$l'")
        .mkString("CASE ", " ", " END")
      s"""
      WITH t AS (
        SELECT doc_id, lang, source, ${sqlToks("text")} AS toks FROM documents
      ), p AS (
        SELECT doc_id, lang, source, toks,
          $sqlQualityInputs,
          $ratios
        FROM t
      ), q AS (
        SELECT doc_id, lang, source, toks,
          $sqlQualityExpr AS quality,
          $pick AS lang_pred
        FROM p
      ), g AS (
        SELECT doc_id, lang, source, quality,
          min(doc_id) OVER (PARTITION BY
            md5(array_to_string(list_sort(list_distinct(toks)), ' '))) AS keeper
        FROM q
        WHERE quality >= 0.5e0 AND lang_pred = lang
      )
      SELECT doc_id, lang, source, quality FROM g WHERE doc_id = keeper"""
    },
    "c5_char_ngram_profile" -> """
      WITH grams AS (
        SELECT lang, unnest(CASE WHEN len(lower(text)) < 3 THEN []
          ELSE list_transform(range(0, len(lower(text)) - 2),
                 i -> lower(text)[i+1:i+3]) END) AS gram
        FROM documents
      ), counted AS (
        SELECT lang, gram, count(*) AS cnt FROM grams GROUP BY lang, gram
      ), ranked AS (
        SELECT lang, gram, cnt,
          row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, gram ASC) AS rank
        FROM counted)
      SELECT lang, gram, cnt, CAST(rank AS BIGINT) AS rank
      FROM ranked WHERE rank <= 5""",
    "c5_tfidf_exact" -> s"""
      WITH toks AS (
        SELECT doc_id, unnest(${sqlToks("text")}) AS term FROM documents
      ), pairs AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM toks GROUP BY doc_id, term
      ), dfreq AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM pairs GROUP BY term
      ), scored AS (
        SELECT p.doc_id, p.term, p.tf, d.df,
          round(CAST(p.tf AS DOUBLE) *
                ln((CAST((SELECT count(*) FROM documents) AS DOUBLE) + 1.0e0)
                   / (CAST(d.df AS DOUBLE) + 1.0e0)), 6) AS tfidf
        FROM pairs p JOIN dfreq d USING (term))
      SELECT doc_id, term, tf, df, tfidf,
        CAST(row_number() OVER (PARTITION BY doc_id
               ORDER BY tfidf DESC, term ASC) AS BIGINT) AS rank
      FROM scored QUALIFY rank <= 3""",
    "c7_unigram_logprob" -> s"""
      WITH toks AS (SELECT doc_id, unnest(${sqlToks("text")}) AS tok FROM documents),
      counts AS (SELECT tok, count(*) AS c_tok FROM toks GROUP BY tok),
      vocab AS (SELECT count(*) AS v, sum(c_tok) AS n_total FROM counts),
      scored AS (
        SELECT doc_id,
          CAST(round(-log2((CAST(c_tok AS DOUBLE) + 1.0e0)
            / (CAST(n_total AS DOUBLE) + CAST(v AS DOUBLE))), 6)
            AS DECIMAL(18,6)) AS nll
        FROM toks JOIN counts USING (tok), vocab)
      SELECT doc_id, count(*) AS n_tokens,
        CAST(sum(nll) AS DOUBLE) / count(*) AS mean_nll
      FROM scored GROUP BY doc_id""",
    "c5_doc_chunks" -> s"""
      WITH t AS (SELECT doc_id, ${sqlToks("text")} AS toks FROM documents),
      c AS (
        SELECT doc_id,
          CASE WHEN len(toks) = 0 THEN CAST([] AS VARCHAR[])
          ELSE list_transform(
            range(0, 1 + (greatest(len(toks) - 32, 0) + 23) // 24),
            c -> array_to_string(toks[c*24+1 : least(c*24+32, len(toks))], ' '))
          END AS chs
        FROM t)
      SELECT doc_id, CAST(u.i - 1 AS BIGINT) AS chunk_idx,
        CAST(len(string_split(chs[u.i], ' ')) AS BIGINT) AS n_tokens,
        md5(chs[u.i]) AS chunk_md5
      FROM c, LATERAL unnest(range(1, len(chs) + 1)) AS u(i)""",
    "c5_collocations" -> {
      val sh2 = sqlShingles("toks", 2)
      s"""
      WITH toks AS (SELECT unnest(${sqlToks("text")}) AS tok FROM documents),
      uni AS (SELECT tok, count(*) AS c_tok FROM toks GROUP BY tok),
      tot AS (SELECT count(*) AS n_uni FROM toks),
      bg AS (
        SELECT bg FROM (
          SELECT unnest($sh2) AS bg
          FROM (SELECT ${sqlToks("text")} AS toks FROM documents))
        WHERE contains(bg, ' ')
      ),
      bt AS (SELECT count(*) AS n_bi FROM bg),
      bc AS (SELECT bg, count(*) AS c_ab FROM bg GROUP BY bg
             HAVING count(*) >= 5),
      j AS (SELECT string_split(bg, ' ')[1] AS a,
                   string_split(bg, ' ')[2] AS b, c_ab FROM bc),
      p AS (
        SELECT a, b, c_ab,
          round(ln((CAST(c_ab AS DOUBLE) / n_bi) /
            ((CAST(ua.c_tok AS DOUBLE) / n_uni) *
             (CAST(ub.c_tok AS DOUBLE) / n_uni))), 6) AS pmi
        FROM j JOIN uni ua ON ua.tok = j.a
               JOIN uni ub ON ub.tok = j.b, tot, bt)
      SELECT a, b, c_ab, pmi,
        CAST(row_number() OVER (ORDER BY pmi DESC, a ASC, b ASC) AS BIGINT) AS rank
      FROM p QUALIFY rank <= 20"""
    },
    "c5_token_counts" -> s"""
      WITH t AS (SELECT source, ${sqlToks("text")} AS toks FROM documents),
      p AS (SELECT source,
        CAST(list_sum(list_transform(toks, t -> 1 + len(t) // 8)) AS BIGINT) AS bpe
      FROM t)
      SELECT source, CAST(sum(bpe) AS BIGINT) AS total_tokens,
             max(bpe) AS max_doc_tokens, count(*) AS n_docs
      FROM p GROUP BY source""",
    "c5_vocab_drift" -> graft.text.VocabDrift.sql(
      """SELECT doc_id, regexp_replace(text, '\b(spark)\b', 'sparkv2', 'g')
           AS text FROM documents WHERE doc_id >= 250""",
      "SELECT doc_id, text FROM documents WHERE doc_id < 250"),
    "c5_lang_top_tokens" -> s"""
      WITH t AS (
        SELECT lang, unnest(${sqlToks("text")}) AS token FROM documents
      ), c AS (
        SELECT lang, token, count(*) AS cnt FROM t GROUP BY lang, token
      ), r AS (
        SELECT lang AS key, token AS item, cnt,
          CAST(row_number() OVER (PARTITION BY lang
            ORDER BY cnt DESC, token ASC) AS INT) AS rank
        FROM c)
      SELECT key, item, cnt, rank FROM r WHERE rank <= 10""",
    "c5_frequent_tokens" -> s"""
      SELECT token, count(*) AS n
      FROM (SELECT unnest(${sqlToks("text")}) AS token FROM documents)
      GROUP BY token ORDER BY n DESC, token ASC LIMIT 50""",
    "c5_heavy_hitter_shingles" -> s"""
      WITH t AS (SELECT ${sqlToks("text")} AS toks FROM documents)
      SELECT shingle, count(*) AS n
      FROM (SELECT unnest(${sqlShingles("toks", 3)}) AS shingle FROM t)
      GROUP BY shingle ORDER BY n DESC, shingle ASC LIMIT 30""",
    "c7_stratified_sample" -> s"""
      SELECT doc_id, lang, source, n_chars FROM documents
      WHERE ${graft.operators.Sampling.sqlPredicate("doc_id", "lang",
        SampleFractions, defaultFraction = 0.1)}""",
    // Naive one-window cumsum — the point of the oracle split: the
    // Spark side runs the scalable two-level block scan, DuckDB the
    // textbook window, and the offsets must agree exactly.
    "c5_sequence_packing" -> s"""
      WITH t AS (
        SELECT doc_id, len(${sqlToks("text")}) AS wc FROM documents
      ), o AS (
        SELECT doc_id, wc,
          COALESCE(sum(wc) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        FROM t WHERE wc > 0)
      SELECT doc_id, CAST(wc AS BIGINT) AS n_tokens,
        CAST(off AS BIGINT) AS start_off,
        CAST(off // 256 AS BIGINT) AS seq_first,
        CAST((off + wc - 1) // 256 AS BIGINT) AS seq_last,
        CAST((off + wc - 1) // 256 - off // 256 + 1 AS BIGINT) AS n_seqs
      FROM o""",
    "c7_domain_mixture" -> graft.operators.Sampling.sqlMixture(
      "documents", "doc_id", "source", MixtureWeights,
      extraCols = Seq("lang", "n_chars")),
    "c7_temperature_mixture" -> graft.operators.Sampling.sqlTemperatureMixture(
      "documents", "doc_id", "lang", extraCols = Seq("source", "n_chars")),
    "c7_pii_redact" -> {
      import graft.text.Redact
      s"""
      WITH t AS (
        SELECT doc_id,
          CASE WHEN doc_id % 3 = 0
            THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                 || '@example.com now'
            ELSE text END AS t1
        FROM documents
      ), p AS (
        SELECT doc_id,
          CASE WHEN doc_id % 5 = 0
            THEN t1 || ' host 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                 || '.7 up'
            ELSE t1 END AS txt
        FROM t)
      SELECT doc_id,
        ${Redact.sqlCount("txt", Redact.EmailPattern)} AS n_emails,
        ${Redact.sqlCount("txt", Redact.Ipv4Pattern)} AS n_ips,
        md5(${Redact.sqlRedact("txt")}) AS clean_md5
      FROM p"""
    },
    "c5_topk_per_lang" -> s"""
      WITH toks AS (
        SELECT lang, unnest(${sqlToks("text")}) AS token FROM documents
      ), counted AS (
        SELECT lang, token, count(*) AS n FROM toks GROUP BY lang, token
      ), ranked AS (
        SELECT lang, token, n,
          row_number() OVER (PARTITION BY lang ORDER BY n DESC, token ASC) AS r
        FROM counted)
      SELECT lang, token, n FROM ranked WHERE r <= 10""",
    "c7_bigram_logprob" -> {
      val sh2 = sqlShingles("toks", 2)
      s"""
      WITH td AS (SELECT doc_id, ${sqlToks("text")} AS toks FROM documents),
      bi AS (
        SELECT doc_id, bg FROM (
          SELECT doc_id, unnest($sh2) AS bg FROM td)
        WHERE contains(bg, ' ')
      ),
      bc AS (SELECT bg, count(*) AS c_bg FROM bi GROUP BY bg),
      uni AS (SELECT tok, count(*) AS c_tok FROM
        (SELECT unnest(${sqlToks("text")}) AS tok FROM documents) GROUP BY tok),
      vocab AS (SELECT count(*) AS v FROM uni),
      scored AS (
        SELECT doc_id,
          CAST(round(-log2((CAST(c_bg AS DOUBLE) + 1.0e0)
            / (CAST(c_tok AS DOUBLE) + CAST(v AS DOUBLE))), 6)
            AS DECIMAL(18,6)) AS nll
        FROM bi JOIN bc USING (bg)
          JOIN uni ON uni.tok = string_split(bi.bg, ' ')[1], vocab)
      SELECT doc_id, count(*) AS n_bigrams,
        CAST(sum(nll) AS DOUBLE) / count(*) AS mean_nll
      FROM scored GROUP BY doc_id"""
    },
    "c7_budget_select" -> s"""
      WITH t0 AS (
        SELECT doc_id, ${sqlToks("text")} AS toks FROM documents
      ), t AS (
        SELECT doc_id,
          round(least(CAST(len(toks) AS DOUBLE) / 50.0e0, 1.0e0)
                * (CASE WHEN CAST(len(toks) AS DOUBLE) > 2000 THEN 0.5e0 ELSE 1.0e0 END) * 0.4e0
              + (CASE WHEN len(toks) = 0 THEN 0.0e0
                 ELSE CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END) * 0.4e0
              + (CASE WHEN (CASE WHEN len(toks) = 0 THEN 0.0e0
                            ELSE CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE)
                                 / CAST(len(toks) AS DOUBLE) END) BETWEEN 3 AND 10
                 THEN 1.0e0 ELSE 0.5e0 END) * 0.2e0, 6) AS quality,
          CAST(len(toks) AS BIGINT) AS n_tokens
        FROM t0
      ), o AS (
        SELECT doc_id, quality, n_tokens,
          COALESCE(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        FROM t)
      SELECT doc_id, quality, n_tokens, CAST(off AS BIGINT) AS start_off
      FROM o WHERE off + n_tokens <= 15000""",
    "c7_curation_v2" -> {
      import graft.text.Redact
      s"""
      WITH t0 AS (
        SELECT doc_id, text, ${sqlToks("text")} AS toks FROM documents
      ), g AS (
        SELECT doc_id, text,
          round(least(CAST(len(toks) AS DOUBLE) / 50.0e0, 1.0e0)
                * (CASE WHEN CAST(len(toks) AS DOUBLE) > 2000 THEN 0.5e0 ELSE 1.0e0 END) * 0.4e0
              + (CASE WHEN len(toks) = 0 THEN 0.0e0
                 ELSE CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END) * 0.4e0
              + (CASE WHEN (CASE WHEN len(toks) = 0 THEN 0.0e0
                            ELSE CAST(list_sum(list_transform(toks, t -> len(t))) AS DOUBLE)
                                 / CAST(len(toks) AS DOUBLE) END) BETWEEN 3 AND 10
                 THEN 1.0e0 ELSE 0.5e0 END) * 0.2e0, 6) AS quality,
          CASE WHEN len(toks) = 0 THEN 0.0e0
               ELSE CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) END AS dr,
          CAST(len(toks) AS BIGINT) AS n_tokens
        FROM t0
      ), f AS (
        SELECT doc_id, text, quality, n_tokens FROM g
        WHERE quality >= 0.5e0 AND dr >= 0.1e0
      ), o AS (
        SELECT doc_id, text, quality, n_tokens,
          COALESCE(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id ASC
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
        FROM f)
      SELECT doc_id, quality, n_tokens, CAST(off AS BIGINT) AS start_off,
        md5(${Redact.sqlRedact("text")}) AS clean_md5
      FROM o WHERE off + n_tokens <= 10000"""
    },
    "c7_repetition_stats" -> s"""
      WITH toks AS (
        SELECT doc_id, unnest(${sqlToks("text")}) AS t FROM documents
      ), tc AS (
        SELECT doc_id, t, count(*) AS c FROM toks GROUP BY doc_id, t
      ), ta AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
          count(*) AS n_dist, max(c) AS top_c
        FROM tc GROUP BY doc_id
      ), td AS (
        SELECT doc_id, ${sqlToks("text")} AS toks FROM documents
      ), tg AS (
        SELECT doc_id, unnest(${sqlShingles("toks", 3)}) AS g FROM td
      ), gc AS (
        SELECT doc_id, g, count(*) AS c FROM tg GROUP BY doc_id, g
      ), ga AS (
        SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tri,
          count(*) AS n_tri_dist
        FROM gc GROUP BY doc_id)
      SELECT ta.doc_id, ta.n_tokens,
        round(1.0e0 - CAST(n_dist AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
          AS dup_token_frac,
        round(1.0e0 - CAST(n_tri_dist AS DOUBLE) / CAST(n_tri AS DOUBLE), 6)
          AS dup_trigram_frac,
        round(CAST(top_c AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
          AS top_token_frac
      FROM ta JOIN ga USING (doc_id)""",
  )
}
