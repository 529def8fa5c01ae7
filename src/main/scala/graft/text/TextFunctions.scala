package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for the LLM-data-pipeline surface
  * (BASELINE.json north star): tokenization, counting, quality
  * heuristics, language scoring, fingerprints. Everything here is a
  * composition of built-in codegen'd functions — no UDFs — so the ops
  * inline into whole-stage codegen and scale with the scan.
  */
object TextFunctions {

  /** Whitespace tokenization of lowercased text (empty tokens dropped). */
  def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** BPE-ish subword count approximation: whitespace tokens plus an
    * extra unit per 8 chars of long tokens — a deterministic stand-in
    * for a real tokenizer's length scaling. */
  def approxBpeCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + lit(1L) + floor(length(t) / lit(8.0)).cast("long"))

  def wordCount(text: Column): Column = size(tokens(text)).cast("bigint")

  def charCount(text: Column): Column = length(text).cast("bigint")

  def avgWordLength(text: Column): Column = {
    val toks = tokens(text)
    val totalLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))
    when(size(toks) === 0, lit(0.0))
      .otherwise(totalLen.cast("double") / size(toks).cast("double"))
  }

  /** Fraction of distinct tokens — low values flag boilerplate/spam. */
  def distinctTokenRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0))
      .otherwise(size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
  }

  /** Tiny built-in stopword lexicons per language. Real pipelines load
    * bigger dictionaries; the operator shape (broadcast lexicon,
    * array_intersect ratio) is what matters at scale. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "for", "on"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "es", "por", "los"),
    "fr" -> Seq("le", "la", "de", "et", "que", "en", "un", "est", "pour", "les"),
    "de" -> Seq("der", "die", "das", "und", "zu", "in", "ist", "es", "den", "von"))

  /** Fraction of tokens that are stopwords of `lang`. */
  def stopwordRatio(text: Column, lang: String): Column = {
    val toks = tokens(text)
    val hits = size(filter(toks, t =>
      array_contains(array(stopwords(lang).map(lit): _*), t)))
    when(size(toks) === 0, lit(0.0))
      .otherwise(hits.cast("double") / size(toks).cast("double"))
  }

  /** n-gram heuristic language ID: argmax of stopword ratio across the
    * built-in lexicons; ties resolve in lexicon-name order. */
  def langId(text: Column): Column = {
    val langs = stopwords.keys.toSeq.sorted
    val scores = langs.map(l => stopwordRatio(text, l))
    val best = greatest(scores: _*)
    langs.zip(scores).tail.foldLeft(
      when(scores.head === best, lit(langs.head))) {
      case (acc, (l, sc)) => acc.when(sc === best, lit(l))
    }
  }

  /** Composite quality score in [0,1]: doc-length band, token
    * diversity, mean word length band. Deterministic arithmetic —
    * served by the native one-pass [[graft.expressions.QualityScore]]
    * expression (the built-in composition ran FOUR lambda/array
    * passes over the token array per row; the round-10k probe
    * measured the c7 family paying a 5.4× interpreted-lambda constant
    * on exactly this scan). Bit-identical semantics asserted against
    * the composition in QualityScoreSpec; [[qualityScoreComposed]]
    * keeps the reference formula. */
  def qualityScore(text: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.QualityScore(
        org.apache.spark.sql.GraftColumnBridge.expression(text)))

  /** The original built-in composition of [[qualityScore]] — retained
    * as the executable reference the native expression is spec-pinned
    * against (and the term-for-term twin of the oracle SQL fragment in
    * `TextQueries.sqlQualityExpr`). Not used on any hot path. */
  def qualityScoreComposed(text: Column): Column = {
    val wc = wordCount(text).cast("double")
    val lenScore = least(wc / lit(50.0), lit(1.0)) *
      when(wc > 2000, lit(0.5)).otherwise(lit(1.0))
    val diversity = distinctTokenRatio(text)
    val awl = avgWordLength(text)
    val wlScore = when(awl >= 3 && awl <= 10, lit(1.0)).otherwise(lit(0.5))
    round((lenScore * lit(0.4) + diversity * lit(0.4) + wlScore * lit(0.2)), 6)
  }

  /** Exact content fingerprint: md5 of whitespace-normalized lowercase
    * text — identical in DuckDB, the backbone of exact dedup (C1). */
  def contentFingerprint(text: Column): Column =
    md5(concat_ws(" ", tokens(text)))

  /** Token-window chunks for context-window packing: windows of
    * `chunkTokens` tokens starting every `strideTokens` tokens
    * (overlap = chunk − stride), space-joined; the final window is
    * shorter when the doc does not divide evenly, so every token lands
    * in at least one chunk when stride ≤ chunk. Empty docs yield no
    * chunks.
    *
    * `toks` MUST be a materialized token-array COLUMN (not an
    * expression) — an in-lambda tokenization subtree re-evaluates per
    * chunk (the lambda-CSE trap); against an attribute the per-chunk
    * cost is one bounded slice. The window count is pure integer
    * arithmetic (`1 + ceil(max(k−chunk,0)/stride)`) so the DuckDB
    * oracle mirrors it exactly. */
  def chunks(toks: Column, chunkTokens: Int, strideTokens: Int): Column = {
    require(chunkTokens >= 1 && strideTokens >= 1,
      "chunkTokens and strideTokens must be >= 1")
    val k = size(toks)
    val nChunks = (lit(1) +
      ((greatest(k - chunkTokens, lit(0)) + (strideTokens - 1)) /
        strideTokens).cast("int"))
    when(k === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1), c =>
        concat_ws(" ", slice(toks, c * strideTokens + lit(1),
          least(lit(chunkTokens), k - c * strideTokens)))))
  }

  /** All character n-grams (code-point windows) — the language-profile
    * primitive, as the native one-pass [[graft.expressions.CharNgrams]]
    * expression (the per-position `substring` composition re-seeks the
    * UTF8String from the start per gram — O(len²) per doc). Callers
    * lowercase/normalize first if needed. */
  def charNgrams(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.CharNgrams(
        org.apache.spark.sql.GraftColumnBridge.expression(text), n))

  /** Word n-gram shingles (space-joined), the MinHash / winnowing
    * input — the native one-pass [[graft.expressions.Shingles]]
    * expression. The previous built-in composition re-evaluated the
    * tokenization inside the transform lambda PER ELEMENT (no CSE
    * across lambda scopes) — O(tokens²), measured 5.8s vs 0.4s for
    * the corpus split alone; the expression tokenizes once per row.
    * Bit-identical semantics asserted in ShinglesSpec. */
  def shingles(text: Column, n: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.Shingles(
        org.apache.spark.sql.GraftColumnBridge.expression(text), n))

  /** Unicode NFC canonicalization (`stripAccents = true` additionally
    * folds diacritics) — [[graft.expressions.UnicodeNorm]]. */
  def unicodeNorm(text: Column, stripAccents: Boolean): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.UnicodeNorm(
        org.apache.spark.sql.GraftColumnBridge.expression(text),
        stripAccents))

  // ---- code-vs-prose routing ---------------------------------------
  // LLM corpora route code and prose to different filters, different
  // dedup settings and different mixture weights — a prose quality
  // gate run on code throws away the repositories, and code dedup run
  // on prose misses paraphrases. The detector is deliberately
  // heuristic (the production ones are too: symbol density + keyword
  // evidence, cheap enough for a first-pass scan) and every signal is
  // a pure string ratio, so the routing sits under the exact oracle.

  /** Share of characters from the code-symbol class `{}();=<>[]`. */
  def codeSymbolRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(
        (length(text) - length(regexp_replace(text,
          "[{}();=<>\\[\\]]", ""))).cast("double") /
          length(text).cast("double"))

  /** Occurrences of common code keywords (word-bounded). */
  def codeKeywordHits(text: Column): Column =
    regexp_count(lower(text),
      lit("\\b(def|return|import|class|function|var|const|void)\\b"))
      .cast("long")

  /** Route: code iff symbol density clears `symbolThreshold` AND at
    * least `minKeywords` keyword hits back it up (symbols alone
    * misfire on math-heavy prose; keywords alone on prose ABOUT
    * code). */
  def isCode(text: Column, symbolThreshold: Double = 0.03,
             minKeywords: Int = 2): Column =
    (codeSymbolRatio(text) > symbolThreshold &&
      codeKeywordHits(text) >= minKeywords).cast("int")
}
