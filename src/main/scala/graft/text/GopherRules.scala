package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GOPHER QUALITY RULES — the published heuristic gate set (Rae et
  * al. 2021, Appendix A1.1; reused by MassiveText descendants), as
  * exact per-document signals next to the composite
  * [[TextFunctions.qualityScore]]: where the composite RANKS, these
  * rules are the published HARD GATES a crawl document must clear
  * before ranking even matters. Implemented rules:
  *
  *   1. word count in [minWords, maxWords]        (50 … 100 000)
  *   2. mean word length in [3, 10]
  *   3. symbol-to-word ratio (# and … marks) ≤ 0.1
  *   4. bullet-started lines ≤ 90 %
  *   5. ellipsis-ended lines ≤ 30 %
  *   6. ≥ 80 % of words contain an alphabetic character
  *   7. ≥ 2 distinct required stop words present
  *      (the/be/to/of/and/that/have/with)
  *
  * Every signal is a pure string/ratio computation (counts exact
  * BIGINT, emitted ratios on the 6-dp floor grid), so the whole gate
  * table sits under the bit-exact oracle. Scale: one narrow
  * projection fused into the scan — no joins, no aggs, no state. */
object GopherRules {

  private def r6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  private def safeRatio(num: Column, den: Column): Column =
    when(den === 0L, lit(0.0))
      .otherwise(r6(num.cast("double") / den.cast("double")))

  /** Non-overlapping occurrences of literal `sub` — split-based so
    * Spark and DuckDB count identically. */
  private def countOcc(text: Column, subRegex: String): Column =
    (size(split(text, subRegex, -1)) - 1).cast("bigint")

  val RequiredStopWords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-document rule report: the raw signals, one boolean per rule,
    * and the overall `pass`. Thresholds are the published defaults. */
  def report(docs: DataFrame, idCol: String, textCol: String,
             minWords: Long = 50L, maxWords: Long = 100000L): DataFrame = {
    val text = col(textCol)
    val toks = TextFunctions.tokens(text)
    val nWords = size(toks).cast("bigint")
    val meanWl = safeRatio(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long")),
      nWords)
    // ellipsis marks count BOTH spellings: ASCII "..." and the Unicode
    // single-char ellipsis U+2026 (Rae et al. A1.1 names "…")
    val nSymbols = countOcc(text, "#") + countOcc(text, "\\.\\.\\.") +
      countOcc(text, "…")
    val symbolRatio = safeRatio(nSymbols, nWords)
    val lines = split(text, "\n", -1)
    val nLines = size(lines).cast("bigint")
    val bulletLines = size(filter(lines, l =>
      trim(l).startsWith("-") || trim(l).startsWith("*") ||
        trim(l).startsWith("•"))).cast("bigint")
    val ellipsisLines = size(filter(lines, l =>
      rtrim(l).endsWith("...") || rtrim(l).endsWith("…")))
      .cast("bigint")
    val alphaWords = size(filter(toks, t => t.rlike("[a-z]")))
      .cast("bigint")
    val stopHits = size(array_intersect(array_distinct(toks),
      array(RequiredStopWords.map(lit): _*))).cast("bigint")
    docs.select(col(idCol),
        nWords.as("n_words"), meanWl.as("mean_word_len"),
        symbolRatio.as("symbol_ratio"),
        safeRatio(bulletLines, nLines).as("bullet_line_ratio"),
        safeRatio(ellipsisLines, nLines).as("ellipsis_line_ratio"),
        safeRatio(alphaWords, nWords).as("alpha_word_ratio"),
        stopHits.as("stop_word_hits"))
      .withColumn("r_word_count",
        col("n_words") >= minWords && col("n_words") <= maxWords)
      .withColumn("r_word_len",
        col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0)
      .withColumn("r_symbols", col("symbol_ratio") <= 0.1)
      .withColumn("r_bullets", col("bullet_line_ratio") <= 0.9)
      .withColumn("r_ellipsis", col("ellipsis_line_ratio") <= 0.3)
      .withColumn("r_alpha", col("alpha_word_ratio") >= 0.8)
      .withColumn("r_stopwords", col("stop_word_hits") >= 2L)
      .withColumn("pass",
        col("r_word_count") && col("r_word_len") && col("r_symbols") &&
          col("r_bullets") && col("r_ellipsis") && col("r_alpha") &&
          col("r_stopwords"))
  }

  /** DuckDB twin of [[report]]: identical tokenization, counting and
    * 6-dp ratio grid, term for term. `docsSql` → `(id, text)`. */
  def sqlReport(docsSql: String, idOut: String, minWords: Long = 50L,
                maxWords: Long = 100000L): String = {
    val stopList = RequiredStopWords.map(w => s"'$w'")
      .mkString("[", ", ", "]")
    s"""
    WITH d AS ($docsSql),
    t AS (
      SELECT id, text,
        list_filter(string_split_regex(lower(text), '\\s+'),
          x -> len(x) > 0) AS toks,
        string_split(text, chr(10)) AS lines
      FROM d
    ), m AS (
      SELECT id,
        CAST(len(toks) AS BIGINT) AS n_words,
        CASE WHEN len(toks) = 0 THEN 0.0e0
          ELSE floor(CAST(list_sum(list_transform(toks, x -> len(x)))
            AS DOUBLE) / CAST(len(toks) AS BIGINT) * 1e6 + 0.5e0) / 1e6
          END AS mean_word_len,
        CAST(len(string_split(text, '#')) - 1
          + len(string_split(text, '...')) - 1
          + len(string_split(text, '…')) - 1 AS BIGINT) AS n_symbols,
        CAST(len(lines) AS BIGINT) AS n_lines,
        CAST(len(list_filter(lines, l -> trim(l) LIKE '-%'
          OR trim(l) LIKE '*%' OR trim(l) LIKE '•%')) AS BIGINT)
          AS bullet_lines,
        CAST(len(list_filter(lines, l -> rtrim(l) LIKE '%...'
          OR rtrim(l) LIKE '%…')) AS BIGINT) AS ellipsis_lines,
        CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]')))
          AS BIGINT) AS alpha_words,
        CAST(len(list_intersect(list_distinct(toks), $stopList))
          AS BIGINT) AS stop_word_hits
      FROM t
    ), r AS (
      SELECT id, n_words, mean_word_len,
        CASE WHEN n_words = 0 THEN 0.0e0
          ELSE floor(CAST(n_symbols AS DOUBLE) / CAST(n_words AS DOUBLE)
            * 1e6 + 0.5e0) / 1e6 END AS symbol_ratio,
        CASE WHEN n_lines = 0 THEN 0.0e0
          ELSE floor(CAST(bullet_lines AS DOUBLE)
            / CAST(n_lines AS DOUBLE) * 1e6 + 0.5e0) / 1e6
          END AS bullet_line_ratio,
        CASE WHEN n_lines = 0 THEN 0.0e0
          ELSE floor(CAST(ellipsis_lines AS DOUBLE)
            / CAST(n_lines AS DOUBLE) * 1e6 + 0.5e0) / 1e6
          END AS ellipsis_line_ratio,
        CASE WHEN n_words = 0 THEN 0.0e0
          ELSE floor(CAST(alpha_words AS DOUBLE)
            / CAST(n_words AS DOUBLE) * 1e6 + 0.5e0) / 1e6
          END AS alpha_word_ratio,
        stop_word_hits
      FROM m)
    SELECT id AS $idOut, n_words, mean_word_len, symbol_ratio,
      bullet_line_ratio, ellipsis_line_ratio, alpha_word_ratio,
      stop_word_hits,
      (n_words >= $minWords AND n_words <= $maxWords) AS r_word_count,
      (mean_word_len >= 3.0e0 AND mean_word_len <= 10.0e0) AS r_word_len,
      (symbol_ratio <= 0.1e0) AS r_symbols,
      (bullet_line_ratio <= 0.9e0) AS r_bullets,
      (ellipsis_line_ratio <= 0.3e0) AS r_ellipsis,
      (alpha_word_ratio >= 0.8e0) AS r_alpha,
      (stop_word_hits >= 2) AS r_stopwords,
      (n_words >= $minWords AND n_words <= $maxWords
        AND mean_word_len >= 3.0e0 AND mean_word_len <= 10.0e0
        AND symbol_ratio <= 0.1e0 AND bullet_line_ratio <= 0.9e0
        AND ellipsis_line_ratio <= 0.3e0 AND alpha_word_ratio >= 0.8e0
        AND stop_word_hits >= 2) AS pass
    FROM r"""
  }
}
