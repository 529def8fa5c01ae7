package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FREQUENCY-BASED BOILERPLATE REMOVAL — the RefinedWeb/CCNet line-
  * dedup step generalized to token spans: a span that appears in many
  * DIFFERENT documents of the same group (site headers, nav bars,
  * cookie banners, license footers keyed by `groupCol` = domain/
  * source) is boilerplate and is stripped from EVERY document —
  * unlike [[SpanDedup]] (first-occurrence-wins: one copy survives)
  * and [[ExactSubstring]] (first copy survives), boilerplate keeps NO
  * copy: the span is template chrome, not content.
  *
  * Span split is [[SpanDedup]]'s non-overlapping `spanTokens` window
  * ([[TextFunctions.chunks]]); the document-frequency aggregate
  * counts DISTINCT docs per (group, span) — a span repeated inside
  * one doc doesn't inflate df. Spans with df ≥ `minDf` are stripped;
  * docs reassemble from surviving spans in order; fully-boilerplate
  * docs drop (the empty-doc filter).
  *
  * Scale shape: the span frame feeds one (group, span)-keyed hash agg
  * (count distinct docs = two-level agg, partial map-side) and one
  * equi-join back — the skew-safe SpanDedup recipe; reassembly sorts
  * within one doc's spans only. Fully deterministic → exact oracle. */
object Boilerplate {

  /** One row per surviving doc: `doc_id, n_spans, n_kept,
    * clean_text`. */
  def stripFrequentSpans(docs: DataFrame, idCol: String, textCol: String,
                         groupCol: String, spanTokens: Int = 8,
                         minDf: Int = 3): DataFrame = {
    require(spanTokens >= 1 && minDf >= 2)
    val spans = docs.select(col(idCol).as("doc_id"),
        col(groupCol).as("__g"),
        posexplode(TextFunctions.chunks(
          TextFunctions.tokens(col(textCol)), spanTokens, spanTokens)))
      .toDF("doc_id", "__g", "span_idx", "span")
      .localCheckpoint()
    val totals = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"))
    val boiler = spans.select(col("__g"), col("span"), col("doc_id"))
      .distinct()
      .groupBy(col("__g"), col("span"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDf)
      .select(col("__g"), col("span"))
    val kept = spans.join(boiler, Seq("__g", "span"), "left_anti")
    kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("span_idx"), col("span")))),
          s => s.getField("span")), " ").as("clean_text"))
      .join(totals, "doc_id")
      .select(col("doc_id"), col("n_spans"), col("n_kept"),
        col("clean_text"))
  }

  /** DuckDB twin: `docsSql` must select `(doc_id, g, text)`. */
  def sqlStripFrequentSpans(docsSql: String, spanTokens: Int,
                            minDf: Int): String = s"""
    WITH t AS (
      SELECT doc_id, g,
        list_filter(string_split_regex(lower(text), '\\s+'),
          x -> len(x) > 0) AS toks
      FROM ($docsSql)
    ), s AS (
      SELECT doc_id, g, CAST(u.i AS BIGINT) AS span_idx,
        array_to_string(
          toks[u.i * $spanTokens + 1 :
               least(u.i * $spanTokens + $spanTokens, len(toks))],
          ' ') AS span
      FROM t, LATERAL unnest(range(0,
        CASE WHEN len(toks) = 0 THEN 0
             ELSE 1 + (greatest(len(toks) - $spanTokens, 0)
                       + ${spanTokens - 1}) // $spanTokens END)) AS u(i)
    ), boiler AS (
      SELECT g, span FROM (
        SELECT g, span, count(DISTINCT doc_id) AS df
        FROM s GROUP BY g, span)
      WHERE df >= $minDf
    ), kept AS (
      SELECT s.doc_id, s.span_idx, s.span
      FROM s ANTI JOIN boiler
        ON s.g = boiler.g AND s.span = boiler.span
    ), tot AS (
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans
      FROM s GROUP BY doc_id)
    SELECT k.doc_id, tot.n_spans, CAST(count(*) AS BIGINT) AS n_kept,
      string_agg(k.span, ' ' ORDER BY k.span_idx) AS clean_text
    FROM kept k JOIN tot ON k.doc_id = tot.doc_id
    GROUP BY k.doc_id, tot.n_spans"""
}
