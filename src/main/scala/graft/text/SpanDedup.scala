package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sub-document (span-level) exact deduplication — the C4/RefinedWeb
  * "remove repeated spans" curation step: documents are split into
  * consecutive `spanTokens`-token spans (non-overlapping windows, the
  * flat-token analogue of C4's three-sentence spans), every span that
  * already occurred EARLIER in the corpus — smaller (doc_id, span_idx)
  * — is removed, and each document is reassembled from its surviving
  * spans in order. Documents whose every span occurred elsewhere drop
  * out entirely (the empty-doc filter that follows span dedup in real
  * pipelines, folded in).
  *
  * Scale shape: first-occurrence-per-span is a hash AGGREGATE
  * (min struct(doc_id, span_idx) keyed by span text) + re-join — the
  * same skew-safe shape as keptBatch/c7_curation_pipeline: a
  * boilerplate span repeated a million times collapses map-side
  * instead of pinning a window task. Reassembly sorts WITHIN one doc's
  * spans only (array_sort over a collected per-doc list, bounded by
  * doc length — never a corpus-wide window). The span frame feeds the
  * agg, the probe join, and the per-doc totals, so it is materialized
  * once. Fully deterministic → exact DuckDB oracle (c1_span_dedup).
  */
object SpanDedup {

  /** One row per surviving doc: doc_id, n_spans (before), n_kept,
    * clean_text (surviving spans re-joined in order). */
  def dedupSpans(docs: DataFrame, idCol: String, textCol: String,
                 spanTokens: Int = 8): DataFrame = {
    require(spanTokens >= 1)
    val spans = docs.select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.chunks(
          TextFunctions.tokens(col(textCol)), spanTokens, spanTokens)))
      .toDF("doc_id", "span_idx", "span")
      .localCheckpoint()
    val totals = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"))
    val first = spans.groupBy(col("span"))
      .agg(min(struct(col("doc_id"), col("span_idx"))).as("__first"))
    val kept = spans.join(first, "span")
      .filter(col("doc_id") === col("__first.doc_id") &&
        col("span_idx") === col("__first.span_idx"))
    kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("span_idx"), col("span")))),
          s => s.getField("span")), " ").as("clean_text"))
      .join(totals, "doc_id")
      .select(col("doc_id"), col("n_spans"), col("n_kept"), col("clean_text"))
  }
}
