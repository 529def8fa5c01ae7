package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT-SUBSTRING DEDUPLICATION — the published exact form of
  * training-set dedup (Lee et al. 2022, "Deduplicating Training Data
  * Makes Language Models Better"): any token run of length ≥ `n`
  * shared with an EARLIER position in the corpus is excised from the
  * later document, keeping exactly one copy of every long-enough
  * repeated substring. This is the form the approximate span family
  * misses: [[SpanDedup]]'s NON-OVERLAPPING windows only catch runs
  * that happen to align with its fixed span grid — shift the shared
  * paragraph by one token and every span straddles unique text, so
  * nothing matches (the planted c1_exact_substring fixture pins
  * exactly this miss). The windowed exact form is alignment-free:
  * every length-`n` window (stride 1) is a key, and a shared run of
  * length L ≥ n is covered by its L−n+1 overlapping duplicated
  * windows, whose union excises the whole run.
  *
  * EXACT by construction: windows are keyed by their TOKEN TEXT, not
  * a hash — first-occurrence resolution is a hash AGGREGATE on the
  * window string (min struct(doc_id, pos), the skew-safe
  * first-occurrence shape shared with [[SpanDedup]]: a boilerplate
  * window repeated a million times collapses map-side, never pins a
  * window task). The published suffix-array formulation needs a
  * global sorted order Spark can't shard cheaply; the windowed
  * equivalent is three hash shuffles:
  *
  *   1. window explode (stride-1 [[graft.expressions.Shingles]], one
  *      native pass per doc — corpus tokens × 1 rows),
  *   2. first-occurrence agg + re-join on the window key,
  *   3. duplicated windows → covered positions (an `n`× explode of
  *      DUPLICATED windows only, not the corpus) → anti-join against
  *      the exploded tokens, per-doc bounded reassembly.
  *
  * Docs shorter than `n` tokens carry no windows and pass through
  * unchanged; docs whose every token is covered drop out (the
  * empty-doc filter, as [[SpanDedup]]).
  */
object ExactSubstring {

  /** One row per surviving doc: `doc_id, n_tokens, n_kept,
    * clean_text` (surviving tokens re-joined in order). */
  def dedupSubstrings(docs: DataFrame, idCol: String, textCol: String,
                      n: Int = 8): DataFrame = {
    require(n >= 2, "window length n must be >= 2")
    val toks = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("toks"))
      .localCheckpoint()
    val tok = toks.select(col("doc_id"),
        posexplode(col("toks")).as(Seq("tpos", "tok")))
      .select(col("doc_id"), col("tpos").cast("bigint").as("tpos"),
        col("tok"))
    // docs with < n tokens carry NO windows (Shingles emits one
    // partial all-tokens shingle for them — not a length-n key)
    val wins = toks.filter(size(col("toks")) >= n)
      .select(col("doc_id"),
        posexplode(TextFunctions.shingles(
          array_join(col("toks"), " "), n)).as(Seq("wpos", "w")))
      .select(col("doc_id"), col("wpos").cast("bigint").as("wpos"),
        col("w"))
    val first = wins.groupBy(col("w"))
      .agg(min(struct(col("doc_id"), col("wpos"))).as("__first"))
    // duplicated occurrences (every occurrence that is not the global
    // first) → the n token positions each covers, distinct
    val covered = wins.join(first, "w")
      .filter(!(col("doc_id") === col("__first.doc_id") &&
        col("wpos") === col("__first.wpos")))
      .select(col("doc_id"),
        explode(sequence(col("wpos"), col("wpos") + lit(n - 1)))
          .as("tpos"))
      .distinct()
    val kept = tok.join(covered, Seq("doc_id", "tpos"), "left_anti")
    val totals = toks.select(col("doc_id"),
      size(col("toks")).cast("bigint").as("n_tokens"))
    kept.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("tpos"), col("tok")))),
          s => s.getField("tok")), " ").as("clean_text"))
      .join(totals, "doc_id")
      .select(col("doc_id"), col("n_tokens"), col("n_kept"),
        col("clean_text"))
  }

  /** DuckDB twin of [[dedupSubstrings]]: `docsSql` must select
    * `(doc_id, text)`. First occurrence resolves by row_number over
    * (doc_id, wpos) — equivalent to the Spark min-struct (the pair is
    * unique, so no ties). */
  def sqlDedupSubstrings(docsSql: String, n: Int): String = s"""
    WITH t AS (
      SELECT doc_id,
        list_filter(string_split_regex(lower(text), '\\s+'),
          x -> len(x) > 0) AS toks
      FROM ($docsSql)
    ), tok AS (
      SELECT doc_id, CAST(s.i - 1 AS BIGINT) AS tpos, toks[s.i] AS tok
      FROM t, LATERAL unnest(generate_series(1, len(toks))) s(i)
    ), win AS (
      SELECT doc_id, CAST(s.i AS BIGINT) AS wpos,
        array_to_string(toks[s.i + 1 : s.i + $n], ' ') AS w
      FROM t, LATERAL unnest(generate_series(0, len(toks) - $n)) s(i)
      WHERE len(toks) >= $n
    ), dup AS (
      SELECT doc_id, wpos FROM (
        SELECT doc_id, wpos, row_number()
          OVER (PARTITION BY w ORDER BY doc_id, wpos) AS rn
        FROM win) WHERE rn > 1
    ), covered AS (
      SELECT DISTINCT doc_id, wpos + s.i AS tpos
      FROM dup, LATERAL unnest(generate_series(0, ${n - 1})) s(i)
    ), kept AS (
      SELECT tok.doc_id, tok.tpos, tok.tok
      FROM tok ANTI JOIN covered
        ON tok.doc_id = covered.doc_id AND tok.tpos = covered.tpos
    ), tot AS (
      SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens FROM t)
    SELECT k.doc_id, tot.n_tokens, CAST(count(*) AS BIGINT) AS n_kept,
      string_agg(k.tok, ' ' ORDER BY k.tpos) AS clean_text
    FROM kept k JOIN tot ON k.doc_id = tot.doc_id
    GROUP BY k.doc_id, tot.n_tokens"""
}
