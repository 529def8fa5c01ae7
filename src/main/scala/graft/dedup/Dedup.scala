package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact deduplication (C1) — the workhorse of LLM corpus cleaning.
  * Normalized-content fingerprint (md5 over whitespace-normalized
  * lowercase text) → one shuffle keyed on the fingerprint → keep the
  * smallest id per group. Linear, one shuffle, no skew issues beyond
  * AQE's reach: exactly the shape that survives 100 TB.
  */
object Dedup {

  /** Adds the content fingerprint used as the dedup key. */
  def withFingerprint(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("fingerprint", TextFunctions.contentFingerprint(col(textCol)))

  /** Order-insensitive variant: fingerprint of the SORTED distinct token
    * set — catches token-shuffled duplicates (bag-of-words dups) that
    * byte-level fingerprints miss. */
  def tokenSetFingerprint(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(concat_ws(" ", array_sort(array_distinct(TextFunctions.tokens(text)))))

  /** Keeps the min-id row per fingerprint expression; output schema ==
    * input schema (the internal fingerprint never leaks, and a caller's
    * own `fingerprint` column is preserved). */
  private def keepMinPer(df: DataFrame, idCol: String,
                         fp: org.apache.spark.sql.Column): DataFrame = {
    val keep = df.withColumn("__fp", fp)
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as(idCol))
      .drop("__fp")
    df.join(keep, Seq(idCol), "left_semi")
  }

  /** One row per distinct token set, keeping the smallest `idCol`. */
  def exactTokenSet(df: DataFrame, idCol: String, textCol: String): DataFrame =
    keepMinPer(df, idCol, tokenSetFingerprint(col(textCol)))

  /** One row per distinct content, keeping the smallest `idCol`. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    keepMinPer(df, idCol, TextFunctions.contentFingerprint(col(textCol)))

  /** Canonical selection: keeps the BEST row per fingerprint instead
    * of the first-seen — what a real pipeline wants when duplicate
    * copies are NOT byte-identical (token-set groups, near-dup
    * clusters): prefer the most complete / highest-quality copy.
    * Keeper = max `score`, ties broken by min id. `score` must be a
    * deterministic expression over the row (token count, source
    * priority, a quality signal).
    *
    * Same shape discipline as [[exact]]: two partial-aggregatable
    * hash aggs (fp → max score; winners → min id) plus a semi-join
    * back — never a corpus-wide window, so one viral duplicate
    * cluster cannot pin a task beyond what AQE re-splits.
    */
  def keepBest(df: DataFrame, idCol: String,
               fp: org.apache.spark.sql.Column,
               score: org.apache.spark.sql.Column): DataFrame = {
    val scored = df.withColumn("__fp", fp).withColumn("__score", score)
    val best = scored.groupBy(col("__fp"))
      .agg(max(col("__score")).as("__score"))
    val keep = scored.join(best, Seq("__fp", "__score"))
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as(idCol))
    df.join(keep.select(col(idCol)), Seq(idCol), "left_semi")
  }

  /** [[keepBest]] over token-set groups, scoring by token COUNT — among
    * bag-of-words duplicates keep the most complete copy (the one with
    * the most tokens; byte-identical counts fall back to min id). */
  def tokenSetKeepBest(df: DataFrame, idCol: String,
                       textCol: String): DataFrame =
    keepBest(df, idCol, tokenSetFingerprint(col(textCol)),
      size(TextFunctions.tokens(col(textCol))).cast("bigint"))

  /** Per-fingerprint group sizes — the dup-ratio diagnostic. */
  def groupSizes(df: DataFrame, idCol: String, textCol: String): DataFrame =
    withFingerprint(df, textCol)
      .groupBy(col("fingerprint"))
      .agg(count(lit(1)).as("n_copies"), min(col(idCol)).as("keeper_id"))
}
