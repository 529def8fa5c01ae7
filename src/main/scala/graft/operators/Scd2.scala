package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SLOWLY-CHANGING DIMENSION (TYPE 2) — dimension history as validity
  * intervals: every change row becomes a version valid from its own
  * timestamp until the key's NEXT change (open-ended for the current
  * version). Point-in-time enrichment then answers "what did this
  * user's profile look like WHEN the event happened" — the
  * training-data variant being feature snapshots without label
  * leakage (a fact may only see dimension state from its past).
  *
  * Scale shape: interval build is one window (`lead` over each key's
  * changes — change logs are small relative to facts; shuffle by key,
  * bounded partitions). Enrichment reuses [[AsofJoin]]'s union+window
  * single-shuffle backward as-of on `valid_from`: because lead-built
  * intervals PARTITION the timeline per key (contiguous, no gaps or
  * overlaps), "latest version with valid_from ≤ fact ts" IS the
  * containing interval — no BETWEEN theta-join, no range bucketing
  * needed. Facts before a key's first version get nulls (no history —
  * exactly what leakage-safety demands).
  */
object Scd2 {

  /** One validity interval per change row: input columns plus
    * `valid_from` (the change ts) and `valid_to` (next change ts for
    * the key, null while current). Ties on (ts) are ordered by
    * `tieCol` so duplicate-timestamp changes produce zero-length
    * intervals deterministically rather than ambiguously. */
  def buildIntervals(changes: DataFrame, keyCol: String, tsCol: String,
                     tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    changes
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
  }

  /** Point-in-time enrichment: each fact row picks the dimension
    * version valid at its timestamp (backward as-of on `valid_from`;
    * correct because the intervals partition time per key). */
  def pointInTime(facts: DataFrame, intervals: DataFrame,
                  keyCols: Seq[String], factTsCol: String): DataFrame =
    AsofJoin.asofJoin(facts, intervals, keyCols, factTsCol, "valid_from")
}
