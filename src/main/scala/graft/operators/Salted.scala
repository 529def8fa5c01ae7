package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Key-salting for skew — the manual escape hatch for the cases AQE's
  * skew handling does not reach. AQE splits oversized SORT-MERGE
  * partitions after the shuffle files exist; it cannot help when the
  * skew sits in a hash aggregation's reduce side with a non-algebraic
  * aggregate, or when a hot key must flow through a shuffled hash join.
  *
  *  - `saltedAgg`: two-phase aggregation. Phase 1 groups by
  *    (keys, salt) — the hot key's rows spread over `saltFactor`
  *    reducers — phase 2 re-aggregates the per-salt partials. Caller
  *    supplies both phase functions (sum/sum, count/sum, max/max, ...),
  *    which is exactly the algebraic-decomposition contract partial
  *    aggregation uses internally.
  *  - `saltedJoin`: left rows get a salt in [0, saltFactor); the
  *    (smaller) right side is replicated once per salt value. The hot
  *    key's probe rows land on `saltFactor` different reducers instead
  *    of one. Replication multiplies the right side — use for
  *    dimension-sized right tables with a skewed fact on the left.
  *
  * The salt is a per-row physical counter modulo `saltFactor` — evenly
  * spread by construction (even for byte-identical rows) and
  * non-deterministic across runs, which is harmless: any salt
  * assignment produces the same aggregate/join result, and the salt
  * never escapes the operator.
  */
object Salted {

  private val SaltCol = "__salt"

  /** Per-row salt. Two modes:
    *
    *  - `saltKey` NON-EMPTY (preferred, §5.3-clean): salt =
    *    `xxhash64(saltKey...) mod factor` — fully DETERMINISTIC across
    *    runs and engines. Pass a column set that is (near-)UNIQUE per
    *    row (e.g. the fact table's primary key): uniqueness is what
    *    spreads a hot group's rows across the salt space. A NON-unique
    *    saltKey silently concentrates duplicates on one salt value —
    *    the exact hazard the default mode documents.
    *  - `saltKey` EMPTY (keyless fallback): `monotonically_increasing_
    *    id mod factor` — unique per row by construction (so even
    *    byte-identical rows spread), but non-deterministic across
    *    runs. Harmless for correctness (any salt assignment yields
    *    the same aggregate/join result; the salt never escapes the
    *    operator), yet callers with a natural key should pass it. */
  private[operators] def salt(saltFactor: Int,
                              saltKey: Seq[Column]): Column =
    if (saltKey.nonEmpty) pmod(xxhash64(saltKey: _*), lit(saltFactor.toLong))
    else pmod(monotonically_increasing_id(), lit(saltFactor.toLong))

  /** Two-phase skew-safe aggregation.
    * @param partial per-column phase-1 aggregates over raw rows
    * @param merge   phase-2 re-aggregation of the phase-1 outputs
    *                (same column names in and out)
    * @param saltKey (near-)unique row key for a deterministic salt —
    *                see [[salt]] */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFactor: Int,
                partial: Seq[Column], merge: Seq[Column],
                saltKey: Seq[Column] = Nil): DataFrame = {
    require(partial.nonEmpty && merge.nonEmpty)
    df.withColumn(SaltCol, salt(saltFactor, saltKey))
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Skew-safe inner equi-join: salted left × replicated right.
    * Right-side rows are duplicated `saltFactor` times (keep it
    * dimension-sized). `saltKey` as in [[saltedAgg]]. */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int, saltKey: Seq[Column] = Nil): DataFrame = {
    val saltedLeft = left.withColumn(SaltCol, salt(saltFactor, saltKey))
    val replicatedRight = right.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    saltedLeft.join(replicatedRight, keys :+ SaltCol).drop(SaltCol)
  }
}
