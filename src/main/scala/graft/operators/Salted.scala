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

  /** Per-row salt. A row-content hash would send byte-identical rows —
    * exactly the heavy-duplicate hot keys salting exists for — to ONE
    * salt value, silently disabling the spread, so the salt comes from
    * `monotonically_increasing_id` instead: unique per row (partition
    * id in the upper bits, partition-local counter below), so
    * consecutive rows cycle uniformly through the salt space at the
    * cost of one modulo — no per-column hashing on the hot path. */
  private[operators] def salt(saltFactor: Int): Column =
    pmod(monotonically_increasing_id(), lit(saltFactor.toLong))

  /** Two-phase skew-safe aggregation.
    * @param partial per-column phase-1 aggregates over raw rows
    * @param merge   phase-2 re-aggregation of the phase-1 outputs
    *                (same column names in and out) */
  def saltedAgg(df: DataFrame, keys: Seq[String], saltFactor: Int,
                partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(partial.nonEmpty && merge.nonEmpty)
    df.withColumn(SaltCol, salt(saltFactor))
      .groupBy((keys :+ SaltCol).map(col): _*)
      .agg(partial.head, partial.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Skew-safe inner equi-join: salted left × replicated right.
    * Right-side rows are duplicated `saltFactor` times (keep it
    * dimension-sized). */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                 saltFactor: Int): DataFrame = {
    val saltedLeft = left.withColumn(SaltCol, salt(saltFactor))
    val replicatedRight = right.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(saltFactor - 1L))))
    saltedLeft.join(replicatedRight, keys :+ SaltCol).drop(SaltCol)
  }
}
