package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact top-N rows per group (per-domain quality caps, the RefinedWeb
  * "at most N pages per registered domain" curation step) computed in
  * TWO LEVELS so one hot group cannot pin a single task:
  *
  *   1. rows are salted by a hash of the tie-break id into `salts`
  *      sub-groups; a row_number window over (group, salt) keeps each
  *      sub-group's local top-N — a hot domain spreads over `salts`
  *      tasks, and everything NOT in its sub-group's top-N (the bulk,
  *      at cap scale) is discarded before any global ordering;
  *   2. the survivors — at most salts × N rows per group — go through
  *      the final per-group row_number, now over a bounded partition.
  *
  * Level 1 is a pure filter (any true global top-N row is necessarily
  * in its own sub-group's top-N), so the result is EXACTLY the naive
  * single-window top-N — asserted in TopPerGroupSpec, and the whole
  * operator sits under the DuckDB oracle (c7_domain_cap), which
  * computes the naive form. Ordering must be total for cross-engine
  * determinism: (orderCol desc, idCol asc).
  *
  * PRECONDITION: `idCol` must be unique within each group. The
  * exactness proof and cross-engine determinism both rest on
  * (orderCol, idCol) being a TOTAL order — a duplicated id makes both
  * row_number levels nondeterministic (which copy ranks first depends
  * on partition layout) and can diverge from the naive window AND from
  * the DuckDB oracle. Not checked at runtime (a distinct-count over
  * the corpus would cost a full extra aggregation per call at 100 TB);
  * TopPerGroupSpec asserts it for the shipped c7_domain_cap key, and
  * callers with synthesized ids must guarantee it themselves.
  */
object TopPerGroup {

  def topN(df: DataFrame, groupCol: String, orderCol: String,
           idCol: String, n: Int, salts: Int = 16): DataFrame = {
    require(n >= 1 && salts >= 1)
    // `rank` is this operator's output column — silently overwriting a
    // caller's same-named column (and dropping their __r1) would hand
    // downstream code the cap's rank in place of theirs with no error
    require(!df.columns.contains("rank") && !df.columns.contains("__r1"),
      "topN emits a 'rank' column (and uses '__r1' internally): rename " +
        "the input's conflicting column first")
    val ord: Seq[Column] = Seq(col(orderCol).desc, col(idCol).asc)
    val local = Window.partitionBy(col(groupCol),
      pmod(xxhash64(col(idCol)), lit(salts))).orderBy(ord: _*)
    val global = Window.partitionBy(col(groupCol)).orderBy(ord: _*)
    df.withColumn("__r1", row_number().over(local))
      .filter(col("__r1") <= n)
      .withColumn("rank", row_number().over(global).cast("bigint"))
      .filter(col("rank") <= n)
      .drop("__r1")
  }
}
