package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Token-budget corpus selection — "give me the best N-token training
  * mix": rank docs by a quality score (ties broken by id) and keep docs
  * in rank order while the running token total stays within budget.
  * Only docs that fit COMPLETELY are kept (no mid-doc truncation —
  * that's [[Packing]]'s job downstream).
  *
  * The running total over the global (quality desc, id) order is the
  * same exclusive-prefix-sum problem as [[Packing.globalOffsets]], and
  * gets the same two-level treatment with the QUALITY VALUE as the
  * block key:
  *
  *   1. per-quality-bin token totals + the exclusive prefix over bins
  *      ordered by quality desc — a relation of |distinct scores| rows
  *      (a 6-dp score grid keeps this ≤ 10⁶ at any corpus size), which
  *      broadcasts back;
  *   2. the within-bin exclusive running sum, windowed by bin and
  *      ordered by id — bounded by the largest single bin.
  *
  * A doc is kept iff `bin_prefix + intra + n_tokens ≤ budget`. No
  * full-corpus sort, no single-partition window; the DuckDB oracle
  * runs the naive one-window formulation and must agree exactly.
  */
object BudgetSelect {

  /** @param qualityCol numeric score, higher = better (use a rounded
    *        grid — each distinct value forms one prefix-sum bin)
    * @param tokensCol  per-doc token count (bigint)
    * @return input rows that fit the budget, plus `start_off` (tokens
    *         consumed by strictly-better-ranked docs) */
  def selectToBudget(df: DataFrame, idCol: String, qualityCol: String,
                     tokensCol: String, budget: Long): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    import org.apache.spark.sql.expressions.Window
    val binW = Window.orderBy(col(qualityCol).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val binPrefix = df.groupBy(col(qualityCol))
      .agg(sum(col(tokensCol)).as("__bt"))
      .withColumn("__binoff", coalesce(sum(col("__bt")).over(binW), lit(0L)))
      .select(col(qualityCol).as("__q"), col("__binoff"))
    val intraW = Window.partitionBy(col(qualityCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__intra", coalesce(sum(col(tokensCol)).over(intraW), lit(0L)))
      .join(broadcast(binPrefix), col(qualityCol) === col("__q"))
      .withColumn("start_off", (col("__binoff") + col("__intra")).cast("long"))
      .filter(col("start_off") + col(tokensCol) <= budget)
      .drop("__q", "__binoff", "__intra")
  }
}
