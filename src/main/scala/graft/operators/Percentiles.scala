package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT PERCENTILES WITHOUT THE PER-GROUP BUFFER — the 100 TB path
  * for the b5 family: Spark's exact `percentile()` aggregate holds
  * EVERY group value in one aggregation buffer (OOM the moment a
  * group outgrows an executor — the documented b5 hazard; the shipped
  * mitigations were the approx twins). This operator computes the
  * SAME type-7 (percentile_cont) quantiles by RANK SELECTION instead:
  *
  *   1. one window sort per group (`row_number` + group count) — a
  *      shuffle-sort, O(1) memory per row, spills like any sort;
  *   2. keep only rows whose 0-based rank is some requested
  *      quantile's floor(h) or ceil(h), h = p·(n−1) — ≤ 2·|ps| rows
  *      per group survive;
  *   3. one hash aggregate interpolates v_lo + (v_hi − v_lo)·(h −
  *      floor(h)) — the exact percentile_cont/quantile_cont IEEE
  *      sequence, so the row sits under the bit-exact oracle.
  *
  * Scale: the sort replaces the buffer — a skewed giant group becomes
  * a big EXTERNAL sort partition (disk-backed), never a growing
  * in-memory array. Cost is one extra shuffle vs the buffered
  * aggregate; at 100 TB that trade is the difference between running
  * and OOM. */
object Percentiles {

  /** Per-group exact type-7 quantiles of `valueCol` by rank
    * selection. `ps` = (output column name, p) pairs; values emitted
    * `round(·, 4)` like the b5 convention. Nulls are ignored like the
    * buffered aggregate's; the one divergence: a group whose EVERY
    * value is null is ABSENT here (no rankable row survives) where
    * `percentile()` emits it with null quantiles. */
  def exactByRank(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  ps: Seq[(String, Double)]): DataFrame = {
    require(groupCols.nonEmpty && ps.nonEmpty)
    require(ps.forall { case (_, p) => p >= 0.0 && p <= 1.0 },
      "quantiles must be in [0,1]")
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    val ranked = df
      .select((groupCols.map(col) :+ col(valueCol).cast("double")
        .as("__v")): _*)
      .filter(col("__v").isNotNull)
      .withColumn("__rn", row_number().over(byGroup.orderBy(col("__v"))))
      .withColumn("__n", count(lit(1)).over(byGroup))
    def h(p: Double) = lit(p) * (col("__n") - 1).cast("double")
    val idx = (col("__rn") - 1).cast("double")
    val needed = ps.map { case (_, p) =>
      idx === floor(h(p)) || idx === ceil(h(p)) }.reduce(_ || _)
    val aggs = ps.flatMap { case (name, p) =>
      Seq(max(when(idx === floor(h(p)), col("__v"))).as(s"__lo_$name"),
        max(when(idx === ceil(h(p)), col("__v"))).as(s"__hi_$name"))
    } :+ max(col("__n")).as("__nn")
    val picked = ranked.filter(needed)
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val outs = ps.map { case (name, p) =>
      val hh = lit(p) * (col("__nn") - 1).cast("double")
      round(col(s"__lo_$name") +
        (col(s"__hi_$name") - col(s"__lo_$name")) * (hh - floor(hh)), 4)
        .as(name)
    }
    picked.select(groupCols.map(col) ++ outs: _*)
  }
}
