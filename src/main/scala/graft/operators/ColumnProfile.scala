package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.NumericType

/** COLUMN PROFILE — the one-scan data-quality summary every ingest runs
  * before trusting a new corpus drop: per column, row/null/distinct
  * counts plus min/max/mean for numerics. One long-format row per
  * profiled column so the result is join-able against the previous
  * drop's profile (schema drift and null-rate regressions become a
  * trivial diff).
  *
  * Scale shape: a single scan with hash aggregation. Counts, min, max
  * and the decimal sum all combine associatively, so partial aggregation
  * runs map-side and the final merge sees one row per task. The only
  * non-trivial cost is exact `count(distinct)` over several columns at
  * once — Catalyst plans that via Expand (one duplicated stream per
  * distinct column). Exact mode is the oracle/CI shape; at 100 TB pass
  * `exact = false` and the distinct counts become mergeable HLL
  * sketches (`approx_count_distinct`, ±~2%), collapsing the plan back
  * to one stream with no Expand.
  *
  * Mean determinism (SURVEY §5.3): a double sum is order-dependent, so
  * the mean goes through an exact decimal(32,6) sum; both engines then
  * perform ONE double division on identical operands.
  */
object ColumnProfile {

  /** Profile `cols` (default: every column) of `df`. Output columns:
    * `column, n_rows, n_nulls, n_distinct, min_d, max_d, mean_d` —
    * the `_d` stats are null for non-numeric columns.
    */
  def profile(df: DataFrame, cols: Seq[String] = Nil,
              exact: Boolean = true): DataFrame = {
    val names = if (cols.nonEmpty) cols else df.columns.toSeq
    val schema = df.schema
    // Aggregate everything to ONE row (positional aliases sidestep any
    // exotic source column names), then pivot that row long with a
    // zero-cost explode over literal structs.
    val aggs = names.zipWithIndex.flatMap { case (c, i) =>
      val numeric = schema(c).dataType.isInstanceOf[NumericType]
      val d = col(c).cast("double")
      val nDistinct =
        if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        count(lit(1)).as(s"__nr_$i"),
        (count(lit(1)) - count(col(c))).as(s"__nn_$i"),
        nDistinct.as(s"__nd_$i"),
        (if (numeric) min(d) else min(lit(null).cast("double")))
          .as(s"__mn_$i"),
        (if (numeric) max(d) else max(lit(null).cast("double")))
          .as(s"__mx_$i"),
        (if (numeric)
           sum(col(c).cast("decimal(32,6)")).cast("double") / count(col(c))
         else max(lit(null).cast("double"))).as(s"__av_$i"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val rows = names.zipWithIndex.map { case (c, i) =>
      struct(
        lit(c).as("column"),
        col(s"__nr_$i").as("n_rows"),
        col(s"__nn_$i").as("n_nulls"),
        col(s"__nd_$i").as("n_distinct"),
        col(s"__mn_$i").as("min_d"),
        col(s"__mx_$i").as("max_d"),
        col(s"__av_$i").as("mean_d"))
    }
    one.select(explode(array(rows: _*)).as("__p")).select(col("__p.*"))
  }
}
