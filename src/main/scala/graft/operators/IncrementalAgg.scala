package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** INCREMENTAL AGGREGATE MAINTENANCE — the materialized-view refresh
  * pattern: a 100 TB corpus's daily rollup must absorb today's shard
  * WITHOUT rescanning history. The trick is to persist the aggregate
  * as a MERGEABLE STATE (count, exact decimal sum, min, max per
  * group) instead of finished values: state ⊕ state is a plain
  * groupBy over the union, associative and commutative, so
  *
  *   state(history ∪ delta) = merge(state(history), state(delta))
  *
  * holds EXACTLY — not approximately — because every component is
  * order-insensitive (longs, decimals, min/max). Finished metrics
  * (avg) are derived at read time by [[finish]], one division on
  * exact operands. The identity is the oracle: the driver checks
  * merge-of-halves against a full recompute bit-for-bit.
  *
  * Scale shape: the delta scan is the only big-data pass; the merge
  * touches |groups| rows on both sides (one hash agg over their
  * union, partial map-side). Persist the state bucketed on the group
  * key (TableSink.writeBucketed) and the merge co-locates with zero
  * extra shuffle. Avg/stddev-style metrics must NEVER be stored
  * finished — a stored average of averages is the classic silent-skew
  * bug this operator exists to prevent.
  */
object IncrementalAgg {

  /** Mergeable aggregate state of `valueCol` per `groupCols`:
    * `(groupCols..., n, sum_v [decimal-exact], min_v, max_v)`. */
  def state(df: DataFrame, groupCols: Seq[String],
            valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(col(valueCol)).as("n"),
        sum(col(valueCol).cast("decimal(32,6)")).as("sum_v"),
        min(col(valueCol).cast("double")).as("min_v"),
        max(col(valueCol).cast("double")).as("max_v"))

  /** state ⊕ state — same schema in, same schema out; groups present
    * on either side survive. */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Finished view over a state: adds `avg_v` (exact sum ÷ count; null
    * for all-null groups) and casts the sum to double for consumers. */
  def finish(state: DataFrame): DataFrame =
    state
      .withColumn("avg_v",
        when(col("n") > 0,
          col("sum_v").cast("double") / col("n").cast("double")))
      .withColumn("sum_v", col("sum_v").cast("double"))

  // ---- mergeable DISTINCT counts ----------------------------------
  // COUNT(DISTINCT key) is the one common rollup metric the exact
  // state above cannot carry: distinctness is not decomposable into a
  // scalar. The mergeable form is the Datasketches HLL sketch (binary
  // register state; update and union are both register-wise max, so
  // they are order- and partitioning-insensitive):
  //   sketch(history ∪ delta) = union(sketch(history), sketch(delta))
  // The estimate is approximate (~1.6% rel. std. error at lgK=12), so
  // this family is rows+spec, not oracle — IncrementalAggSpec pins
  // merge ≡ recompute on the ESTIMATE and a ≤5% error floor vs exact.
  // At 100 TB this replaces the two-phase exact distinct (a full
  // re-shuffle of history per refresh) with |groups| × ~kB of state.

  /** Mergeable distinct-count state: `(groupCols..., nd_sketch)`.
    * `lgK` trades state size (2^lgK bytes-ish) for error. */
  def distinctState(df: DataFrame, groupCols: Seq[String],
                    keyCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("nd_sketch"))

  /** Distinct state ⊕ state — groups on either side survive. */
  def distinctMerge(a: DataFrame, b: DataFrame,
                    groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("nd_sketch")).as("nd_sketch"))

  /** Finished view: adds the cardinality estimate. */
  def distinctFinish(state: DataFrame): DataFrame =
    state.withColumn("approx_distinct",
      hll_sketch_estimate(col("nd_sketch")))
}
