package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Accuracy invariants for the sketch-based rows-only queries: the
  * driver can only count their rows, so the error bounds that justify
  * using the sketches at 100 TB are asserted here against the exact
  * twins. */
class SketchAccuracySpec extends SparkSpec {

  test("approx_count_distinct stays within 5% of exact per group") {
    val joined = graft.SparkEntry.queries("b6_approx_distinct")(spark, sf001)
      .join(
        Tables.lineitem(spark, sf001).groupBy(col("l_returnflag"))
          .agg(countDistinct(col("l_partkey")).as("exact_parts")),
        "l_returnflag")
    val bad = joined.filter(
      abs(col("approx_parts") - col("exact_parts")) >
        col("exact_parts") * 0.05)
    assert(bad.count() === 0,
      bad.collect().mkString("HLL error over 5%:\n", "\n", ""))
  }

  test("percentile_approx at 10k accuracy tracks the exact type-7 quantiles") {
    val approx = graft.SparkEntry.queries("b5_approx_percentiles")(spark, sf001)
    val exact = graft.SparkEntry.queries("b5_percentiles")(spark, sf001)
    val joined = approx.join(exact, "l_returnflag")
    // percentile_approx is rank-based (exact-ish at this accuracy);
    // allow 1% relative error against the interpolated exact value
    val bad = joined.filter(
      abs(col("p50_approx") - col("p50")) > abs(col("p50")) * 0.01 ||
        abs(col("p95_approx") - col("p95")) > abs(col("p95")) * 0.01)
    assert(bad.count() === 0,
      bad.collect().mkString("approx percentile off by >1%:\n", "\n", ""))
  }
}
