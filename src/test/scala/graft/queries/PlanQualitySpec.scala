package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Plan-shape assertions — the 100 TB posture is only real if Catalyst
  * actually produces the plans SCALING.md claims: filters and column
  * pruning reach the parquet scan, small dims broadcast, pipelines stay
  * inside whole-stage codegen, and the one-row stats frames never turn
  * into shuffled joins.
  */
class PlanQualitySpec extends SparkSpec {

  private def plan(name: String): String = {
    val df: DataFrame = graft.SparkEntry.queries(name)(spark, sf0001)
    df.collect() // materialize THIS plan so AQE finalizes (count() would
                 // build and execute a different one)
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
  }

  test("b2: predicate pushdown and column pruning reach the scan") {
    val p = plan("b2_filter_project")
    assert(p.contains("PushedFilters: ["), "no pushed filters in:\n" + p.take(2000))
    assert(p.contains("l_shipdate"), "shipdate filter not pushed")
    // pruned read schema must not include unused money columns
    assert(!p.contains("l_tax"), "ReadSchema not pruned (l_tax read):\n" +
      p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n"))
  }

  test("q1: aggregation runs inside whole-stage codegen with partial aggs") {
    val p = plan("q1_pricing_summary")
    assert(p.contains("codegen id"), "no whole-stage codegen span:\n" + p.take(1200))
    assert(p.contains("HashAggregate"), "expected hash aggregation")
    // partial + final pair
    assert("HashAggregate".r.findAllIn(p).size >= 2, "no partial aggregation")
  }

  test("b3: dimension tables broadcast, no sort-merge for nation/region") {
    val p = plan("b3_star_join_revenue")
    assert(p.contains("BroadcastHashJoin"), "no broadcast join in star query")
  }

  test("impute slice: stats attach via broadcast, not a shuffled join") {
    val p = plan("impute_customer_acctbal")
    assert(p.contains("Broadcast"), "stats frame not broadcast:\n" + p.take(1500))
    assert(!p.contains("SortMergeJoin"), "stats join became a shuffle")
  }

  test("b9: top-k compiles to TakeOrderedAndProject (no global sort)") {
    val p = plan("b9_topk_orders")
    assert(p.contains("TakeOrderedAndProject"), p.take(1500))
  }

  test("ann: no forced broadcast of the vector corpus (scale posture)") {
    // round 1 pinned broadcast(vecs) on BOTH sides of the scoring join —
    // at 100 TB the "small side" is the corpus itself. The plan must
    // carry no broadcast hint; whatever broadcast appears may only come
    // from AQE's size-gated decision on genuinely small frames.
    val df = graft.SparkEntry.queries("c3_ann_topk")(spark, sf0001)
    val analyzed = df.queryExecution.analyzed.toString()
    assert(!analyzed.contains("ResolvedHint"),
      "ANN plan carries a broadcast hint:\n" +
        analyzed.linesIterator.filter(_.contains("Hint")).mkString("\n"))
  }

  test("b13 pivot: two-phase shape with partial aggregation, no join") {
    // Spark plans pivot as two aggregations: reduce on
    // (groupCols, pivotCol) first, then pivot the reduced rows — the
    // first shuffle carries pre-aggregated data, which is the property
    // that matters at scale. Assert partial aggs exist and the pivot
    // did not degenerate into a join of per-value subqueries.
    val p = plan("b13_pivot")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "pivot lost partial aggregation:\n" + p.take(1500))
    assert(!p.contains("Join"), "pivot degenerated into joins")
  }

  test("b14 lateral explode: narrow plan, no shuffle at all") {
    val p = plan("b14_lateral_explode")
    assert(!p.contains("Exchange"),
      "explode projection must not shuffle:\n" +
        p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
    assert(p.contains("Generate"), "expected a Generate (explode) node")
  }

  test("d6 bloom join: bloom probe does not defeat scan pruning") {
    val p = plan("d6_bloom_join")
    // the probe is a post-scan filter; column pruning must still hold —
    // lineitem money columns other than l_extendedprice stay unread
    val readSchemas = p.linesIterator.filter(_.contains("ReadSchema"))
      .mkString("\n")
    assert(!readSchemas.contains("l_tax"),
      "bloom probe defeated column pruning:\n" + readSchemas)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "confirm join missing")
  }

  test("c3 quantize: single-pass narrow projection over the scan") {
    val p = plan("c3_quantized_vectors")
    assert(!p.contains("Exchange"),
      "quantization must be a narrow projection:\n" +
        p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }
}
