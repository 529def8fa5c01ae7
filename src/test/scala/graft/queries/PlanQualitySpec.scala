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

  test("packing: the corpus-wide window is partitioned; only block totals run unpartitioned") {
    // the scale claim of c5_sequence_packing: the full-corpus running
    // sum windows PARTITIONED by block, and the only unpartitioned
    // window ranges over the tiny per-block totals relation. Inspect
    // the optimized plan's Window nodes: exactly one partitioned (by
    // __blk, over docs) and one unpartitioned (over the aggregated
    // block totals, AFTER an Aggregate in its subtree). Built with a
    // parameterization no other suite uses — a concurrently-cached
    // identical plan would be substituted by its InMemoryRelation and
    // hide the windows.
    val df = graft.text.Packing.docPacking(
      graft.Tables.documents(spark, sf0001), "doc_id", "text",
      seqLen = 128, blockSize = 16)
    val windows = df.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.size === 2, s"expected 2 windows, got ${windows.size}")
    val (unpart, part) = windows.partition(_.partitionSpec.isEmpty)
    assert(part.size === 1, "corpus window lost its partition key")
    assert(unpart.size === 1)
    // the unpartitioned window must sit above the block-totals Aggregate
    assert(unpart.head.exists {
      case _: org.apache.spark.sql.catalyst.plans.logical.Aggregate => true
      case _ => false
    }, "unpartitioned window does not range over aggregated block totals")
  }

  test("budget select: bin-prefix attaches via broadcast; corpus never globally sorted") {
    val p = plan("c7_budget_select")
    assert(p.contains("BroadcastHashJoin"),
      "bin prefix must broadcast:\n" + p.take(1500))
    assert(!p.contains("SortMergeJoin"), "bin-prefix join became a shuffle")
  }

  test("hybrid search: query vector inlined, ranking is TakeOrderedAndProject") {
    val p = plan("c3_hybrid_search")
    assert(p.contains("TakeOrderedAndProject"),
      "top-k became a global sort:\n" + p.take(1500))
    // the 1-row query vector is collected once and inlined as a
    // literal — the plan must carry NO join for it (the only join is
    // docs ⋈ vecs on id)
    assert(!p.contains("NestedLoopJoin"),
      "query vector reintroduced a per-row join:\n" + p.take(1500))
  }

  test("b15: correlated scalar subquery decorrelates to agg + join") {
    val p = plan("b15_correlated_scalar")
    assert(!p.contains("ScalarSubquery"),
      "correlated subquery survived as per-row execution:\n" + p.take(1500))
    assert(p.contains("HashAggregate") &&
      (p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
        p.contains("ShuffledHashJoin")),
      "expected the decorrelated agg+join shape:\n" + p.take(1500))
  }

  test("span dedup: first-occurrence is a partial-aggregated hash agg, no window") {
    val p = plan("c1_span_dedup")
    assert(!p.contains("Window"),
      "span first-occurrence became a window (skew-unsafe):\n" + p.take(1500))
    // partial_min specifically — a bare HashAggregate check is vacuous
    // (every groupBy plan has one); the skew-safe shape is the map-side
    // partial min over the (doc_id, span_idx) struct
    assert(p.contains("partial_min"),
      "expected map-side partial min aggregation:\n" + p.take(1500))
  }

  test("fixed-size sample: TakeOrderedAndProject, never a global sort") {
    val p = plan("c7_fixed_size_sample")
    assert(p.contains("TakeOrderedAndProject"),
      "exact-k sample became a global sort:\n" + p.take(1500))
  }

  test("split assign: a pure projection over the scan — zero Exchange") {
    val p = plan("c7_split_assign")
    assert(!p.contains("Exchange"),
      "split assignment must not shuffle — it is a key-derived CASE:\n" +
        p.take(1500))
    assert(!p.contains("Join"), "split assignment must not join")
  }

  test("snapshot diff: fingerprints computed below the join, no text through the shuffle") {
    val p = plan("d11_snapshot_diff")
    // the full-outer id join must be an equi-join (SMJ/shuffled hash),
    // never a nested-loop
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "diff join degenerated to a non-equi join:\n" +
        p.linesIterator.filter(_.contains("Join")).mkString("\n"))
    // the join's shuffle carries (id, md5) only — the text column must
    // be consumed by the md5 projection below the Exchange, so no
    // Exchange output row includes `text`
    val badRow = p.linesIterator.sliding(2).exists(w =>
      w.head.startsWith("(") && w.head.contains("Exchange") &&
        w.last.contains("text#"))
    assert(!badRow, "raw text shuffled through the diff Exchange:\n" +
      p.linesIterator.filter(l => l.contains("Exchange") || l.contains("text#"))
        .mkString("\n"))
  }

  test("partitioned layout + selective dim filter → dynamic partition pruning") {
    // The runtime half of the pruning story: a fact table laid out with
    // TableSink.writePartitioned, joined to a dimension on the
    // partition column with a selective filter on the dim, must get a
    // DYNAMIC partition filter on the fact scan — Spark builds the dim
    // side first and skips whole fact partitions at run time. At 100 TB
    // this is the difference between scanning one month and scanning
    // the table when the month list comes from a subquery, not a
    // literal.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dpp").toString
    graft.sources.TableSink.writePartitioned(
      graft.Tables.orders(spark, sf0001)
        .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM")),
      s"$dir/orders_m", Seq("month"))
    val fact = spark.read.parquet(s"$dir/orders_m")
    val dim = fact.select("month").distinct()
      .withColumn("is_audit", col("month").endsWith("-03"))
    val q = fact.join(dim.filter(col("is_audit")), "month")
      .groupBy(col("month")).agg(count(lit(1)).as("n"))
    q.collect()
    val p = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.toLowerCase.contains("dynamicpruning"),
      "no dynamic partition pruning on the fact scan:\n" +
        p.linesIterator.filter(_.contains("PartitionFilters"))
          .mkString("\n"))
  }

  test("domain mixture: corpus is scanned and filtered, never shuffled") {
    // the only Exchanges allowed are for the tiny per-stratum counts
    // aggregation (and its scalar min); the corpus-side probe must be
    // a broadcast join + filter. No SortMergeJoin anywhere.
    val p = plan("c7_domain_mixture")
    assert(!p.contains("SortMergeJoin"),
      "rates join must broadcast, not shuffle the corpus:\n" +
        p.linesIterator.filter(_.contains("Join")).mkString("\n"))
    assert(p.contains("BroadcastHashJoin"), "rates not broadcast")
  }

  test("constraint checks: referential-integrity probe is a broadcast anti join") {
    // the fact side streams through; only the dim's key column builds
    val p = plan("d15_constraint_checks")
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "ref_integrity did not plan as broadcast anti join:\n" +
        p.linesIterator.filter(_.contains("Join")).mkString("\n"))
    assert(!p.contains("SortMergeJoin"),
      "constraint check shuffled the fact table for the dim probe")
  }

  test("k-means exact assignment is a pure projection — zero Exchange") {
    val p = plan("c3_kmeans_assign")
    assert(!p.contains("Exchange"),
      "assignment should be narrow:\n" +
        p.linesIterator.filter(_.contains("Exchange")).mkString("\n"))
  }

  test("fuzzy pairs: candidates come from an equi-join, never a cartesian") {
    val p = plan("c1_fuzzy_pairs")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "SymSpell candidate generation degenerated to all-pairs:\n" +
        p.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("histogram: one scan, map-side partial aggregation") {
    val df = graft.SparkEntry.queries("d18_histogram")(spark, sf0001)
    df.collect()
    // executed-plan tree (before AQE's appended Initial Plan section):
    // each physical node appears exactly once there
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(p).size === 1,
      s"histogram re-scanned the table:\n$p")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "no partial aggregation before the bucket shuffle")
  }

  test("winsorize: percentile fences broadcast back, no corpus shuffle join") {
    val p = plan("c8_winsorize")
    assert(p.contains("BroadcastHashJoin"), "fences not broadcast")
    assert(!p.contains("SortMergeJoin"),
      "stats attach shuffled the value table")
  }

  test("ab test: one user shuffle into partial-agg'd 1-row Welch summary") {
    val df = graft.SparkEntry.queries("d32_ab_test")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(p).size === 1,
      s"A/B summary re-scanned events:\n$p")
    // two aggregates (per-user, then 1-row summary), each partial+final
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "missing partial aggregation in the Welch pipeline")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "the Welch summary must not join anything")
  }

  test("survival: the KM fold runs over the BUCKETED axis, not subjects") {
    val df = graft.SparkEntry.queries("d42_survival")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    // per-subject reduction is a hash agg; the single-partition window
    // sees only the bucket axis (the Exchange feeding the Window must
    // be SinglePartition over the bucket-aggregated frame)
    assert("HashAggregate".r.findAllIn(p).size >= 4,
      "per-subject/per-bucket reductions not partial-aggregated")
    assert(p.contains("Window"), "no window for the KM fold")
    assert(p.contains("Exchange SinglePartition"),
      "bucket axis not gathered for the ordered fold")
  }

  test("benford: digit projection folds into one scan + tiny agg") {
    val df = graft.SparkEntry.queries("d39_benford")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    assert("Scan parquet".r.findAllIn(p).size === 1,
      s"benford re-scanned orders:\n$p")
    assert(!p.contains("SortMergeJoin"), "digit totals must broadcast")
  }

  test("bootstrap CI: the B-replica explosion never reaches the shuffle raw") {
    // the explode is map-side into a PARTIAL aggregate — shuffle
    // traffic is (group, replica)-sized, not corpus×B
    val p = plan("d46_bootstrap_ci")
    assert(p.contains("Generate"), "no explode in the bootstrap plan")
    assert(p.contains("HashAggregate"), "no hash agg")
    // partial-agg discipline: the first aggregate after the Generate
    // must be a partial (merge/final only above the Exchange)
    val gen = p.indexOf("Generate")
    val firstAgg = p.indexOf("HashAggregate", gen)
    assert(firstAgg > 0, "no aggregate above the explode")
    assert(!p.contains("CartesianProduct"), "cartesian in bootstrap plan")
  }

  test("mann-whitney: ranking is a value-axis agg, never a per-unit window") {
    val p = plan("d52_mann_whitney")
    // the only window runs over the bounded value axis (after the
    // groupBy on m) — assert there is no row_number/rank in the plan
    assert(!p.toLowerCase.contains("row_number"),
      "per-unit rank materialized:\n" + p.take(1500))
    assert(p.contains("Window"), "missing the value-axis running sum")
  }

  test("KS test: distribution compare is a value-axis agg, no per-unit rank") {
    val p = plan("d60_ks_test")
    assert(!p.toLowerCase.contains("row_number"),
      "per-unit rank materialized:\n" + p.take(1500))
    assert(p.contains("Window"), "missing the inclusive ECDF running sum")
    assert(p.contains("HashAggregate"), "value axis not aggregated")
  }

  test("PSI: baseline edges broadcast back; fold over the bin axis only") {
    val p = plan("d61_psi")
    assert(p.contains("Broadcast"), "baseline edges not broadcast:\n" +
      p.take(1500))
    assert(!p.contains("CartesianProduct"), "edges attach went cartesian")
  }

  test("conformal: fit and qhat attach via broadcast, never a corpus shuffle") {
    val p = plan("d63_conformal")
    assert(p.contains("Broadcast"), "fit/qhat frames not broadcast")
    assert(!p.toLowerCase.contains("row_number"),
      "residual order statistic materialized a per-row rank:\n" +
        p.take(1500))
  }

  test("DSIR: scoring joins are hash joins; selection never global-sorts") {
    val df = graft.SparkEntry.queries("c7_dsir_select")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"),
      "DSIR scoring degenerated to a cross join")
    assert(p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .forall(_.contains("BuildRight, Cross")),
      "non-stats nested-loop join in the DSIR plan")
    assert(!p.contains("GlobalSort") &&
      !p.linesIterator.exists(l => l.contains("Sort ") &&
        l.contains("global=true") && !l.contains("TakeOrdered")),
      "PPS selection introduced a global sort:\n" + p.take(2000))
  }

  test("ANN-KNN impute: candidate join is an equi-join on cell id, no cartesian") {
    val df = graft.SparkEntry.queries("impute_lineitem_knn_ann")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"),
      "ANN candidates degenerated to a cross join")
    // the only nested-loop joins are the 1-row stats/scaling attach
    // (broadcast BuildRight Cross — the MeanImpute stats pattern);
    // the CANDIDATE join itself must be a hash equi-join on __cell
    assert(p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .forall(_.contains("BuildRight, Cross")),
      "non-stats nested-loop join in the ANN plan")
    assert(p.contains("HashJoin"), "candidate join is not a hash join")
  }

  test("cluster SE: two keyed hash aggs, no window, no join at all") {
    val df = graft.SparkEntry.queries("d74_cluster_se")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    assert(p.contains("HashAggregate"), "no hash aggregation:\n" + p.take(1500))
    assert(!p.contains("Window"), "CR1 sums leaked into a window:\n" + p.take(1500))
    assert(!p.contains("Join"), "clusterDiff should be join-free:\n" + p.take(1500))
  }

  test("exact covariance: pair generation is a hash equi-join on the row id") {
    val df = graft.SparkEntry.queries("d76_covariance")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    assert(!p.contains("CartesianProduct"),
      "covariance pairs degenerated to a cross join")
    assert(p.contains("HashJoin"), "pair join is not a hash join")
    assert(p.contains("BroadcastHashJoin"),
      "per-dimension sums should attach via broadcast")
  }

  test("PCA projection: the scoring pass is a pure projection — zero Exchange") {
    val emb = graft.Tables.embeddings(spark, sf0001)
    val model = graft.similarity.Pca.fit(emb, "embedding", k = 4)
    val df = graft.similarity.Pca.project(emb, "embedding", model,
      Seq("vec_id"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    assert(!p.contains("Exchange"),
      "native projection should not shuffle:\n" + p.take(1500))
  }

  test("yuen: trim runs on the value axis — no per-unit rank window") {
    val df = graft.SparkEntry.queries("d79_yuen_trimmed")(spark, sf0001)
    df.collect()
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    // the only window is the expanding sum over DISTINCT values (fed
    // by a hash agg), and the final 1-row×1-row combine is the allowed
    // broadcast-cross shape
    assert(p.contains("HashAggregate"), "value axis not aggregated first")
    assert(!p.contains("CartesianProduct"))
    assert(p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin"))
      .forall(_.contains("Cross")), "unexpected nested-loop join")
    val winLines = p.linesIterator.filter(_.contains("Window")).toSeq
    assert(winLines.forall(_.contains("__v")),
      "window not keyed by variant over the value axis:\n" +
        winLines.mkString("\n"))
  }
}
