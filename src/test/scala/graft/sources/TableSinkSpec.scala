package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Write-side layout: partition pruning and shuffle-free bucketed
  * joins are the two properties that justify the sink's existence —
  * both asserted against the actual plans. */
class TableSinkSpec extends SparkSpec {

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("table_sink").toString

  test("partitioned write prunes at scan") {
    TableSink.writePartitioned(
      Tables.orders(spark, sf0001), s"$tmp/orders_p", Seq("o_orderpriority"))
    val scan = spark.read.parquet(s"$tmp/orders_p")
      .filter(col("o_orderpriority") === "1-URGENT")
    val physical = scan.queryExecution.executedPlan.toString
    assert(physical.contains("PartitionFilters: [isnotnull(o_orderpriority"),
      s"partition filter not pushed:\n$physical")
    // pruned result is still correct
    val expected = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT").count()
    assert(scan.count() === expected)
  }

  test("same-bucketed tables join without a shuffle") {
    val orders = Tables.orders(spark, sf0001)
    val customer = Tables.customer(spark, sf0001)
    TableSink.writeBucketed(orders, "orders_b", s"$tmp/orders_b",
      Seq("o_custkey"), 4)
    TableSink.writeBucketed(
      customer.withColumnRenamed("c_custkey", "o_custkey"),
      "customer_b", s"$tmp/customer_b", Seq("o_custkey"), 4)

    // force the sort-merge path (at sf0.001 everything fits a
    // broadcast, which would hide the property under test)
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), "o_custkey")
        .select("o_orderkey", "c_mktsegment")
      val rows = joined.collect() // finalize the AQE plan before reading it
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("SortMergeJoin"),
        s"expected a sort-merge join:\n$physical")
      assert(!physical.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle either side:\n$physical")

      // and it computes the same thing as the shuffled join
      val expected = orders
        .join(customer, orders("o_custkey") === customer("c_custkey"))
        .select("o_orderkey", "c_mktsegment")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(rows.map(r => (r.getLong(0), r.getString(1))).toSet === expected)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }

  test("compact: shrinks a many-small-files table, content bit-identical") {
    import org.apache.spark.sql.functions.col
    val li = graft.Tables.lineitem(spark, sf0001)
    // stage a pathological layout: 64 tiny files
    li.repartition(64).write.mode("overwrite").parquet(s"$tmp/li_small")
    val (before, after) = TableSink.compact(spark, s"$tmp/li_small",
      s"$tmp/li_compacted", targetBytes = 1L << 20)
    assert(before === 64)
    assert(after < 16, s"expected far fewer files, got $after")
    val a = spark.read.parquet(s"$tmp/li_small")
    val b = spark.read.parquet(s"$tmp/li_compacted")
    assert(a.count() === b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("compact with sortCol restores clustering (disjoint file ranges)") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sf0001)
    li.repartition(32).write.mode("overwrite").parquet(s"$tmp/li_shuffled")
    TableSink.compact(spark, s"$tmp/li_shuffled", s"$tmp/li_sorted",
      targetBytes = 200L << 10, sortCol = Some("l_orderkey"))
    val ranges = spark.read.parquet(s"$tmp/li_sorted")
      .groupBy(input_file_name().as("f"))
      .agg(min("l_orderkey").as("lo"), max("l_orderkey").as("hi"))
      .select("lo", "hi").collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(ranges.size > 1, "want multiple files to check disjointness")
    ranges.sliding(2).foreach { case Array((_, hi), (lo2, _)) =>
      assert(hi <= lo2, s"overlapping file ranges: $ranges")
    }
  }
}
