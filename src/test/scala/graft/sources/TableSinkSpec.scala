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
}
