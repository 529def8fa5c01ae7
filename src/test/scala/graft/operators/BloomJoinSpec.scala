package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BloomJoinSpec extends SparkSpec {

  test("bloom semi join equals plain left-semi join") {
    val fact = Tables.lineitem(spark, sf001)
    val dim = Tables.supplier(spark, sf001).filter(col("s_acctbal") > 5000)
    val bloom = BloomJoin.semiJoin(fact, dim, "l_suppkey", "s_suppkey",
      expectedItems = 10000L)
    val plain = fact.withColumnRenamed("l_suppkey", "l_suppkey")
      .join(dim.select(col("s_suppkey").as("l_suppkey")), Seq("l_suppkey"),
        "left_semi")
    assert(bloom.exceptAll(plain).isEmpty && plain.exceptAll(bloom).isEmpty)
    assert(bloom.count() > 0, "fixture must actually match rows")
  }

  test("bloom inner join equals plain inner join") {
    val fact = Tables.orders(spark, sf0001)
    val dim = Tables.customer(spark, sf0001).filter(col("c_acctbal") > 0)
      .select("c_custkey", "c_mktsegment")
    val bloom = BloomJoin.innerJoin(fact, dim, "o_custkey", "c_custkey",
      expectedItems = 10000L)
    val plain = fact.join(dim, col("o_custkey") === col("c_custkey"))
    assert(bloom.exceptAll(plain).isEmpty && plain.exceptAll(bloom).isEmpty)
  }

  test("null fact keys are dropped, not errored") {
    import spark.implicits._
    val fact = Seq(Some(1L), None, Some(2L), Some(99L)).toDF("k")
    val dim = Seq(1L, 2L, 3L).toDF("dk")
    val out = BloomJoin.semiJoin(fact, dim, "k", "dk", expectedItems = 100L)
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq === Seq(1L, 2L))
  }

  test("empty dim yields an empty result, not an NPE") {
    // Spark's stat.bloomFilter NPEs on an empty frame; a filtered dim
    // being empty at some scale factor is a legitimate state
    import spark.implicits._
    val fact = Seq(1L, 2L).toDF("k")
    val dim = Seq(1L).toDF("dk").filter(col("dk") > 100)
    assert(BloomJoin.semiJoin(fact, dim, "k", "dk", expectedItems = 10L)
      .count() === 0)
    assert(BloomJoin.innerJoin(fact, dim, "k", "dk", expectedItems = 10L)
      .count() === 0)
  }

  test("a tight bloom prunes non-matching keys before the join") {
    import spark.implicits._
    val fact = (1L to 10000L).toDF("k")
    val dim = Seq(5L, 17L).toDF("dk")
    val bf = BloomJoin.keysOf(dim, "dk", expectedItems = 100L, fpp = 0.001)
    val survivors = (1L to 10000L).count(bf.mightContainLong)
    assert(survivors < 100,
      s"bloom should prune nearly all of 10k keys, kept $survivors")
    val out = BloomJoin.semiJoin(fact, dim, "k", "dk",
      expectedItems = 100L, fpp = 0.001)
    assert(out.collect().map(_.getLong(0)).sorted.toSeq === Seq(5L, 17L))
  }
}
