package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class NoiseSpec extends SparkSpec {

  test("hashNoise lands in [0,1) for every key and salt") {
    val li = Tables.lineitem(spark, sf0001)
    for (salt <- Seq(0, 1, 7)) {
      val bad = li.select(Noise.hashNoise(col("l_orderkey"), salt).as("u"))
        .filter(col("u") < 0.0 || col("u") >= 1.0)
      assert(bad.count() === 0, s"salt=$salt")
    }
  }

  test("different salts decorrelate the mask") {
    val c = Tables.customer(spark, sf0001)
    val both = c.filter(
      Noise.missingMask(col("c_custkey"), 1, 0.10) &&
      Noise.missingMask(col("c_custkey"), 2, 0.10)).count()
    // independent 10% masks should overlap on ~1% of rows, not 10%
    assert(both < c.count() * 0.05)
  }

  test("mask is a pure function of the key — stable under repartitioning") {
    val c = Tables.customer(spark, sf0001)
    val a = c.filter(Noise.missingMask(col("c_custkey"), 1, 0.10))
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    val b = c.repartition(13).filter(Noise.missingMask(col("c_custkey"), 1, 0.10))
      .select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(a === b)
  }
}
