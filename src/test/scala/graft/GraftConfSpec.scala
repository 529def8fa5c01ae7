package graft

import org.scalatest.funsuite.AnyFunSuite

class GraftConfSpec extends AnyFunSuite {

  test("recommended cluster conf: 2x-cores shuffle bound, AQE fully on") {
    val conf = GraftConf.recommended(8000)
    assert(conf("spark.sql.shuffle.partitions") === "16000")
    assert(conf("spark.sql.adaptive.enabled") === "true")
    assert(conf("spark.sql.adaptive.coalescePartitions.enabled") === "true")
    assert(conf("spark.sql.adaptive.skewJoin.enabled") === "true")
    assert(conf("spark.sql.files.maxPartitionBytes").toLong ===
      128L * 1024 * 1024)
    intercept[IllegalArgumentException](GraftConf.recommended(0))
  }
}
