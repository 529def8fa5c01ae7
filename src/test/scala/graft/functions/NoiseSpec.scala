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

  test("intRank spreads consecutive keys uniformly (guards the monotone-rank bug)") {
    // the first intRank draft used a small multiplier: for keys below
    // √p/a the square never wrapped the modulus, ranks were MONOTONE in
    // the key, and "top-k by rank" degenerated to "first k keys". Pin
    // both properties: quartile uniformity and non-monotonicity.
    val p = 1000000007L
    val n = 10000
    val ranks = spark.range(0, n)
      .select(Noise.intRank(col("id"), 13).as("r"))
      .collect().map(_.getLong(0))
    val quartiles = ranks.groupBy(r => (r * 4 / p).toInt).view.mapValues(_.length)
    (0 to 3).foreach { qt =>
      val cnt = quartiles.getOrElse(qt, 0)
      assert(math.abs(cnt - n / 4) < n / 8,
        s"quartile $qt holds $cnt of $n ranks — not uniform")
    }
    val ascendingPairs = ranks.zip(ranks.tail).count { case (a, b) => b > a }
    assert(math.abs(ascendingPairs - n / 2) < n / 8,
      s"$ascendingPairs/$n ascending adjacent pairs — ranks correlate with keys")
    // and the low-key region specifically must not be sorted (the
    // exact symptom of the un-wrapped square)
    val low = ranks.take(100)
    assert(!(low.zip(low.tail).forall { case (a, b) => b >= a }),
      "ranks monotone over the first 100 keys")
  }

  test("invNormal is an accurate inverse normal CDF: known quantiles, " +
    "symmetry, and both tail branches") {
    import spark.implicits._
    // (p, Φ⁻¹(p)) reference pairs — standard normal quantiles
    val cases = Seq(
      0.5 -> 0.0, 0.975 -> 1.959964, 0.025 -> -1.959964,
      0.84134474 -> 1.0, 0.15865526 -> -1.0,
      0.999 -> 3.090232, 0.001 -> -3.090232,     // tail branches
      0.9999 -> 3.719016, 0.0001 -> -3.719016)
    val df = cases.map(c => Tuple1(c._1)).toDF("u")
      .select(col("u"), Noise.invNormal(col("u")).as("z"))
    df.collect().foreach { r =>
      val expect = cases.toMap.apply(r.getDouble(0))
      assert(math.abs(r.getDouble(1) - expect) < 1e-5,
        s"invNormal(${r.getDouble(0)}) = ${r.getDouble(1)}, want $expect")
    }
    // symmetry: Φ⁻¹(u) = −Φ⁻¹(1−u) to approximation accuracy
    val sym = (1 to 99).map(i => Tuple1(i / 100.0)).toDF("u")
      .select((Noise.invNormal(col("u"))
        + Noise.invNormal(lit(1.0) - col("u"))).as("s"))
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.abs(col("s"))))
      .collect().head.getDouble(0)
    assert(sym < 1e-8, s"asymmetry $sym")
  }
}
