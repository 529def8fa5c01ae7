package graft.operators

import graft.SparkSpec
import graft.functions.Noise
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class EpochShuffleSpec extends SparkSpec {

  import spark.implicits._

  private val docs = (0L until 500L).toDF("id")

  test("positions are a permutation of [0, n)") {
    val pos = EpochShuffle.positions(docs, "id", epoch = 1)
      .select("shuffle_pos").as[Long].collect().sorted
    assert(pos === (0L until 500L).toArray)
  }

  test("two-level computation equals the naive global window") {
    val nBuckets = 64
    val naive = docs
      .withColumn("__rank", Noise.intRank(col("id"), 3))
      .withColumn("shuffle_pos", row_number().over(
        Window.orderBy(pmod(col("__rank"), lit(nBuckets.toLong)),
          col("__rank"), col("id"))).cast("long") - 1L)
      .select("id", "shuffle_pos")
    val twoLevel = EpochShuffle.positions(docs, "id", 3, nBuckets)
      .select("id", "shuffle_pos")
    assert(twoLevel.except(naive).isEmpty && naive.except(twoLevel).isEmpty)
  }

  test("same epoch reproduces; different epochs permute differently") {
    def posMap(e: Int): Map[Long, Long] =
      EpochShuffle.positions(docs, "id", e).select("id", "shuffle_pos")
        .as[(Long, Long)].collect().toMap
    val a = posMap(5)
    assert(a === posMap(5))
    val b = posMap(6)
    assert(a !== b)
    // not a trivial shift either: most docs move by differing deltas
    val deltas = a.keys.map(k => b(k) - a(k)).toSet
    assert(deltas.size > 100)
  }

  test("the order genuinely scrambles id order") {
    // Spearman-free check: the number of adjacent id pairs that stay
    // adjacent in shuffle order should be ~0, not ~n.
    val pos = EpochShuffle.positions(docs, "id", 2)
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    val adjacentKept = (0L until 499L)
      .count(i => math.abs(pos(i + 1) - pos(i)) == 1)
    assert(adjacentKept < 25)
  }

  test("positions survive input repartitioning (key-derived, not physical)") {
    val p1 = EpochShuffle.positions(docs.repartition(13), "id", 7)
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    val p2 = EpochShuffle.positions(docs.coalesce(1), "id", 7)
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(p1 === p2)
  }
}
