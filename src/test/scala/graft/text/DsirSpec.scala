package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {

  import spark.implicits._

  // target docs speak {alpha..}, junk speaks {zeta..}; candidates are
  // unlabeled docs of each dialect
  private val docs = Seq(
    (1L, "alpha beta gamma alpha delta", true),
    (2L, "beta gamma alpha epsilon beta", true),
    (3L, "zeta eta theta zeta iota", false),
    (4L, "alpha beta gamma delta zeta", false), // mostly-target candidate
    (5L, "zeta eta theta iota kappa", false), // junk candidate
    (6L, "alpha zeta beta eta gamma", false) // mixed
  ).toDF("id", "text", "t")

  test("importance weights rank target-like docs above junk") {
    val w = Dsir.importanceWeights(docs, "id", "text", col("t"))
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(2), r.getLong(3))).toMap
    // target-dialect candidate outweighs mixed outweighs junk
    assert(w(4L)._1 > w(6L)._1 && w(6L)._1 > w(5L)._1, w.toString)
    assert(w(4L)._2 > w(6L)._2 && w(6L)._2 > w(5L)._2, w.toString)
    // weights are positive BIGINTs; ratios are symmetric-ish around 0
    assert(w.values.forall(_._2 >= 1L))
    // the target docs themselves score highest of all
    assert(w(1L)._1 > w(4L)._1 || w(2L)._1 > w(4L)._1, w.toString)
  }

  test("select: exactly k picks, concentrated on target-like docs") {
    val big = (1 to 50).map(i => (i.toLong, "alpha beta gamma delta", i <= 5)) ++
      (51 to 100).map(i => (i.toLong, "zeta eta theta iota", false))
    val sel = Dsir.select(big.toDF("id", "text", "t"), "id", "text",
      col("t"), k = 20)
    val rows = sel.collect()
    assert(rows.map(_.getAs[Long]("n_picks")).sum === 20L)
    // target-dialect ids (1..50) should dominate the selection
    val targetPicks = rows.filter(_.getLong(0) <= 50L)
      .map(_.getAs[Long]("n_picks")).sum
    assert(targetPicks >= 15L, s"target picks $targetPicks of 20")
  }

  test("clamp: a pathological outlier cannot absorb the whole sample") {
    // one doc whose every token is target-only vocabulary repeated —
    // unclamped its ratio would explode; the ±5 clamp caps the weight
    // at e^5 * 1e6
    val w = Dsir.importanceWeights(docs, "id", "text", col("t"))
      .agg(max(col("weight"))).head().getLong(0)
    assert(w <= math.ceil(math.exp(5.0) * 1e6).toLong)
  }
}
