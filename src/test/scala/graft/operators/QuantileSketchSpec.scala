package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class QuantileSketchSpec extends SparkSpec {

  private val Ps = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
  private val Eps = 0.01 // pinned rank-error contract at k = 2048

  private def rankError(values: Array[Double],
                        sk: QuantileSketch.Sketch): Double = {
    val sorted = values.sorted
    val n = values.length
    Ps.map { p =>
      val q = QuantileSketch.query(sk, p)
      // exact rank of q = # values <= q
      val r = {
        var lo = 0; var hi = n
        while (lo < hi) {
          val mid = (lo + hi) / 2
          if (sorted(mid) <= q) lo = mid + 1 else hi = mid
        }
        lo
      }
      math.abs(r - p * n) / n.toDouble
    }.max
  }

  private def buildLocal(values: Seq[Double],
                         k: Int = 2048): QuantileSketch.Sketch =
    values.foldLeft(QuantileSketch.empty(k))(QuantileSketch.insert)

  test("one-shot build: max rank error <= 1% on uniform and skewed " +
    "data (n = 100k, k = 2048)") {
    val rng = new scala.util.Random(3)
    val uniform = Array.fill(100000)(rng.nextDouble() * 1e6)
    val skUni = buildLocal(uniform.toSeq)
    assert(skUni.n === 100000L)
    val eUni = rankError(uniform, skUni)
    assert(eUni <= Eps, s"uniform rank error $eUni > $Eps")
    // heavy-tailed: exp(10·u) spans ~5 orders of magnitude — the
    // unbounded-axis case the exact grid state cannot take
    val skewed = Array.fill(100000)(math.exp(10.0 * rng.nextDouble()))
    val eSkew = rankError(skewed, buildLocal(skewed.toSeq))
    assert(eSkew <= Eps, s"skewed rank error $eSkew > $Eps")
  }

  test("merge of 8 shards stays within the same rank-error bound " +
    "(merge == one-shot within eps, the mergeable-state contract)") {
    val rng = new scala.util.Random(17)
    val all = Array.fill(80000)(math.exp(8.0 * rng.nextDouble()))
    val shards = all.grouped(10000).toSeq
    val merged = shards.map(s => buildLocal(s.toSeq))
      .reduce(QuantileSketch.merge)
    assert(merged.n === 80000L)
    val e = rankError(all, merged)
    assert(e <= Eps, s"merged rank error $e > $Eps")
    // and the one-shot build over the same data obeys it too
    val oneShot = buildLocal(all.toSeq)
    assert(rankError(all, oneShot) <= Eps)
  }

  test("state size stays O(k log n): levels bounded, each <= k") {
    val rng = new scala.util.Random(5)
    val sk = buildLocal(Seq.fill(200000)(rng.nextDouble()), k = 256)
    assert(sk.levels.length <= 16,
      s"level count ${sk.levels.length} not logarithmic")
    assert(sk.levels.forall(_.length <= 256))
    val stored = sk.levels.map(_.length).sum
    assert(stored <= 256 * sk.levels.length)
    // weighted count is exactly n (no mass lost in compaction)
    val weighted = sk.levels.zipWithIndex
      .map { case (vs, i) => vs.length.toLong << i }.sum
    assert(weighted === sk.n)
  }

  test("determinism: same input sequence -> identical sketch and " +
    "queries; no RNG anywhere") {
    val rng = new scala.util.Random(29)
    val data = Seq.fill(30000)(rng.nextDouble() * 100)
    val a = buildLocal(data)
    val b = buildLocal(data)
    assert(a === b)
    assert(Ps.map(QuantileSketch.query(a, _)) ===
      Ps.map(QuantileSketch.query(b, _)))
  }

  test("distributed build on lineitem extendedprice tracks the exact " +
    "percentiles") {
    val li = Tables.lineitem(spark, sf0001)
    val sk = QuantileSketch.build(li, "l_extendedprice")
    val n = li.count()
    assert(sk.n === n)
    val exact = li.selectExpr(
      "percentile(l_extendedprice, array(0.25, 0.5, 0.75))").head()
      .getSeq[Double](0)
    val got = Seq(0.25, 0.5, 0.75).map(QuantileSketch.query(sk, _))
    // compare by rank error against the exact distribution
    exact.zip(got).foreach { case (ex, g) =>
      val rEx = QuantileSketch.exactRank(li, "l_extendedprice", ex)
      val rGot = QuantileSketch.exactRank(li, "l_extendedprice", g)
      assert(math.abs(rEx - rGot).toDouble / n <= Eps,
        s"distributed sketch strayed: exact=$ex got=$g")
    }
  }

  test("quantiles() driver surface emits (p, q, n) rows; edge ps") {
    val li = Tables.lineitem(spark, sf0001)
    val r = QuantileSketch.quantiles(li, "l_quantity", Seq(0.0, 0.5, 1.0))
      .collect().map(x => x.getDouble(0) -> (x.getDouble(1), x.getLong(2)))
      .toMap
    assert(r.keySet === Set(0.0, 0.5, 1.0))
    val (mn, mx) = (r(0.0)._1, r(1.0)._1)
    assert(mn <= r(0.5)._1 && r(0.5)._1 <= mx)
    assert(mn === 1.0 && mx === 50.0, s"quantity min/max exact: $mn/$mx")
  }

  test("grouped state: per-group rank error <= 1% vs the exact " +
    "distribution on lineitem return flags") {
    val li = Tables.lineitem(spark, sf0001)
    val state = QuantileSketch.groupedState(li, "l_returnflag",
      "l_extendedprice")
    val finished = QuantileSketch.finishState(state, Seq(0.5))
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getLong(3)))
      .toMap
    assert(finished.keySet === Set("A", "N", "R"))
    finished.foreach { case (g, (q, n)) =>
      val grp = li.filter(col("l_returnflag") === g)
      assert(n === grp.count())
      val rank = QuantileSketch.exactRank(grp, "l_extendedprice", q)
      assert(math.abs(rank - 0.5 * n) / n <= Eps,
        s"group $g median rank error too large")
    }
  }

  test("state persists to parquet and folds with a fresh shard's " +
    "state within the error bound (the materialized-view refresh)") {
    val li = Tables.lineitem(spark, sf0001)
    val history = li.filter(pmod(col("l_orderkey"), lit(2L)) === 0)
    val delta = li.filter(pmod(col("l_orderkey"), lit(2L)) === 1)
    val dir = java.nio.file.Files.createTempDirectory("qsketch").toString
    QuantileSketch.groupedState(history, "l_returnflag", "l_extendedprice")
      .write.mode("overwrite").parquet(dir)
    val reread = spark.read.parquet(dir)
    val folded = QuantileSketch.mergeStates(reread,
      QuantileSketch.groupedState(delta, "l_returnflag", "l_extendedprice"))
    val finished = QuantileSketch.finishState(folded, Seq(0.25, 0.9))
      .collect().map(r => (r.getString(0), r.getDouble(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    for (g <- Seq("A", "N", "R"); p <- Seq(0.25, 0.9)) {
      val grp = li.filter(col("l_returnflag") === g)
      val n = grp.count()
      assert(finished((g, p))._2 === n, "merged n must be exact")
      val rank = QuantileSketch.exactRank(grp, "l_extendedprice",
        finished((g, p))._1)
      assert(math.abs(rank - p * n) / n <= Eps,
        s"folded state strayed at ($g, $p)")
    }
  }

  test("guards: odd/small k, empty sketch query, mismatched-k merge") {
    intercept[IllegalArgumentException] { QuantileSketch.empty(7) }
    intercept[IllegalArgumentException] { QuantileSketch.empty(4) }
    intercept[IllegalArgumentException] {
      QuantileSketch.query(QuantileSketch.empty(), 0.5)
    }
    intercept[IllegalArgumentException] {
      QuantileSketch.merge(QuantileSketch.empty(64),
        QuantileSketch.empty(128))
    }
  }
}
