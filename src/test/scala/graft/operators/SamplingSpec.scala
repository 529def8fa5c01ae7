package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001).cache()

  test("deterministic: identical row sets across runs and layouts") {
    val f = Map("en" -> 0.5, "de" -> 0.8)
    val a = Sampling.stratified(docs, "doc_id", "lang", f, 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratified(docs.repartition(7), "doc_id", "lang", f, 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("nested: lower rate samples are subsets of higher rate samples") {
    def ids(r: Double) =
      Sampling.stratified(docs, "doc_id", "lang", Map.empty, r)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val s10 = ids(0.1); val s30 = ids(0.3); val s100 = ids(1.0)
    assert(s10.subsetOf(s30))
    assert(s30.subsetOf(s100))
    assert(s100.size === docs.count())
  }

  test("fixedSize: exact k, deterministic across layouts, prefix-nested in k") {
    def ids(df: org.apache.spark.sql.DataFrame, k: Int) =
      Sampling.fixedSize(df, "doc_id", k)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val s50 = ids(docs, 50)
    assert(s50.size === 50)
    // same sample on a different physical layout
    assert(ids(docs.repartition(7), 50) === s50)
    // smaller k is a prefix of larger k (same noise ordering)
    assert(s50.subsetOf(ids(docs, 120)))
    // k past n returns everything
    assert(ids(docs, 100000).size === docs.count())
  }

  test("mixture: binding stratum keeps everything, output tracks target shares") {
    // equal counts per source (25 each at sf0.001) → the largest
    // weight binds: its rate is 1.0 and every other rate is w/w_max
    val weights = Map("src0" -> 0.4, "src1" -> 0.2, "src2" -> 0.4)
    val out = Sampling.mixture(docs, "doc_id", "source", weights).cache()
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept.keySet.subsetOf(weights.keySet), "unlisted sources must drop")
    // binding strata (max weight) keep all 25 docs
    assert(kept("src0") === 25L)
    assert(kept("src2") === 25L)
    // src1's rate is 0.2/0.4 = 0.5 → expect ~12-13 of 25 docs
    assert(kept("src1") >= 7 && kept("src1") <= 18,
      s"src1 kept ${kept("src1")}, want ~12.5")
    // reported rate column matches the closed form w/w_max
    val rates = out.select("source", "rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("src0") === 1.0)
    assert(math.abs(rates("src1") - 0.5) < 1e-9)
  }

  test("mixture with UNEQUAL counts: scarce stratum binds the budget") {
    import spark.implicits._
    // src A: 40 rows, src B: 10 rows, equal target shares → B binds:
    // budget = min(40/0.5, 10/0.5) = 20; rate(A) = 20*0.5/40 = 0.25,
    // rate(B) = 1.0 — the corpus can only support 10 B-rows' worth of
    // A at a 50/50 mix
    val df = ((1L to 40L).map(i => (i, "A")) ++ (41L to 50L).map(i => (i, "B")))
      .toDF("id", "src")
    val out = Sampling.mixture(df, "id", "src", Map("A" -> 0.5, "B" -> 0.5))
    val rates = out.select("src", "rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(rates("B") === 1.0)
    assert(math.abs(rates("A") - 0.25) < 1e-9)
    val kept = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("B") === 10L, "binding stratum must keep everything")
    assert(kept("A") >= 4 && kept("A") <= 17, s"A kept ${kept("A")}, want ~10")
  }

  test("mixture is deterministic under repartitioning") {
    val weights = Map("src3" -> 0.5, "src4" -> 0.5)
    def ids(df: org.apache.spark.sql.DataFrame) =
      Sampling.mixture(df, "doc_id", "source", weights)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids(docs) === ids(docs.repartition(13)))
  }

  test("assignSplits: exhaustive, disjoint, layout-stable, append-stable") {
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val out = Sampling.assignSplits(docs, "doc_id", splits).cache()
    // every row gets exactly one split, and only the given names appear
    assert(out.count() === docs.count())
    val names = out.select("split").distinct().collect()
      .map(_.getString(0)).toSet
    assert(names.subsetOf(Set("train", "val", "test")))
    // layout-invariant: same assignment on a different partitioning
    val a = out.select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.assignSplits(docs.repartition(7), "doc_id", splits)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b)
    // append-stable: assignment over a SUBSET matches the full corpus
    // (the split is a function of the key alone — growing the corpus
    // never re-rolls an old row)
    val sub = Sampling.assignSplits(docs.filter(col("doc_id") < 50),
        "doc_id", splits)
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(sub === a.filter(_._1 < 50))
    // shares land near their weights (500 docs, ±10 pts is generous)
    val got = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    splits.foreach { case (name, w) =>
      val share = got.getOrElse(name, 0L) / n
      assert(math.abs(share - w) < 0.1, s"$name: got $share, want ~$w")
    }
  }

  test("assignSplits keyed on a group hash keeps groups intact") {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val keyed = docs.withColumn("__k", column(
      graft.expressions.HornerHash(expression(col("source")))))
    val out = Sampling.assignSplits(keyed, "__k",
      Seq("train" -> 0.8, "test" -> 0.2), salt = 19)
    // leakage guard: every source maps to exactly one split
    val perSource = out.groupBy("source")
      .agg(countDistinct(col("split")).as("k")).collect()
    assert(perSource.nonEmpty)
    assert(perSource.forall(_.getLong(1) === 1L),
      "a source straddles splits — group-keyed assignment is broken")
  }

  test("assignSplits validates its weights") {
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4))
    }
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(docs, "doc_id", Seq("a" -> 1.1, "b" -> -0.1))
    }
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(docs, "doc_id", Seq("a" -> 0.5, "a" -> 0.5))
    }
    // single-split degenerate case assigns everything to the one name
    val one = Sampling.assignSplits(docs, "doc_id", Seq("all" -> 1.0))
    assert(one.select("split").distinct().collect()
      .map(_.getString(0)).toSeq === Seq("all"))
    // a weight below the bucket grid must fail LOUDLY, not silently
    // produce an empty split (0.99996 rounds to all 10000 buckets)
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(docs, "doc_id",
        Seq("train" -> 0.99996, "holdout" -> 0.00004))
    }
    // resolution past intRank's modulus would skew every share
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(docs, "doc_id",
        Seq("a" -> 0.5, "b" -> 0.5), resolution = 2000000000)
    }
  }

  test("assignSplits: NULL keys get a NULL split, never the last split") {
    import spark.implicits._
    val df = Seq((Some(1L), "x"), (None, "y"), (Some(2L), "z"))
      .toDF("id", "v")
    val out = Sampling.assignSplits(df, "id",
      Seq("train" -> 0.8, "test" -> 0.2)).collect()
      .map(r => r.getString(1) -> Option(r.getString(2))).toMap
    assert(out("y") === None, "null key must yield a null split")
    assert(out("x").isDefined && out("z").isDefined)
  }

  test("per-stratum rates land near their targets") {
    val f = Map("en" -> 0.3, "fr" -> 0.7)
    val sampled = Sampling.stratified(docs, "doc_id", "lang", f, 0.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // only listed strata survive a zero default
    assert(sampled.keySet.subsetOf(f.keySet))
    f.foreach { case (lang, rate) =>
      val got = sampled.getOrElse(lang, 0L).toDouble / totals(lang)
      assert(math.abs(got - rate) < 0.15, s"$lang: got $got, want ~$rate")
    }
  }

  test("ppsSystematic: exactly k picks, weight-proportional, layout-stable") {
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf001)
      .select("doc_id", "n_chars")
    val k = 100
    val out = Sampling.ppsSystematic(docs, "doc_id", "n_chars", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // systematic invariant: total picks == k, every count ≥ 1
    assert(out.map(_._3).sum === k.toLong)
    assert(out.forall(_._3 >= 1L))
    // expectation bound: |n_picks − k·w/W| < 1 + 1 (a row can straddle
    // two strides) — and heavy rows (w ≥ W/k) are ALWAYS selected
    val W = docs.agg(sum(greatest(col("n_chars"), lit(1L)))).collect()(0).getLong(0)
    val picksBy = out.map(r => r._1 -> r._3).toMap
    docs.collect().foreach { r =>
      val id = r.getLong(0); val w = math.max(r.getLong(1), 1L)
      val expect = k.toDouble * w / W
      val got = picksBy.getOrElse(id, 0L).toDouble
      assert(math.abs(got - expect) <= 2.0, s"doc $id: $got vs $expect")
      if (w * k >= W) assert(picksBy.contains(id), s"heavy doc $id missed")
    }
    // deterministic under repartition
    val out2 = Sampling.ppsSystematic(docs.repartition(7), "doc_id",
        "n_chars", k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out2 === out.toSet)
    // weighted vs uniform: the weighted sample's mean doc length must
    // exceed the corpus mean (longer docs over-represented)
    val meanSel = out.map(_._2.toDouble).sum / out.length
    val meanAll = W.toDouble / docs.count()
    assert(meanSel > meanAll, s"weighting had no effect: $meanSel vs $meanAll")
  }

  test("temperatureMixture: sqrt-compresses shares — giants downsample, " +
      "minnows keep everything") {
    import spark.implicits._
    // 900 'big' vs 100 'small' keys: α = 1/2 target shares are 3:1
    // (√900:√100), so big keeps at rate √100/√900 = 1/3, small at 1.0
    val df = ((1 to 900).map(i => (i.toLong, "big")) ++
      (901 to 1000).map(i => (i.toLong, "small"))).toDF("k", "s")
    val out = Sampling.temperatureMixture(df, "k", "s")
    val rates = out.groupBy("s").agg(first(col("rate")).as("r"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2)))
      .toMap
    assert(rates("small")._1 === 1.0)
    assert(rates("small")._2 === 100L)
    assert(math.abs(rates("big")._1 - 1.0 / 3.0) < 1e-6)
    // hash-noise keep rate concentrates near 300 of 900
    assert(rates("big")._2 > 250L && rates("big")._2 < 350L,
      rates.toString)
    // deterministic: rerun yields the identical sampled set
    val again = Sampling.temperatureMixture(df, "k", "s")
    assert(out.select("k").exceptAll(again.select("k")).isEmpty)
  }

  test("weightDiagnostics: uniform weights give ESS = n; a dominant weight collapses it") {
    import spark.implicits._
    val uni = (1 to 100).map(i => ("uni", 2.5))
    val dom = (1 to 99).map(i => ("dom", 0.01)) :+ (("dom", 1000.0))
    val df = (uni ++ dom).toDF("g", "w")
    val out = Sampling.weightDiagnostics(df, "w", Seq("g"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5))).toMap
    val u = out("uni")
    assert(u._1 === 100L && u._2 === 0L)
    assert(u._3 === 100.0 && u._4 === 1.0 && u._5 === 0.01)
    val d = out("dom")
    // ESS = (0.99 + 1000)^2 / (99 * 1e-4 + 1e6) ~= 1.00: one row IS
    // the dataset
    assert(d._3 < 1.01, s"dominant ESS: ${d._3}")
    assert(d._5 > 0.999, s"max share: ${d._5}")
    // negative weights are dropped and counted, not folded
    val b = Sampling.weightDiagnostics(
      Seq(("bad", 1.0), ("bad", -3.0), ("bad", 2.0)).toDF("g", "w"),
      "w", Seq("g")).collect()(0)
    assert(b.getLong(1) === 2L && b.getLong(2) === 1L)
  }

  test("waterfill: hand-computed level, ties, and over-budget cases") {
    import spark.implicits._
    // {a:10, b:50, c:100}, B=100: a funded whole, λ = (100−10)/2 = 45
    val d1 = Seq(("a", 10L), ("b", 50L), ("c", 100L)).toDF("dom", "av")
    val r1 = Sampling.waterfill(d1, "dom", "av", budget = 100L)
      .collect().map(x => x.getString(0) ->
        (x.getDouble(2), x.getInt(3))).toMap
    assert(r1("a") === ((10.0, 1)), r1.toString)
    assert(r1("b") === ((45.0, 0)), r1.toString)
    assert(r1("c") === ((45.0, 0)), r1.toString)
    assert(math.abs(r1.values.map(_._1).sum - 100.0) < 1e-9)
    // all-tied and nothing fully funded: λ = B/D
    val d2 = Seq(("a", 30L), ("b", 30L), ("c", 30L)).toDF("dom", "av")
    val r2 = Sampling.waterfill(d2, "dom", "av", budget = 60L)
      .collect().map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r2.values.forall(_ === 20.0), r2.toString)
    // budget covers everything: taken whole, all funded
    val r3 = Sampling.waterfill(d1, "dom", "av", budget = 1000L)
      .collect().map(x => x.getString(0) ->
        (x.getDouble(2), x.getInt(3))).toMap
    assert(r3 === Map("a" -> ((10.0, 1)), "b" -> ((50.0, 1)),
      "c" -> ((100.0, 1))), r3.toString)
  }

  test("assignSplitsLeakageSafe: duplicate docs share a cluster rep " +
    "and can never straddle splits; unique docs keep id-keyed splits") {
    import spark.implicits._
    val splits = Seq("train" -> 0.8, "test" -> 0.2)
    // docs 10/11/12 are the same text modulo case/whitespace; 13/14
    // unique. Many salted trials would be needed for a straddle to be
    // LIKELY per-pair, so plant 30 duplicate pairs with spread ids —
    // under id-keyed assignment at least one pair straddles
    // (probability of none < (0.8^2+0.2^2)^30 ~ 1e-5 under the hash).
    val dups = (0 until 30).flatMap { k =>
      Seq((100L + k, s"shared body number $k"),
          (500L + k, s"  SHARED   body Number $k ".toLowerCase.capitalize))
    }
    val docs = (Seq((10L, "Alpha  Beta"), (11L, "alpha beta"),
      (12L, "ALPHA\tBETA"), (13L, "unique one"), (14L, "unique two"))
      ++ dups).toDF("doc_id", "text")
    val r = Sampling.assignSplitsLeakageSafe(docs, "doc_id", "text",
      splits).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("cluster_rep"), x.getAs[String]("split"))).toMap
    // identical normalized text -> one rep (the min id), one split
    assert(r(10L)._1 === 10L && r(11L)._1 === 10L && r(12L)._1 === 10L)
    assert(Set(r(10L)._2, r(11L)._2, r(12L)._2).size === 1,
      "duplicates must never straddle the split boundary")
    (0 until 30).foreach { k =>
      assert(r(100L + k)._2 === r(500L + k)._2,
        s"planted pair $k straddled: ${r(100L + k)} vs ${r(500L + k)}")
    }
    // a unique doc is its own rep and matches plain assignSplits
    assert(r(13L)._1 === 13L)
    val plain = Sampling.assignSplits(docs.filter($"doc_id" >= 13L &&
        $"doc_id" <= 14L), "doc_id", splits)
      .collect().map(x => x.getLong(0) -> x.getString(2)).toMap
    assert(r(13L)._2 === plain(13L) && r(14L)._2 === plain(14L))
  }
}
