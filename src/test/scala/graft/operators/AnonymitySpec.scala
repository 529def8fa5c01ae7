package graft.operators

import graft.SparkSpec

class AnonymitySpec extends SparkSpec {

  import spark.implicits._

  // three classes: (US, A) size 4 / 2 distinct salaries; (US, B)
  // size 2 / constant salary; (DE, A) size 1
  private val df = Seq(
    ("US", "A", 10.0), ("US", "A", 10.0), ("US", "A", 20.0), ("US", "A", 20.0),
    ("US", "B", 30.0), ("US", "B", 30.0),
    ("DE", "A", 40.0)).toDF("country", "seg", "salary")

  private def audit(k: Int) =
    Anonymity.audit(df, Seq("country", "seg"), "salary", k)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getInt(4))).toMap

  test("class sizes, l-diversity, and the k flag are exact") {
    val out = audit(3)
    assert(out(("US", "A")) === ((4L, 2L, 0)))
    assert(out(("US", "B")) === ((2L, 1L, 1))) // big enough? no: 2 < 3
    assert(out(("DE", "A")) === ((1L, 1L, 1)))
  }

  test("k boundary is strict: class_size == k is safe") {
    val out = audit(2)
    assert(out(("US", "B"))._3 === 0) // size 2, k=2 → not at risk
    assert(out(("DE", "A"))._3 === 1)
  }

  test("l-diversity catches the constant-sensitive class k misses") {
    val out = audit(2)
    // (US, B) passes k=2 yet shelters a single salary value
    assert(out(("US", "B"))._1 >= 2 && out(("US", "B"))._2 === 1L)
  }

  test("noisedCounts: deterministic, visible noise, one row per group") {
    import spark.implicits._
    val ev = graft.Tables.events(spark, sf0001)
    val rel = Anonymity.noisedCounts(ev, Seq("event_type"), epsilon = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val truth = ev.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rel.keySet === truth.keySet)
    // noise is actually applied (no group releases its exact count)...
    assert(rel.forall { case (k, v) => v != truth(k).toDouble })
    // ...but bounded sanely for ε=0.5 (P(|L| > 20) ≈ e⁻¹⁰)
    assert(rel.forall { case (k, v) => math.abs(v - truth(k)) < 40.0 })
    // re-publication is stable under any layout
    val again = Anonymity.noisedCounts(ev.repartition(7),
        Seq("event_type"), epsilon = 0.5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(again === rel)
    // more privacy (smaller ε) ⇒ scaled-up noise, same sign (same u)
    val tighter = Anonymity.noisedCounts(ev, Seq("event_type"), epsilon = 0.1)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rel.foreach { case (k, v) =>
      val n1 = v - truth(k); val n2 = tighter(k) - truth(k)
      assert(math.abs(n2 / n1 - 5.0) < 1e-3, s"$k: $n1 vs $n2")
    }
  }

  test("multi-column groups: the \\u0001 separator keeps tuples distinct") {
    // concat_ws("") would conflate ("ab","c") with ("a","bc") — the two
    // cells would then draw IDENTICAL, correlated noise. The \u0001 (U+0001)
    // separator (matching the SQL twin's chr(1)) must keep them apart.
    val t = Seq(("ab", "c"), ("a", "bc"), ("ab", "c"))
      .toDF("x", "y")
    val out = Anonymity.noisedCounts(t, Seq("x", "y"), epsilon = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(out.size === 2)
    val nAb = out(("ab", "c")) - 2.0  // noise drawn by each tuple
    val nA = out(("a", "bc")) - 1.0
    assert(nAb !== nA, "conflated tuples drew identical noise")
    // and the draw is deterministic under relayout
    val again = Anonymity.noisedCounts(t.repartition(3), Seq("x", "y"),
        epsilon = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(again === out)
  }

  test("Laplace draw is clamped: no group can release ±Infinity") {
    // sweep many salts over many groups — with the [1e-12, 1−1e-12]
    // clamp the inverse CDF is finite for EVERY u the hash can emit
    val ev = graft.Tables.events(spark, sf0001)
    (1 to 20).foreach { salt =>
      val vals = Anonymity.noisedCounts(ev, Seq("event_type"),
          epsilon = 0.5, salt = salt)
        .collect().map(_.getDouble(1))
      assert(vals.forall(v => !v.isNaN && !v.isInfinite),
        s"salt $salt produced a non-finite release")
    }
  }

  test("approx mode tracks exact diversity on real data") {
    val cust = spark.read.parquet(s"$sf001/customer.parquet")
    // single quasi column → (c_nationkey, class_size, l_diversity, at_risk)
    val exact = Anonymity.audit(cust, Seq("c_nationkey"), "c_acctbal", 10)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    val approx = Anonymity.audit(cust, Seq("c_nationkey"), "c_acctbal", 10,
      approxDiversity = true)
      .collect().map(r => r.getInt(0) -> r.getLong(2)).toMap
    assert(exact.keySet === approx.keySet)
    // approx_count_distinct's default rsd is 5% (one σ) — allow 2σ
    exact.foreach { case (k, v) =>
      assert(math.abs(approx(k) - v) <= math.max(3L, (v * 0.10).toLong),
        s"nation $k: approx ${approx(k)} vs exact $v")
    }
  }

  test("tCloseness: hand-computed ordered EMD on a 3-value axis") {
    import spark.implicits._
    // global {1:2, 2:1, 3:1}; class A = two 1s (p−q cum 0.5, 0.25, 0
    // → Σ|cum|/(m−1) = 0.375), class B = one 2 + one 3 (mirror)
    val df = Seq(("A", 1), ("A", 1), ("B", 2), ("B", 3))
      .toDF("cls", "v")
    val r = Anonymity.tCloseness(df, Seq("cls"), "v", threshold = 0.3)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getInt(4))).toMap
    assert(r("A") === ((2L, 3L, 0.375, 1)), r.toString)
    assert(r("B") === ((2L, 3L, 0.375, 1)), r.toString)
  }

  test("tCloseness: class mirroring the global distribution scores 0") {
    import spark.implicits._
    // both classes hold the same {1, 2, 3} → every class ≡ global
    val df = Seq(("A", 1), ("A", 2), ("A", 3), ("B", 1), ("B", 2),
      ("B", 3)).toDF("cls", "v")
    val r = Anonymity.tCloseness(df, Seq("cls"), "v", threshold = 0.1)
      .collect()
    assert(r.forall(_.getDouble(3) === 0.0), r.mkString(","))
    assert(r.forall(_.getInt(4) === 0))
  }

  test("tCloseness: single-value axis guards the m−1 division") {
    import spark.implicits._
    val df = Seq(("A", 7), ("B", 7), ("B", 7)).toDF("cls", "v")
    val r = Anonymity.tCloseness(df, Seq("cls"), "v", threshold = 0.1)
      .collect()
    assert(r.length === 2 && r.forall(_.getDouble(3) === 0.0))
  }

  test("tCloseness: null quasi/sensitive rows are excluded, not joined") {
    import spark.implicits._
    val df = Seq((Some("A"), Some(1)), (Some("A"), None),
      (None, Some(2)), (Some("B"), Some(2))).toDF("cls", "v")
    val r = Anonymity.tCloseness(df, Seq("cls"), "v", threshold = 0.9)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(r === Map("A" -> 1L, "B" -> 1L), r.toString)
  }

  test("noisedSums: one whale is clamped to the cap before release") {
    import spark.implicits._
    // group g: unit u1 contributes 10 000 (clamped to 100), u2 = 50
    val df = Seq(("g", "u1", 6000.0), ("g", "u1", 4000.0),
      ("g", "u2", 50.0)).toDF("grp", "unit", "v")
    val out = Anonymity.noisedSums(df, Seq("grp"), "unit", "v",
      cap = 100.0, epsilon = 1000.0) // huge ε → negligible noise
      .head.getDouble(1)
    assert(math.abs(out - 150.0) < 1.0,
      s"clamped release ≈ 150, got $out")
    // without bounding the whale would publish ≈ 10 050
    assert(out < 1000.0, "the whale's tail must not leak")
  }

  test("noisedSums: deterministic across re-runs, noise scales with cap") {
    import spark.implicits._
    val df = Seq(("a", "u1", 10.0), ("b", "u2", 10.0))
      .toDF("grp", "unit", "v")
    val r1 = Anonymity.noisedSums(df, Seq("grp"), "unit", "v", 100.0, 0.5)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val r2 = Anonymity.noisedSums(df, Seq("grp"), "unit", "v", 100.0, 0.5)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r1 === r2, "re-publication must not wobble")
    // larger cap → wider Laplace (b = cap/ε) on the same hash draw
    val wide = Anonymity.noisedSums(df, Seq("grp"), "unit", "v",
      1000.0, 0.5).collect().map(x => x.getString(0) -> x.getDouble(1))
      .toMap
    assert(math.abs(math.abs(wide("a") - 10.0) -
      10 * math.abs(r1("a") - 10.0)) < 1e-6,
      "noise is linear in the sensitivity")
  }

  test("noisedHistogram: dense spine, empty bins noised, deterministic, " +
    "crop-arithmetic-safe edges") {
    import spark.implicits._
    // values land in bins 0 and 2 of [0,40)/4; bins -1,1,3,4 are empty
    val df = Seq(1.0, 2.0, 25.0).toDF("v")
    val r1 = Anonymity.noisedHistogram(df, "v", 0.0, 40.0, 4, 0.5)
      .collect().map(x => x.getLong(0) ->
        (if (x.isNullAt(1)) None else Some(x.getDouble(1)), x.getDouble(3)))
      .toMap
    assert(r1.keySet === Set(-1L, 0L, 1L, 2L, 3L, 4L),
      "every bin including empty and under/overflow must be present")
    // empty bins carry noise too (their absence or exact zero leaks)
    assert(r1(1L)._2 !== 0.0)
    assert(r1(-1L)._1 === None && r1(0L)._1 === Some(0.0))
    val r2 = Anonymity.noisedHistogram(df, "v", 0.0, 40.0, 4, 0.5)
      .collect().map(x => x.getLong(0) -> x.getDouble(3)).toMap
    assert(r1.view.mapValues(_._2).toMap === r2,
      "re-publication must not wobble")
    // noised counts stay near the truth at this epsilon (b = 2)
    assert(math.abs(r1(0L)._2 - 2.0) < 20.0)
    assert(math.abs(r1(2L)._2 - 1.0) < 20.0)
  }

  test("noisedQuantiles: post-processed CDF tracks the true quantiles " +
    "and stays within the histogram edges") {
    import spark.implicits._
    // uniform-ish mass over [0, 40): true median ~20
    val df = (0 until 400).map(i => (i % 40).toDouble).toDF("v")
    val r = Anonymity.noisedQuantiles(df, "v", 0.0, 40.0, 8, 0.5,
      Seq(0.0, 0.5, 1.0)).collect()
      .map(x => x.getDouble(0) -> x.getDouble(1)).toMap
    assert(r.keySet === Set(0.0, 0.5, 1.0))
    assert(r.values.forall(q => q >= 0.0 && q <= 40.0),
      "quantiles must stay inside [lo, hi]: " + r)
    assert(math.abs(r(0.5) - 20.0) < 6.0,
      s"noised median ${r(0.5)} strayed far from 20 at epsilon=0.5")
    // deterministic re-publication
    val r2 = Anonymity.noisedQuantiles(df, "v", 0.0, 40.0, 8, 0.5,
      Seq(0.0, 0.5, 1.0)).collect()
      .map(x => x.getDouble(0) -> x.getDouble(1)).toMap
    assert(r === r2)
  }

  test("Gaussian multi-column groups: \\u0001 separator keeps tuples " +
    "distinct (the round-13 \"\"-separator defect)") {
    import spark.implicits._
    // concat_ws("") conflates ("ab","c") with ("a","bc") — both cells
    // would then draw IDENTICAL correlated Gaussian noise, and the
    // engine would diverge from the chr(1) SQL twin. Pin the fix.
    val t = Seq(("ab", "c"), ("a", "bc"), ("ab", "c")).toDF("x", "y")
    val out = Anonymity.noisedCountsGaussian(t, Seq("x", "y"),
        epsilon = 0.5, delta = 1e-6)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(out.size === 2)
    val nAb = out(("ab", "c")) - 2.0
    val nA = out(("a", "bc")) - 1.0
    assert(nAb !== nA, "conflated tuples drew identical Gaussian noise")
    // deterministic under relayout (re-publication must not wobble)
    val again = Anonymity.noisedCountsGaussian(t.repartition(3),
        Seq("x", "y"), epsilon = 0.5, delta = 1e-6)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(again === out)
  }

  test("Gaussian sums: multi-column cells draw distinct noise too") {
    import spark.implicits._
    val t = Seq(("ab", "c", "u1", 10.0), ("a", "bc", "u2", 10.0))
      .toDF("x", "y", "unit", "v")
    val out = Anonymity.noisedSumsGaussian(t, Seq("x", "y"), "unit", "v",
        cap = 100.0, epsilon = 0.5, delta = 1e-6)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(out.size === 2)
    assert(out(("ab", "c")) - 10.0 !== out(("a", "bc")) - 10.0,
      "conflated cells drew identical noise")
  }

  test("Gaussian calibration refuses epsilon >= 1 (analytic bound range)") {
    import spark.implicits._
    // sigma = sqrt(2 ln(1.25/delta))/epsilon is only (ε,δ)-DP for
    // ε < 1 — beyond that it UNDER-noises while still claiming DP, so
    // the release must fail loudly instead of publishing.
    val t = Seq(("a", "u1", 1.0)).toDF("g", "unit", "v")
    intercept[IllegalArgumentException] {
      Anonymity.noisedCountsGaussian(t, Seq("g"), epsilon = 1.0,
        delta = 1e-6)
    }
    intercept[IllegalArgumentException] {
      Anonymity.noisedSumsGaussian(t, Seq("g"), "unit", "v", cap = 10.0,
        epsilon = 1.5, delta = 1e-6)
    }
    intercept[IllegalArgumentException] {
      Anonymity.noisedHistogramGaussian(t, "v", 0.0, 10.0, 4,
        epsilon = 2.0, delta = 1e-6)
    }
    // and the boundary-inside value still works
    assert(Anonymity.noisedCountsGaussian(t, Seq("g"), epsilon = 0.999,
      delta = 1e-6).count() === 1L)
  }
}
