package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ExperimentSpec extends SparkSpec {

  import spark.implicits._

  test("cuped: correlated covariate slashes variance; uncorrelated doesn't") {
    // y ≈ 2x + small deterministic wiggle → corr² ≈ 1 → big reduction
    val correlated = (1 to 400).map { i =>
      val x = BigDecimal(i)
      val y = BigDecimal(2 * i) + BigDecimal((i * 7919) % 11) // wiggle 0..10
      (x, y)
    }.toDF("x", "y")
      .select(col("x").cast("decimal(18,2)").as("x"),
        col("y").cast("decimal(18,2)").as("y"))
    val r = Experiment.cuped(correlated, "x", "y").collect()(0)
    assert(r.getLong(0) === 400L)
    assert(math.abs(r.getDouble(1) - 2.0) < 0.01, s"theta ${r.getDouble(1)}")
    assert(r.getDouble(4) > 99.0, s"reduction ${r.getDouble(4)}")
    // x independent of y (x cycles 0/1, y cycles with coprime period):
    // θ near 0, reduction near 0 — CUPED never hurts, and never lies
    val uncorrelated = (1 to 400).map(i =>
      (BigDecimal(i % 2), BigDecimal((i * 13) % 7))).toDF("x", "y")
      .select(col("x").cast("decimal(18,2)").as("x"),
        col("y").cast("decimal(18,2)").as("y"))
    val u = Experiment.cuped(uncorrelated, "x", "y").collect()(0)
    assert(u.getDouble(4) >= 0.0 && u.getDouble(4) < 5.0,
      s"uncorrelated reduction ${u.getDouble(4)}")
  }

  test("variantOf: deterministic, exhaustive, roughly balanced") {
    val keys = spark.range(0, 10000).toDF("k")
    val v = keys.select(Experiment.variantOf(col("k"),
        Seq("control", "treatment"), salt = 17).as("v"))
      .groupBy("v").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(v.keySet === Set("control", "treatment"))
    assert(v.values.forall(n => n > 4500 && n < 5500), v.toString)
  }

  test("SRM: a broken split is flagged, a designed split is not") {
    import spark.implicits._
    // designed 50/50, observed 5000/5000 → χ² = 0
    val even = (Seq.fill(5000)("control") ++ Seq.fill(5000)("treatment"))
      .toDF("variant")
    val ok = Experiment.srmCheck(even, "variant",
        Map("control" -> 0.5, "treatment" -> 0.5))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(ok("control").getDouble(ok("control").fieldIndex("chi2")) === 0.0)
    assert(ok("control").getDouble(ok("control").fieldIndex("n_expected"))
      === 5000.0)
    // logging bug drops 4% of treatment: 5000/4800 → χ² ≈ 4.08 > 3.84
    val broken = (Seq.fill(5000)("control") ++ Seq.fill(4800)("treatment"))
      .toDF("variant")
    val bad = Experiment.srmCheck(broken, "variant",
        Map("control" -> 0.5, "treatment" -> 0.5))
      .collect().map(r => r.getString(0) -> r).toMap
    val chi2 = bad("control").getDouble(bad("control").fieldIndex("chi2"))
    assert(chi2 > 3.84, s"broken split not flagged: chi2=$chi2")
    // hand check: e = 4900 each; (100² + 100²)/4900 = 4.081633
    assert(chi2 === 4.081633)
    // contributions and totals agree across rows
    assert(bad("treatment").getDouble(
      bad("treatment").fieldIndex("chi2")) === chi2)
    assert(bad("control").getLong(
      bad("control").fieldIndex("n_total")) === 9800L)
  }

  test("SRM: uneven designed splits (90/10) evaluate against THEIR shares") {
    import spark.implicits._
    val canary = (Seq.fill(9000)("main") ++ Seq.fill(1000)("canary"))
      .toDF("variant")
    val r = Experiment.srmCheck(canary, "variant",
        Map("main" -> 0.9, "canary" -> 0.1))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("main").getDouble(r("main").fieldIndex("chi2")) === 0.0)
    assert(r("canary").getDouble(r("canary").fieldIndex("n_expected"))
      === 1000.0)
  }

  test("SRM: zero-observed designed arm contributes; rogue arm is flagged") {
    import spark.implicits._
    // designed 50/50 but treatment logged ZERO rows: the dead arm must
    // still contribute (0 − E)²/E — χ² = (1000-500)²/500 + (0-500)²/500
    // = 1000, not the 500 a counts-only join would report
    val dead = Seq.fill(1000)("control").toDF("variant")
    val d = Experiment.srmCheck(dead, "variant",
        Map("control" -> 0.5, "treatment" -> 0.5))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(d.keySet === Set("control", "treatment"))
    assert(d("treatment").getLong(d("treatment").fieldIndex("n_obs")) === 0L)
    assert(d("treatment").getLong(d("treatment").fieldIndex("designed")) === 1L)
    assert(d("control").getDouble(d("control").fieldIndex("chi2")) === 1000.0)
    // a variant observed in data but absent from the design: emitted
    // with designed = 0 and null expectation, units still in n_total
    val rogue = (Seq.fill(500)("control") ++ Seq.fill(500)("treatment") ++
      Seq.fill(10)("oops")).toDF("variant")
    val g = Experiment.srmCheck(rogue, "variant",
        Map("control" -> 0.5, "treatment" -> 0.5))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(g.keySet === Set("control", "treatment", "oops"))
    assert(g("oops").getLong(g("oops").fieldIndex("designed")) === 0L)
    assert(g("oops").isNullAt(g("oops").fieldIndex("n_expected")))
    assert(g("oops").isNullAt(g("oops").fieldIndex("contrib")))
    assert(g("control").getLong(g("control").fieldIndex("n_total")) === 1010L)
    // designed arms are tested against shares of the FULL traffic
    // (1010·0.5 = 505), so the rogue arm's drain shows up as misfit
    assert(g("control").getDouble(g("control").fieldIndex("n_expected"))
      === 505.0)
    assert(g("oops").getDouble(g("oops").fieldIndex("chi2")) ===
      g("control").getDouble(g("control").fieldIndex("chi2")))
  }

  test("O'Brien-Fleming: hand-computed boundary crossings across looks") {
    import spark.implicits._
    // look 1: a={10,12}, b={13,15} → z = -3/√2 = -2.121320; the K=2
    // OBF boundary b₁ = 2.04·√2 = 2.884996 → NOT crossed (a naive
    // 1.96 peeker would have stopped here — the inflation OBF fixes).
    // look 2 doubles both samples: z = -3/√(2/3) = -3.674235 against
    // b₂ = 2.04 → crossed.
    val rows = Seq(
      (1, "a", 10), (1, "a", 12), (1, "b", 13), (1, "b", 15),
      (2, "a", 10), (2, "a", 12), (2, "b", 13), (2, "b", 15))
      .toDF("look", "variant", "v")
      .select(col("look"), col("variant"),
        col("v").cast("decimal(18,2)").as("m"))
    val out = Experiment.obrienFleming(rows, "look", "variant", "m",
        "a", "b")
      .collect().map(r => r.getLong(r.fieldIndex("k")) -> r).toMap
    assert(out.keySet === Set(1L, 2L))
    val l1 = out(1L); val l2 = out(2L)
    assert(l1.getDouble(l1.fieldIndex("z")) === -2.12132)
    assert(l1.getDouble(l1.fieldIndex("boundary")) === 2.884996)
    assert(l1.getLong(l1.fieldIndex("crossed")) === 0L)
    assert(l2.getDouble(l2.fieldIndex("z")) === -3.674235)
    assert(l2.getDouble(l2.fieldIndex("boundary")) === 2.04)
    assert(l2.getLong(l2.fieldIndex("crossed")) === 1L)
    assert(l2.getLong(l2.fieldIndex("n_a")) === 4L)
    // a look where one arm has a single unit reports z = 0, no NaN
    val thin = Seq((1, "a", 10), (1, "b", 11), (1, "b", 12))
      .toDF("look", "variant", "v")
      .select(col("look"), col("variant"),
        col("v").cast("decimal(18,2)").as("m"))
    val t = Experiment.obrienFleming(thin, "look", "variant", "m",
      "a", "b").head()
    assert(t.getDouble(t.fieldIndex("z")) === 0.0)
  }

  test("Benjamini-Hochberg: step-up keeps a p above alpha/m; accurate Phi") {
    import spark.implicits._
    // z → two-sided p: 3.30→0.000967, 2.49→0.012774, 2.05→0.040364,
    // 0.10→0.920344; at alpha=0.05, m=4 the thresholds are .0125,
    // .025, .0375, .05 → ranks 1,2 cross (rank 2 crosses even though
    // p₂ > α/m — the step-up property Bonferroni lacks), 3,4 don't
    val zs = Seq(("m1", 3.30), ("m2", -2.49), ("m3", 2.05), ("m4", 0.10))
      .toDF("metric", "z")
    val out = Experiment.benjaminiHochberg(zs, "metric", "z")
      .collect().map(r => r.getString(0) -> r).toMap
    def p(m: String) = out(m).getDouble(out(m).fieldIndex("p"))
    assert(math.abs(p("m1") - 0.000967) < 2e-6)
    assert(math.abs(p("m2") - 0.012774) < 2e-6)
    assert(math.abs(p("m3") - 0.040364) < 2e-6)
    assert(math.abs(p("m4") - 0.920344) < 2e-6)
    def sig(m: String) = out(m).getLong(out(m).fieldIndex("significant"))
    assert(sig("m1") === 1L && sig("m2") === 1L)
    assert(sig("m3") === 0L && sig("m4") === 0L)
    assert(out("m2").getLong(out(Seq("m2").head).fieldIndex("rank")) === 2L)
    // all-null case: nothing significant
    val none = Experiment.benjaminiHochberg(
      Seq(("a", 0.5), ("b", 1.0)).toDF("metric", "z"), "metric", "z")
    assert(none.filter(col("significant") === 1).count() === 0)
  }

  test("Mann-Whitney U: hand fixture with ties; symmetric null") {
    import spark.implicits._
    // A={1,3,5}, B={2,3,6}: U_A = 0 + (1+0.5) + 2 = 3.5; tie group
    // t=2 at value 3 -> var = 9/12*((7) - 6/30) = 5.1;
    // z = (3.5-4.5)/sqrt(5.1) = -0.442807
    val pu = Seq(("a", 1), ("a", 3), ("a", 5), ("b", 2), ("b", 3), ("b", 6))
      .toDF("variant", "v")
      .select(col("variant"), col("v").cast("decimal(18,2)").as("m"))
    val r = Experiment.mannWhitney(pu, "variant", "m", "a", "b").head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getDouble(2) === 3.5)
    assert(r.getDouble(3) === -0.442807)
    // identical distributions -> U = n_a*n_b/2, z = 0
    val same = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)).toDF("variant", "v")
      .select(col("variant"), col("v").cast("decimal(18,2)").as("m"))
    val rs = Experiment.mannWhitney(same, "variant", "m", "a", "b").head()
    assert(rs.getDouble(2) === 2.0 && rs.getDouble(3) === 0.0)
  }

  test("KS two-sample: hand fixture; identical null; decisive rejection") {
    import spark.implicits._
    // A={1,3,5}, B={2,3,6}: ECDF diffs 1/3,0,0,1/3,0 -> D = 1/3;
    // lambda = (1/3)*sqrt(9/6) = 0.408248 < 1.358 -> no rejection
    val pu = Seq(("a", 1), ("a", 3), ("a", 5), ("b", 2), ("b", 3), ("b", 6))
      .toDF("variant", "v")
      .select(col("variant"), col("v").cast("decimal(18,2)").as("m"))
    val r = Experiment.ksTest(pu, "variant", "m", "a", "b").head()
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getDouble(2) === 0.333333)
    assert(r.getDouble(3) === 0.408248)
    assert(r.getLong(4) === 0L)
    // identical distributions -> D = 0
    val same = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2)).toDF("variant", "v")
      .select(col("variant"), col("v").cast("decimal(18,2)").as("m"))
    val rs = Experiment.ksTest(same, "variant", "m", "a", "b").head()
    assert(rs.getDouble(2) === 0.0 && rs.getLong(4) === 0L)
    // fully separated at n=20+20: D = 1, lambda = sqrt(10) -> reject
    val sep = ((1 to 20).map(i => ("a", i)) ++
      (1 to 20).map(i => ("b", 100 + i))).toDF("variant", "v")
      .select(col("variant"), col("v").cast("decimal(18,2)").as("m"))
    val rx = Experiment.ksTest(sep, "variant", "m", "a", "b").head()
    assert(rx.getDouble(2) === 1.0 && rx.getLong(4) === 1L)
  }

  test("KS: null metrics are excluded from the axis") {
    import spark.implicits._
    val pu = Seq(("a", Some(1)), ("a", Some(3)), ("a", None),
      ("b", Some(1)), ("b", Some(3)), ("b", None)).toDF("variant", "v")
      .select(col("variant"), col("v").cast("decimal(18,2)").as("m"))
    val r = Experiment.ksTest(pu, "variant", "m", "a", "b").head()
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L)
    assert(r.getDouble(2) === 0.0)
  }

  test("KS grid mode: bounded axis, drift within one grid cell of exact") {
    import spark.implicits._
    // shifted uniform grids: exact D = 0.05; a 64-level quantization
    // can move D by at most the mass inside one cell (~1.6%)
    val pu = ((1 to 1000).map(i => ("a", i)) ++
      (1 to 1000).map(i => ("b", i + 50))).toDF("variant", "v")
      .select(col("variant"), col("v").cast("decimal(18,2)").as("m"))
    val ex = Experiment.ksTest(pu, "variant", "m", "a", "b").head()
    val gr = Experiment.ksTest(pu, "variant", "m", "a", "b",
      exact = false, gridLevels = 64).head()
    assert(ex.getDouble(2) === 0.05)
    assert(math.abs(gr.getDouble(2) - ex.getDouble(2)) <= 0.02,
      s"grid D ${gr.getDouble(2)} vs exact ${ex.getDouble(2)}")
  }

  test("chi-square conversion: hand 2x2; degenerate margins guard to 0") {
    import spark.implicits._
    // 30/100 vs 45/100 converted: chi2 = 200*(30*55-70*45)^2/denoms = 4.8
    val rows = (Seq.fill(30)(("a", 1)) ++ Seq.fill(70)(("a", 0)) ++
      Seq.fill(45)(("b", 1)) ++ Seq.fill(55)(("b", 0)))
      .toDF("variant", "success")
    val r = Experiment.chiSquareConversion(rows, "variant", "success",
      "a", "b").head()
    assert(r.getLong(0) === 30L && r.getLong(1) === 70L)
    assert(r.getDouble(4) === 0.3 && r.getDouble(5) === 0.45)
    assert(r.getDouble(6) === 4.8) // > 3.84: flags at 5%
    // everyone converts -> a zero column; guard yields 0, not NaN
    val allConv = Seq(("a", 1), ("b", 1)).toDF("variant", "success")
    val g = Experiment.chiSquareConversion(allConv, "variant", "success",
      "a", "b").head()
    assert(g.getDouble(6) === 0.0)
  }

  test("delta-method ratio CI: hand fixture; constant ratio -> zero se") {
    import spark.implicits._
    // units (x,y) = (1,2),(3,4),(2,4): R = 6/10 = 0.6;
    // varX=1, varY=4/3, cov=2/3 -> se = sqrt((1-0.8+0.48)/(3*(10/3)^2))
    val pu = Seq((1L, 2L), (3L, 4L), (2L, 4L)).toDF("x", "y")
    val r = Experiment.ratioMetricCi(pu, "x", "y").head()
    assert(r.getLong(0) === 3L)
    assert(r.getDouble(1) === 0.6)
    assert(r.getDouble(2) === 0.091652)
    assert(r.getDouble(3) === 0.420366 && r.getDouble(4) === 0.779634)
    // every unit has the same x/y ratio -> the ratio is certain
    val const = Seq((1L, 2L), (2L, 4L), (3L, 6L)).toDF("x", "y")
    val c = Experiment.ratioMetricCi(const, "x", "y").head()
    assert(c.getDouble(1) === 0.5 && c.getDouble(2) === 0.0)
    assert(c.getDouble(3) === 0.5 && c.getDouble(4) === 0.5)
  }

  test("mSPRT: no effect keeps p at 1; a real effect drives p below alpha") {
    import org.apache.spark.sql.functions.col
    // arms identical per look -> delta = 0, lambda < 1, p stays 1
    val nullRows = (1 to 5).flatMap(look => (1 to 20).flatMap(i =>
      Seq((look.toLong, "a", BigDecimal(10 + i % 3)),
        (look.toLong, "b", BigDecimal(10 + i % 3)))))
    val pNull = Experiment.msprt(nullRows.toDF("look", "variant", "m"),
      "look", "variant", "m", "a", "b", tau2 = 25.0)
      .orderBy(col("k")).collect()
    assert(pNull.forall(_.getDouble(5) === 1.0), pNull.mkString(";"))
    // a 50-point gap with modest noise: evidence accumulates and the
    // running-min p crosses alpha
    val effRows = (1 to 6).flatMap(look => (1 to 25).flatMap(i =>
      Seq((look.toLong, "a", BigDecimal(100 + i % 5)),
        (look.toLong, "b", BigDecimal(50 + i % 5)))))
    val pEff = Experiment.msprt(effRows.toDF("look", "variant", "m"),
      "look", "variant", "m", "a", "b", tau2 = 25.0)
      .orderBy(col("k")).collect()
    assert(pEff.last.getDouble(5) <= 0.05, s"final p: ${pEff.last}")
    assert(pEff.last.getLong(6) === 1L)
    // always-valid p is monotone nonincreasing in the look index
    val ps = pEff.map(_.getDouble(5))
    assert(ps.zip(ps.tail).forall { case (x, y) => y <= x + 1e-12 },
      ps.mkString(","))
    // looks with < 2 units per arm carry no information
    val tiny = Seq((1L, "a", BigDecimal(5)), (1L, "b", BigDecimal(9)))
      .toDF("look", "variant", "m")
    val t = Experiment.msprt(tiny, "look", "variant", "m", "a", "b", 25.0)
      .collect()(0)
    assert(t.getDouble(5) === 1.0)
  }

  test("diffInDiff: hand-computed 2x2 nets out trend and group gap") {
    // cell means: t_pre 2, t_post 6, c_pre 3, c_post 4 →
    // diff_pre = −1, diff_post = 2, DiD = 3; each cell var 2, n 2 →
    // varN = 1 each → se = 2, t = 1.5
    val rows = Seq(("t", "pre", 1), ("t", "pre", 3),
      ("t", "post", 5), ("t", "post", 7),
      ("c", "pre", 2), ("c", "pre", 4),
      ("c", "post", 3), ("c", "post", 5))
      .toDF("grp", "period", "m0")
      .select(col("grp"), col("period"),
        col("m0").cast("decimal(18,2)").as("m"))
    val r = Experiment.diffInDiff(rows, "grp", "period", "m",
      "t", "c", "pre", "post").collect()(0)
    assert((0 to 3).forall(r.getLong(_) === 2L))
    assert(r.getDouble(8) === -1.0 && r.getDouble(9) === 2.0)
    assert(r.getDouble(10) === 3.0, s"did ${r.getDouble(10)}")
    assert(r.getDouble(11) === 2.0, s"se ${r.getDouble(11)}")
    assert(r.getDouble(12) === 1.5, s"t ${r.getDouble(12)}")
  }

  test("diffInDiff: a pure common trend reads as zero effect") {
    // both groups move +10 pre→post; the naive post-diff would read
    // the standing gap (5), the naive pre/post would read the trend
    // (10) — DiD reads 0
    val rows = Seq(("t", "pre", 15), ("t", "pre", 17),
      ("t", "post", 25), ("t", "post", 27),
      ("c", "pre", 10), ("c", "pre", 12),
      ("c", "post", 20), ("c", "post", 22))
      .toDF("grp", "period", "m0")
      .select(col("grp"), col("period"),
        col("m0").cast("decimal(18,2)").as("m"))
    val r = Experiment.diffInDiff(rows, "grp", "period", "m",
      "t", "c", "pre", "post").collect()(0)
    assert(r.getDouble(10) === 0.0, s"did ${r.getDouble(10)}")
    assert(r.getDouble(8) === 5.0 && r.getDouble(9) === 5.0)
  }

  test("yuenTrimmedT: hand-computed trim, winsorized variance, and " +
    "outlier immunity") {
    // a = {0,1,2,3,100}, b = {0,1,2,3,4}, trim 0.2 → k = 1 each side:
    // both keep {1,2,3} → tm 2 vs 2, diff EXACTLY 0 — the whale (100)
    // cannot move the estimate. Winsorized {1,1,2,3,3}: sw 10, sww 24
    // → s²w = 1 → d = 4·1/(3·2) per arm → se = √(4/3).
    val rows = (Seq(0, 1, 2, 3, 100).map(("a", _)) ++
      Seq(0, 1, 2, 3, 4).map(("b", _)))
      .toDF("variant", "m0")
      .select(col("variant"), col("m0").cast("decimal(18,2)").as("m"))
    val r = Experiment.yuenTrimmedT(rows, "variant", "m", "a", "b",
      trim = 0.2).collect()(0)
    assert(r.getLong(0) === 5L && r.getLong(1) === 5L)
    assert(r.getLong(2) === 3L && r.getLong(3) === 3L) // h = n − 2k
    assert(r.getDouble(4) === 2.0 && r.getDouble(5) === 2.0)
    assert(r.getDouble(6) === 0.0, s"diff ${r.getDouble(6)}")
    assert(r.getDouble(7) === 1.154701, s"se ${r.getDouble(7)}")
    assert(r.getDouble(8) === 0.0, s"t ${r.getDouble(8)}")
  }

  test("yuenTrimmedT: ties collapse correctly; constant arm has zero " +
    "winsorized variance") {
    val rows = (Seq.fill(5)(("a", 5)) ++
      Seq(0, 2, 4, 6, 8).map(("b", _)))
      .toDF("variant", "m0")
      .select(col("variant"), col("m0").cast("decimal(18,2)").as("m"))
    val r = Experiment.yuenTrimmedT(rows, "variant", "m", "a", "b",
      trim = 0.2).collect()(0)
    assert(r.getDouble(4) === 5.0 && r.getDouble(5) === 4.0)
    // d_a = 0 → se comes from b alone: winsorized {2,2,4,6,6}:
    // sw 20, sww 96 → s²w = (96 − 80)/4 = 4 → d_b = 4·4/6
    assert(r.getDouble(7) === 1.632993, s"se ${r.getDouble(7)}")
  }

  test("stratifiedDiff: hand-computed adjustment kills imbalance") {
    // stratum 1 (low metric): a-heavy; stratum 2 (high): b-heavy.
    // Within each stratum the true effect is +1; the raw diff is
    // dragged negative by composition. By hand: s1 means a = 2, b = 1
    // (n 4/2); s2 means a = 11, b = 10 (n 2/4) → both diffs +1 →
    // diff_adj = 1 exactly; raw = (8+22)/6 − (2+40)/6 = 5 − 7 = −2.
    def rows(v: String, s: Int, vals: Seq[Int]) =
      vals.map(x => (v, s.toLong, BigDecimal(x)))
    val df = (rows("a", 1, Seq(1, 2, 2, 3)) ++ rows("b", 1, Seq(0, 2)) ++
      rows("a", 2, Seq(10, 12)) ++ rows("b", 2, Seq(9, 10, 10, 11)))
      .toDF("variant", "stratum", "m0")
      .select(col("variant"), col("stratum"),
        col("m0").cast("decimal(18,2)").as("m"))
    val r = Experiment.stratifiedDiff(df, "variant", "stratum", "m",
      "a", "b").collect()(0)
    assert(r.getLong(0) === 6L && r.getLong(1) === 6L)
    assert(r.getLong(2) === 2L && r.getLong(3) === 0L)
    assert(r.getDouble(4) === -2.0, s"raw ${r.getDouble(4)}")
    assert(r.getDouble(5) === 1.0, s"adj ${r.getDouble(5)}")
  }

  test("stratifiedDiff: one-armed strata are dropped, not renormalized") {
    val df = Seq(("a", 1L, 5), ("a", 1L, 7), ("b", 1L, 4), ("b", 1L, 6),
      ("a", 9L, 100), ("a", 9L, 102)) // stratum 9 has no b arm
      .toDF("variant", "stratum", "m0")
      .select(col("variant"), col("stratum"),
        col("m0").cast("decimal(18,2)").as("m"))
    val r = Experiment.stratifiedDiff(df, "variant", "stratum", "m",
      "a", "b").collect()(0)
    assert(r.getLong(2) === 2L && r.getLong(3) === 1L) // 1 dropped
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L) // kept rows only
    assert(r.getDouble(5) === 1.0, s"adj ${r.getDouble(5)}") // 6−5
  }

  test("quantileEffect: hand-computed type-7 quantiles and shifts") {
    // a = {1..5}: median 3, p75 = 4 (type-7: 1+0.75·4 = rank 4);
    // b = a + 10 shifted only above the median:
    // b = {1, 2, 3, 14, 15}: median 3 (no shift), p75 = 14 → qte −11
    val rows = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4), ("a", 5),
      ("b", 1), ("b", 2), ("b", 3), ("b", 14), ("b", 15))
      .toDF("variant", "m0")
      .select(col("variant"), col("m0").cast("decimal(18,2)").as("m"))
    val r = Experiment.quantileEffect(rows, "variant", "m", "a", "b",
        ps = Seq(0.5, 0.75))
      .collect().map(x => x.getDouble(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4),
          x.getDouble(5))).toMap
    assert(r(0.5) === ((5L, 5L, 3.0, 3.0, 0.0)), r.toString)
    assert(r(0.75) === ((5L, 5L, 4.0, 14.0, -10.0)), r.toString)
  }

  test("quantileEffect: interpolated quantile on an even-sized group") {
    // {1, 2, 3, 4} at p = 0.5 → type-7 rank 2.5 → 2.5
    val rows = Seq(("a", 1), ("a", 2), ("a", 3), ("a", 4),
      ("b", 10), ("b", 20))
      .toDF("variant", "m0")
      .select(col("variant"), col("m0").cast("decimal(18,2)").as("m"))
    val r = Experiment.quantileEffect(rows, "variant", "m", "a", "b",
      ps = Seq(0.5)).collect()(0)
    assert(r.getDouble(3) === 2.5 && r.getDouble(4) === 15.0)
    assert(r.getDouble(5) === -12.5)
  }

  test("clusterDiff: hand-computed CR1 sandwich on correlated clusters") {
    // a-side: two fully-correlated clusters (10,10) and (20,20);
    // b-side: two flat clusters (5,5)(5,5). By hand: mean_a 15,
    // mean_b 5, Var_clu_a = 2/(1·16)·((20−30)²+(40−30)²) = 25,
    // Var_clu_b = 0 → se_cluster 5, t 2; naive var_a/n = (100/3)/4 →
    // design effect (25+0)/(8.3333…+0) = 3.
    val rows = Seq(
      ("a", 1L, 10), ("a", 1L, 10), ("a", 2L, 20), ("a", 2L, 20),
      ("b", 3L, 5), ("b", 3L, 5), ("b", 4L, 5), ("b", 4L, 5))
      .toDF("variant", "cluster", "m0")
      .select(col("variant"), col("cluster"),
        col("m0").cast("decimal(12,2)").as("m"))
    val r = Experiment.clusterDiff(rows, "variant", "cluster", "m",
      "a", "b").collect()(0)
    assert(r.getLong(0) === 2L && r.getLong(1) === 2L) // clusters
    assert(r.getLong(2) === 4L && r.getLong(3) === 4L) // rows
    assert(r.getDouble(4) === 15.0 && r.getDouble(5) === 5.0)
    assert(r.getDouble(6) === 10.0)                    // diff
    assert(r.getDouble(8) === 5.0, s"se_cluster ${r.getDouble(8)}")
    assert(r.getDouble(9) === 3.0, s"design_effect ${r.getDouble(9)}")
    assert(r.getDouble(10) === 2.0, s"t_cluster ${r.getDouble(10)}")
  }

  test("clusterDiff: one row per cluster collapses to the naive SE") {
    // with n_c ≡ 1 the CR1 formula reduces algebraically to the
    // per-row sample variance — design effect must read 1
    val rows = (1 to 60).map(i => (if (i % 2 == 0) "a" else "b",
        i.toLong, BigDecimal((i * 37) % 13) + 1))
      .toDF("variant", "cluster", "m0")
      .select(col("variant"), col("cluster"),
        col("m0").cast("decimal(12,2)").as("m"))
    val r = Experiment.clusterDiff(rows, "variant", "cluster", "m",
      "a", "b").collect()(0)
    assert(math.abs(r.getDouble(8) - r.getDouble(7)) < 1e-9,
      s"cluster ${r.getDouble(8)} vs naive ${r.getDouble(7)}")
    assert(math.abs(r.getDouble(9) - 1.0) < 1e-6,
      s"design_effect ${r.getDouble(9)}")
  }

  test("eventStudy: flat pre-periods, dynamic post effect, base row") {
    // periods 0,1 pre (gap fixed at 5 → effect 0), 2,3 post with the
    // treated arm pulling ahead by +3 then +6
    def cell(g: String, p: Int, base: Int) =
      Seq((g, p, base), (g, p, base + 2))
    val rows = (
      cell("t", 0, 14) ++ cell("c", 0, 9) ++   // diff 5 (base)
      cell("t", 1, 19) ++ cell("c", 1, 14) ++  // diff 5 → effect 0
      cell("t", 2, 27) ++ cell("c", 2, 19) ++  // diff 8 → effect 3
      cell("t", 3, 35) ++ cell("c", 3, 24))    // diff 11 → effect 6
      .toDF("grp", "period", "m0")
      .select(col("grp"), col("period"),
        col("m0").cast("decimal(18,2)").as("m"))
    val r = Experiment.eventStudy(rows, "grp", "period", "m", "t", "c",
      basePeriod = 0L)
      .collect().map(x => x.getLong(0) ->
        (x.getDouble(5), x.getDouble(6),
          if (x.isNullAt(7)) None else Some(x.getDouble(7)))).toMap
    assert(r(0L) === ((5.0, 0.0, None)), r.toString) // base: se null
    assert(r(1L)._2 === 0.0, "pre-period reads parallel trends")
    assert(r(2L)._2 === 3.0 && r(3L)._2 === 6.0, r.toString)
    // every cell has n=2, var=2 → varN=1; se = sqrt(4) = 2
    assert(r(1L)._3 === Some(2.0) && r(2L)._3 === Some(2.0))
  }

  test("ivWald: hand-computed LATE on an encouragement design") {
    // z=1: takeup .75, mean y 9; z=0: takeup .25, mean y 1
    // → ITT 8, first stage .5, LATE 16
    val rows = Seq(
      (1, 1L, 12), (1, 1L, 10), (1, 1L, 14), (1, 0L, 0),
      (0, 1L, 4), (0, 0L, 0), (0, 0L, 0), (0, 0L, 0))
      .toDF("z", "d", "m0")
      .select(col("z"), col("d"),
        col("m0").cast("decimal(18,2)").as("m"))
    val r = Experiment.ivWald(rows, "z", "d", "m").head
    assert(r.getLong(0) === 4L && r.getLong(1) === 4L)
    assert(r.getDouble(2) === 8.0, s"itt ${r.getDouble(2)}")
    assert(r.getDouble(3) === 0.5, s"fs ${r.getDouble(3)}")
    assert(r.getDouble(4) === 16.0, s"late ${r.getDouble(4)}")
    assert(r.getDouble(5) > 0 && !r.getDouble(5).isNaN)
    assert(r.getDouble(7) > 0, "first-stage t is reported")
  }

  test("ivWald: a weak instrument surfaces as a tiny first-stage t") {
    // takeup barely moves with z: fs small, its t small — the readout
    // that warns before the LATE ratio is trusted
    val strong = Seq.fill(40)((1, 1L, 10)) ++ Seq.fill(10)((1, 0L, 0)) ++
      Seq.fill(10)((0, 1L, 10)) ++ Seq.fill(40)((0, 0L, 0))
    val weak = Seq.fill(26)((1, 1L, 10)) ++ Seq.fill(24)((1, 0L, 0)) ++
      Seq.fill(24)((0, 1L, 10)) ++ Seq.fill(26)((0, 0L, 0))
    def t(fix: Seq[(Int, Long, Int)]) =
      Experiment.ivWald(fix.toDF("z", "d", "m0")
          .select(col("z"), col("d"),
            col("m0").cast("decimal(18,2)").as("m")),
        "z", "d", "m").head.getDouble(7)
    assert(t(strong) > 5 * t(weak),
      s"strong ${t(strong)} vs weak ${t(weak)}")
  }

  test("ivWald: a dead instrument nulls the ratio instead of erroring") {
    val rows = Seq((1, 1L, 10), (1, 1L, 12), (0, 1L, 9), (0, 1L, 11))
      .toDF("z", "d", "m0")
      .select(col("z"), col("d"),
        col("m0").cast("decimal(18,2)").as("m"))
    val r = Experiment.ivWald(rows, "z", "d", "m").head
    assert(r.getDouble(3) === 0.0, "first stage is zero")
    assert(r.isNullAt(4) && r.isNullAt(5) && r.isNullAt(6))
    assert(r.isNullAt(7), "takeup variance 0 -> first-stage t null too")
  }

  test("ucbAllocation: optimism picks the under-sampled arm on ties") {
    // arm a: 16 pulls mean 10; arm b: 4 pulls mean 10 — equal means,
    // b's bonus is twice a's (√(1/4) vs √(1/16) scaling) → b chosen
    val rows = (Seq.fill(16)(("a", 10)) ++ Seq.fill(4)(("b", 10)))
      .toDF("variant", "m0")
      .select(col("variant"), col("m0").cast("decimal(18,2)").as("m"))
    val r = Experiment.ucbAllocation(rows, "variant", "m")
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(2), x.getDouble(3), x.getInt(5)))
      .toMap
    val bonusA = math.sqrt(2.0 * math.log(20.0) / 16.0)
    val bonusB = math.sqrt(2.0 * math.log(20.0) / 4.0)
    assert(math.abs(r("a")._3 - bonusA) < 1e-6, r.toString)
    assert(math.abs(r("b")._3 - bonusB) < 1e-6)
    assert(r("b")._4 === 1 && r("a")._4 === 0, "explore the thin arm")
  }

  test("ucbAllocation: a decisively better arm wins despite fewer pulls") {
    val rows = (Seq.fill(50)(("a", 10)) ++ Seq.fill(30)(("b", 30)))
      .toDF("variant", "m0")
      .select(col("variant"), col("m0").cast("decimal(18,2)").as("m"))
    val r = Experiment.ucbAllocation(rows, "variant", "m", c = 1.0)
      .collect().map(x => x.getString(0) -> x.getInt(5)).toMap
    assert(r("b") === 1 && r("a") === 0)
  }

  test("eventStudy: a period missing an arm is dropped, not an error") {
    val rows = (Seq(("t", 0, 10), ("t", 0, 12), ("c", 0, 5), ("c", 0, 7),
      ("t", 1, 20), ("t", 1, 22), ("c", 1, 15), ("c", 1, 17),
      ("t", 2, 30), ("t", 2, 32))) // period 2: control never logged
      .toDF("grp", "period", "m0")
      .select(col("grp"), col("period"),
        col("m0").cast("decimal(18,2)").as("m"))
    val periods = Experiment.eventStudy(rows, "grp", "period", "m",
      "t", "c", basePeriod = 0L).collect().map(_.getLong(0)).toSet
    assert(periods === Set(0L, 1L), periods.toString)
  }

  test("eventStudy: a pure common trend reads zero in every period") {
    val rows = (0 to 3).flatMap(p => Seq(
      ("t", p, 10 + 10 * p), ("t", p, 12 + 10 * p),
      ("c", p, 5 + 10 * p), ("c", p, 7 + 10 * p)))
      .toDF("grp", "period", "m0")
      .select(col("grp"), col("period"),
        col("m0").cast("decimal(18,2)").as("m"))
    val effects = Experiment.eventStudy(rows, "grp", "period", "m",
      "t", "c", basePeriod = 0L)
      .collect().map(_.getDouble(6))
    assert(effects.forall(_ === 0.0), effects.mkString(","))
  }

  test("ipwAte: exact confounded fixture — naive diff biased, IPW " +
    "recovers the planted effect exactly") {
    import spark.implicits._
    // binary confounder x; e(x=1)=0.8, e(x=0)=0.2; arm counts match e
    // EXACTLY so Hajek with the true propensity is closed-form:
    // y = 5*T + 2*x, true ATE = 5; naive diff-in-means = 6.2
    val units = (
      Seq.fill(80)((1, 1)) ++ Seq.fill(20)((0, 1)) ++   // x=1
      Seq.fill(20)((1, 0)) ++ Seq.fill(80)((0, 0)))     // x=0
      .map { case (t, x) =>
        (t, 5.0 * t + 2.0 * x, if (x == 1) 0.8 else 0.2) }
      .toDF("t", "y", "e")
    val r = Experiment.ipwAte(units, "t", "y", "e").collect().head
    assert(r.getLong(0) === 100L && r.getLong(1) === 100L)
    assert(r.getDouble(2) === 5.0, s"IPW must deconfound: got $r")
    // the naive difference is confounded (6.6 - 0.4 = 6.2)
    val naive = units.groupBy("t").agg(
      org.apache.spark.sql.functions.avg("y")).collect()
      .map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(math.abs(naive(1) - naive(0) - 6.2) < 1e-9)
    // degenerate arm -> null
    val oneArm = Seq((1, 3.0, 0.5), (1, 4.0, 0.5)).toDF("t", "y", "e")
    assert(Experiment.ipwAte(oneArm, "t", "y", "e").collect().head
      .isNullAt(2))
    // clipping guards unbounded weights: e = 0.001 clips to 0.05
    val extreme = Seq((1, 1.0, 0.001), (0, 1.0, 0.999))
      .toDF("t", "y", "e")
    val c = Experiment.ipwAte(extreme, "t", "y", "e").collect().head
    assert(c.getDouble(2) === 0.0, "same outcome both arms -> ATE 0")
  }

  test("aipwAte is doubly robust: right outcome model + wrong e, and " +
    "wrong model + right e, both recover the planted effect") {
    import spark.implicits._
    // the ipwAte confounded fixture: y = 5T + 2x, e(x=1)=.8, e(x=0)=.2
    def units(e1: Double, e0: Double, m1Of: Int => Double,
              m0Of: Int => Double) = (
      Seq.fill(80)((1, 1)) ++ Seq.fill(20)((0, 1)) ++
      Seq.fill(20)((1, 0)) ++ Seq.fill(80)((0, 0)))
      .map { case (t, x) =>
        (t, 5.0 * t + 2.0 * x, if (x == 1) e1 else e0,
          m1Of(x), m0Of(x)) }
      .toDF("t", "y", "e", "m1", "m0")
    // CORRECT outcome model (m1 = 5 + 2x, m0 = 2x), garbage e = 0.5:
    // correction terms vanish, AIPW = model ATE = 5 exactly
    val mRight = Experiment.aipwAte(
      units(0.5, 0.5, x => 5.0 + 2.0 * x, x => 2.0 * x),
      "t", "y", "e", "m1", "m0").collect().head
    assert(mRight.getDouble(2) === 5.0)
    // WRONG model (all zeros), TRUE e: the IPW correction carries it.
    // Horvitz–Thompson form is exact on this balanced fixture.
    val eRight = Experiment.aipwAte(
      units(0.8, 0.2, _ => 0.0, _ => 0.0),
      "t", "y", "e", "m1", "m0").collect().head
    assert(math.abs(eRight.getDouble(2) - 5.0) < 0.3,
      s"true-propensity AIPW should be near 5: $eRight")
    // both right -> exactly 5 with zero variance contribution
    val both = Experiment.aipwAte(
      units(0.8, 0.2, x => 5.0 + 2.0 * x, x => 2.0 * x),
      "t", "y", "e", "m1", "m0").collect().head
    assert(both.getDouble(2) === 5.0)
  }
}
