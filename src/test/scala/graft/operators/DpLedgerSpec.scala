package graft.operators

import graft.SparkSpec
import graft.sources.VersionedTable

class DpLedgerSpec extends SparkSpec {

  private def freshDir(tag: String): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/dpl_spec_${tag}_" +
      java.util.UUID.randomUUID().toString.take(8)
    VersionedTable.drop(spark, d)
    d
  }

  test("sequential composition: running totals and headroom on the " +
    "exact integer grids") {
    val dir = freshDir("sum")
    DpLedger.init(spark, dir, epsBudget = 1.0, deltaBudget = 1e-6)
    DpLedger.record(spark, dir, "r1", "laplace", 0.25, 0.0)
    DpLedger.record(spark, dir, "r2", "gaussian", 0.5, 5e-7)
    val rows = DpLedger.summary(spark, dir).collect()
      .map(r => (r.getString(1), r.getLong(5), r.getLong(6),
        r.getLong(7), r.getLong(8)))
    assert(rows.toSeq === Seq(
      ("r1", 250000L, 0L, 750000L, 1000000L),
      ("r2", 750000L, 500000L, 250000L, 500000L)))
    VersionedTable.drop(spark, dir)
  }

  test("a budget-exceeding release fails LOUDLY and commits nothing") {
    val dir = freshDir("over")
    DpLedger.init(spark, dir, epsBudget = 1.0, deltaBudget = 0.0)
    DpLedger.record(spark, dir, "r1", "laplace", 0.8, 0.0)
    val before = VersionedTable.versions(spark, dir)
    val ex = intercept[IllegalStateException] {
      DpLedger.record(spark, dir, "r2", "laplace", 0.3, 0.0)
    }
    assert(ex.getMessage.contains("would exceed"))
    assert(VersionedTable.versions(spark, dir) === before,
      "a refused release must not commit a version")
    // delta budget enforced independently
    intercept[IllegalStateException] {
      DpLedger.record(spark, dir, "r3", "gaussian", 0.1, 1e-9)
    }
    // exactly-at-budget is allowed (<=, the inclusive contract)
    DpLedger.record(spark, dir, "r4", "laplace", 0.2, 0.0)
    VersionedTable.drop(spark, dir)
  }

  test("replaying a release name is a version-level no-op (no " +
    "double-counted budget)") {
    val dir = freshDir("replay")
    DpLedger.init(spark, dir, epsBudget = 1.0, deltaBudget = 0.0)
    val v1 = DpLedger.record(spark, dir, "weekly", "laplace", 0.9, 0.0)
    // replay: same release, even with drifted params, must NOT spend
    val v2 = DpLedger.record(spark, dir, "weekly", "laplace", 0.9, 0.0)
    assert(v1 === v2)
    assert(DpLedger.summary(spark, dir).count() === 1L)
    // the budget is NOT exhausted twice: a new 0.1 release still fits
    DpLedger.record(spark, dir, "weekly2", "laplace", 0.1, 0.0)
    VersionedTable.drop(spark, dir)
  }

  test("advanced composition: exact arithmetic on the fixed fixture, " +
    "and many small releases beat the basic account") {
    val dir = freshDir("adv")
    DpLedger.init(spark, dir, epsBudget = 2.0, deltaBudget = 1e-6)
    Seq(("r1", 0.5, 0.0), ("r2", 0.5, 0.0), ("r3", 0.4, 0.0),
      ("r4", 0.3, 5e-7)).foreach { case (r, e, del) =>
      DpLedger.record(spark, dir, r, "m", e, del) }
    val row = DpLedger.advancedSummary(spark, dir, deltaSlack = 1e-9)
      .collect().head
    assert(row.getLong(0) === 4L && row.getLong(1) === 1700000L &&
      row.getLong(2) === 500000L && row.getLong(3) === 1000L &&
      row.getLong(5) === 501000L)
    // replicate the documented fixed sequence by hand
    val eps = Seq(0.5, 0.5, 0.4, 0.3)
    val s2 = eps.map(e => math.round(e * 1e6) * math.round(e * 1e6))
      .sum.toDouble / 1e12
    val lin = eps.map(e => math.floor(e * (math.exp(e) - 1.0) * 1e12
      + 0.5).toLong).sum.toDouble / 1e12
    val expect = math.floor(
      (math.sqrt(2.0 * math.log(1.0 / 1e-9) * s2) + lin) * 1e6 + 0.5) / 1e6
    assert(row.getDouble(4) === expect)
    VersionedTable.drop(spark, dir)
    // 50 releases of eps = 0.01: basic total 0.5, advanced ~0.38
    val dir2 = freshDir("adv2")
    DpLedger.init(spark, dir2, epsBudget = 2.0, deltaBudget = 0.0)
    (1 to 50).foreach(i =>
      DpLedger.record(spark, dir2, s"micro-$i", "m", 0.01, 0.0))
    val adv = DpLedger.advancedSummary(spark, dir2, deltaSlack = 1e-6)
      .collect().head
    assert(adv.getLong(1) === 500000L)
    assert(adv.getDouble(4) < 0.5,
      s"advanced must beat basic for many small releases: $adv")
    VersionedTable.drop(spark, dir2)
  }

  test("8 concurrent recorders of distinct releases: no lost updates, " +
    "exact total (the optimistic read-modify-write commit)") {
    val dir = freshDir("race")
    DpLedger.init(spark, dir, epsBudget = 2.0, deltaBudget = 0.0)
    val threads = (1 to 8).map { i =>
      new Thread(() =>
        DpLedger.record(spark, dir, s"r$i", "laplace", 0.1, 0.0))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val rows = DpLedger.summary(spark, dir).collect()
    assert(rows.length === 8,
      s"every concurrent release must be accounted: ${rows.length}")
    assert(rows.map(_.getLong(5)).max === 800000L,
      "the running total must include all 8 releases")
    VersionedTable.drop(spark, dir)
  }

  test("bad inputs are rejected: missing init, reserved name, bad grid") {
    val dir = freshDir("bad")
    intercept[NoSuchElementException] {
      DpLedger.record(spark, dir, "r1", "laplace", 0.1, 0.0)
    }
    DpLedger.init(spark, dir, 1.0, 0.0)
    intercept[IllegalArgumentException] {
      DpLedger.record(spark, dir, "__budget", "laplace", 0.1, 0.0)
    }
    intercept[IllegalArgumentException] {
      DpLedger.record(spark, dir, "r1", "laplace", -0.1, 0.0)
    }
    // the grid refuses privacy-meaningless epsilons OUTRIGHT — the cap
    // (eps <= 1e6, eps_micro <= 1e12) is what keeps the BIGINT budget
    // totals orders of magnitude away from Long overflow, so a wrapped
    // negative total can never silently pass the budget check
    intercept[IllegalArgumentException] {
      DpLedger.record(spark, dir, "r1", "laplace", 1.1e6, 0.0)
    }
    intercept[IllegalArgumentException] {
      DpLedger.init(spark, freshDir("bad2"), 9e12, 0.0)
    }
    VersionedTable.drop(spark, dir)
  }
}
