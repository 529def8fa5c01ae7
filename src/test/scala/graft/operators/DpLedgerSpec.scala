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
    VersionedTable.drop(spark, dir)
  }
}
