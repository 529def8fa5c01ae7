package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col

class ChecksSpec extends SparkSpec {

  import spark.implicits._
  import Checks._

  private def byCheck(df: org.apache.spark.sql.DataFrame): Map[(String, String), Row] =
    df.collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap

  private val base = Seq(
    (Some(1L), Some("a"), Some(10.0), Some("x1")),
    (Some(2L), Some("b"), Some(20.0), Some("x2")),
    (Some(2L), Some("c"), Some(-5.0), Some("y3")),
    (None,     Some("a"), None,       Some("x4")),
    (Some(4L), None,      Some(99.0), None))
    .toDF("id", "cat", "v", "code")

  test("every constraint type counts violations correctly") {
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    val out = byCheck(Checks.run(base, Seq(
      NotNull("id"),
      InRange("v", 0.0, 50.0),
      Accepted("cat", Seq("a", "b")),
      Matches("code", "^x"),
      Satisfies("id_lt_3", col("id") < 3),
      Unique(Seq("id")),
      RefIntegrity("id", dim, "pk"))))
    def v(check: String, target: String): Long =
      out((check, target)).getLong(3)
    assert(v("not_null", "id") === 1L)
    assert(v("in_range", "v") === 2L)          // -5.0 and 99.0; null skipped
    assert(v("accepted_values", "cat") === 1L) // "c"; null skipped
    assert(v("matches_regex", "code") === 1L)  // "y3"; null skipped
    assert(v("satisfies", "id_lt_3") === 1L)   // id=4; null id → unknown, not a violation
    assert(v("unique", "id") === 1L)           // 4 non-null ids, 3 distinct
    assert(v("ref_integrity", "id") === 1L)    // id=4 missing from dim; null fk ok
    // n_rows everywhere, passed flag consistent
    out.values.foreach { r =>
      assert(r.getLong(2) === 5L)
      assert(r.getBoolean(4) === (r.getLong(3) == 0L))
    }
  }

  test("declaration order is preserved in the report") {
    val out = Checks.run(base, Seq(
      Unique(Seq("cat")), NotNull("v"), InRange("id", 0, 100)))
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq("unique", "not_null", "in_range"))
  }

  test("passing table reports zero violations everywhere") {
    val clean = Seq((1L, "a"), (2L, "b")).toDF("id", "cat")
    val out = Checks.run(clean, Seq(
      NotNull("id"), Unique(Seq("id")), Accepted("cat", Seq("a", "b"))))
    assert(out.collect().forall(r => r.getLong(3) == 0L && r.getBoolean(4)))
  }

  test("empty input: zero rows, zero violations, all passed") {
    val empty = Seq.empty[(Option[Long], Option[String])].toDF("id", "cat")
    val out = Checks.run(empty, Seq(
      NotNull("id"), InRange("id", 0, 1), Unique(Seq("id")),
      RefIntegrity("id", Seq(1L).toDF("pk"), "pk"))).collect()
    assert(out.length === 4)
    out.foreach { r =>
      assert(r.getLong(2) === 0L && r.getLong(3) === 0L && r.getBoolean(4))
    }
  }

  test("row-level constraints fuse into one scan of the table") {
    val df = Checks.run(base, Seq(
      NotNull("id"), InRange("v", 0, 50), Accepted("cat", Seq("a")),
      Matches("code", "x"), Satisfies("p", col("v") > 0)))
    df.collect()
    // AQE's toString appends the pre-adaptive "Initial Plan" — count
    // scans only in the final executed section
    val p = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==")(0)
    val scans = "LocalTableScan".r.findAllIn(p).size +
      "Scan parquet".r.findAllIn(p).size
    assert(scans === 1, s"row-level checks re-scanned the table:\n$p")
  }

  test("multi-column unique follows SQL distinct-tuple semantics") {
    val df = Seq((1L, "a"), (1L, "a"), (1L, "b")).toDF("k1", "k2")
    val out = byCheck(Checks.run(df, Seq(Unique(Seq("k1", "k2")))))
    assert(out(("unique", "k1,k2")).getLong(3) === 1L)
  }
}
