package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

class ColumnProfileSpec extends SparkSpec {

  import spark.implicits._

  private def byCol(df: org.apache.spark.sql.DataFrame): Map[String, Row] =
    df.collect().map(r => r.getString(0) -> r).toMap

  test("counts, nulls, distincts, numeric stats") {
    val df = Seq(
      (Some(1L), Some(2.0), Some("a")),
      (Some(2L), None,      Some("b")),
      (Some(2L), Some(4.0), None),
      (None,     Some(6.0), Some("a")))
      .toDF("k", "v", "s")
    val p = byCol(ColumnProfile.profile(df))
    assert(p.keySet === Set("k", "v", "s"))
    val k = p("k")
    assert(k.getLong(1) === 4L && k.getLong(2) === 1L && k.getLong(3) === 2L)
    assert(k.getDouble(4) === 1.0 && k.getDouble(5) === 2.0)
    assert(k.getDouble(6) === (1.0 + 2.0 + 2.0) / 3)
    val v = p("v")
    assert(v.getLong(2) === 1L && v.getLong(3) === 3L)
    assert(v.getDouble(4) === 2.0 && v.getDouble(5) === 6.0 &&
      v.getDouble(6) === 4.0)
    // string column: counts only, numeric stats null
    val s = p("s")
    assert(s.getLong(2) === 1L && s.getLong(3) === 2L)
    assert(s.isNullAt(4) && s.isNullAt(5) && s.isNullAt(6))
  }

  test("all-null and empty inputs profile without NaNs or crashes") {
    val df = Seq.empty[(Option[Long], Option[String])].toDF("k", "s")
    val p = byCol(ColumnProfile.profile(df))
    assert(p("k").getLong(1) === 0L && p("k").getLong(3) === 0L)
    assert(p("k").isNullAt(4) && p("k").isNullAt(6))
    val nulls = Seq((Option.empty[Long], Option.empty[String]),
      (Option.empty[Long], Option.empty[String])).toDF("k", "s")
    val q = byCol(ColumnProfile.profile(nulls))
    assert(q("k").getLong(1) === 2L && q("k").getLong(2) === 2L &&
      q("k").getLong(3) === 0L)
    assert(q("k").isNullAt(4) && q("k").isNullAt(5) && q("k").isNullAt(6))
  }

  test("column subset selection and approx mode") {
    val df = (1L to 1000L).map(i => (i, i % 10, s"s$i")).toDF("a", "b", "s")
    val exact = byCol(ColumnProfile.profile(df, Seq("a", "b")))
    assert(exact.keySet === Set("a", "b"))
    assert(exact("a").getLong(3) === 1000L && exact("b").getLong(3) === 10L)
    // approx mode: HLL estimate within its documented ~2-5% envelope
    val approx = byCol(ColumnProfile.profile(df, Seq("a"), exact = false))
    val est = approx("a").getLong(3).toDouble
    assert(math.abs(est - 1000.0) / 1000.0 < 0.1)
  }

  test("scale mode: non-distinct stats bit-identical, Expand dropped") {
    val li = graft.Tables.lineitem(spark, sf0001)
    val cols = Seq("l_orderkey", "l_quantity", "l_returnflag")
    val exact = ColumnProfile.profile(li, cols).drop("n_distinct")
    val hll = ColumnProfile.profile(li, cols, exact = false).drop("n_distinct")
    // every retained stat (rows/nulls/min/max/decimal mean) is exact
    // arithmetic in both modes — bit-identical, which is what lets the
    // d13 scale query sit under the exact oracle
    assert(byCol(exact).map { case (k, r) => k -> r.toSeq } ===
      byCol(hll).map { case (k, r) => k -> r.toSeq })
    // the whole point of the switch: exact multi-column distinct plans
    // via Expand (×streams the scan); HLL collapses to one stream
    val exactPlan = ColumnProfile.profile(li, cols)
      .queryExecution.executedPlan.toString
    val hllPlan = ColumnProfile.profile(li, cols, exact = false)
      .queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"))
    assert(!hllPlan.contains("Expand"))
  }

  test("adaptive gate: small stays exact, above-threshold flips to HLL") {
    val df = (1L to 1000L).map(i => (i, s"s$i")).toDF("a", "s")
    // under the threshold: bit-identical to the exact profile
    val small = ColumnProfile.profileAdaptive(df, Seq("a", "s"),
      exactMaxRows = 5000)
    assert(byCol(small).map { case (k, r) => k -> r.toSeq } ===
      byCol(ColumnProfile.profile(df, Seq("a", "s")))
        .map { case (k, r) => k -> r.toSeq })
    // over the threshold: the profile switched itself to the HLL plan
    val big = ColumnProfile.profileAdaptive(df, Seq("a", "s"),
      exactMaxRows = 100)
    assert(!big.queryExecution.executedPlan.toString.contains("Expand"))
    val est = byCol(big)("a").getLong(3).toDouble
    assert(math.abs(est - 1000.0) / 1000.0 < 0.1)
  }

  test("profile agrees with lineitem ground truth at sf0.001") {
    val li = graft.Tables.lineitem(spark, sf0001)
    val p = byCol(ColumnProfile.profile(li, Seq("l_orderkey", "l_quantity")))
    val n = li.count()
    assert(p("l_orderkey").getLong(1) === n)
    assert(p("l_quantity").getDouble(4) === 1.0)
    assert(p("l_quantity").getDouble(5) === 50.0)
  }

  test("drift: schema add/remove, null-rate regression, range widening") {
    val prev = Seq((1L, "a", 5.0), (2L, "b", 7.0), (3L, "c", 9.0))
      .toDF("id", "s", "v")
    val cur = Seq((4L, "a", Some(5.0), 1L), (5L, "b", Some(99.0), 1L),
        (6L, "c", Option.empty[Double], 1L), (7L, "d", Some(6.0), 1L))
      .toDF("id", "s", "v", "extra")
    val d = ColumnProfile.drift(cur, prev,
        Seq("v", "extra"), Seq("v", "id"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(d("extra").getString(1) === "added")
    assert(d("id").getString(1) === "removed")
    val v = d("v")
    assert(v.getString(1) === "common")
    assert(v.getDouble(v.fieldIndex("null_rate_cur")) === 0.25)
    assert(v.getDouble(v.fieldIndex("null_rate_delta")) === 0.25)
    assert(v.getInt(v.fieldIndex("range_widened")) === 1) // 99 > 9
    // added/removed rows carry no delta metrics
    assert(d("extra").isNullAt(d("extra").fieldIndex("null_rate_delta")))
  }
}
