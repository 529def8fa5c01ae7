package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The opt-in BETWEEN-join rewrite: same results, nested-loop-free
  * plan. The shared test session registers GraftExtensions, so setting
  * the width conf is all it takes to arm the rule. */
class RangeJoinRewriteSpec extends SparkSpec {

  import spark.implicits._

  private val Width = RangeJoinRewrite.WidthKey

  private def withConfs(pairs: (String, String)*)(body: => Unit): Unit = {
    val olds = pairs.map { case (k, _) =>
      k -> scala.util.Try(spark.conf.get(k)).toOption }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private lazy val setup: Unit = {
    // points on a long axis incl. negatives; intervals overlap and
    // nest, and every 11th is INVERTED (lo > hi: matches nothing, but
    // the armed rule must not crash on it)
    spark.range(-500, 500).select(col("id").as("pid"),
        (col("id") % 7).as("key"), (col("id") * 13).as("p"))
      .createOrReplaceTempView("rj_points")
    spark.range(-40, 40).select(col("id").as("iid"),
        (col("id") % 7).as("key"), (col("id") * 157).as("lo"),
        when(col("id") % 11 === 0, col("id") * 157 - 300)
          .otherwise(col("id") * 157 + 400).as("hi"))
      .createOrReplaceTempView("rj_intervals")
  }

  // with an equi key Spark already sort-merges (range as post-filter);
  // the nested-loop disease strikes the KEYLESS range join, so the
  // plan-shape assertions use sqlKeyless and the results assertions
  // cover both
  private val sqlKeyed =
    """SELECT pid, iid FROM rj_points p JOIN rj_intervals i
       ON p.key = i.key AND p.p BETWEEN i.lo AND i.hi"""
  private val sqlKeyless =
    """SELECT pid, iid FROM rj_points p JOIN rj_intervals i
       ON p.p BETWEEN i.lo AND i.hi"""

  test("rewrite preserves results exactly (incl. negative axis values)") {
    setup
    for (sql <- Seq(sqlKeyed, sqlKeyless)) {
      val baseline = spark.sql(sql).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(baseline.nonEmpty)
      withConfs(Width -> "100",
          "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val rewritten = spark.sql(sql).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        assert(rewritten === baseline, s"for:\n$sql")
      }
    }
  }

  test("armed rule turns the keyless nested-loop join into an equi-join") {
    setup
    withConfs(Width -> "100",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(sqlKeyless)
      df.collect() // finalize AQE
      val physical = df.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastNestedLoopJoin") &&
             !physical.contains("CartesianProduct"),
        s"expected an equi-join plan:\n$physical")
      assert(physical.contains("SortMergeJoin") ||
             physical.contains("ShuffledHashJoin"),
        s"expected a shuffled equi-join:\n$physical")
    }
  }

  test("timestamp axes rewrite too (width in micros)") {
    setup
    spark.range(0, 300).select(col("id").as("pid"),
        timestamp_micros(col("id") * 600000000L).as("pts"))
      .createOrReplaceTempView("rj_tpoints")
    spark.range(0, 48).select(col("id").as("iid"),
        timestamp_micros(col("id") * 3600000000L).as("lo"),
        timestamp_micros(col("id") * 3600000000L + 3000000000L).as("hi"))
      .createOrReplaceTempView("rj_tintervals")
    val sql = """SELECT pid, iid FROM rj_tpoints p JOIN rj_tintervals i
                 ON p.pts BETWEEN i.lo AND i.hi"""
    val baseline = spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(baseline.nonEmpty)
    withConfs(Width -> "3600000000", // 1h buckets in micros
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(sql)
      val rewritten = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rewritten === baseline)
      val physical = df.queryExecution.executedPlan.toString
      assert(!physical.contains("CartesianProduct") &&
             !physical.contains("BroadcastNestedLoopJoin"),
        s"expected an equi-join plan:\n$physical")
    }
  }

  test("rule stays dormant without the width conf or with a broadcastable side") {
    setup
    // no conf: a keyless BETWEEN join nested-loops as stock Spark does
    // (CartesianProduct here because broadcast is disabled)
    withConfs("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val df = spark.sql(sqlKeyless)
      df.collect()
      val physical = df.queryExecution.executedPlan.toString
      assert(physical.contains("CartesianProduct") ||
             physical.contains("BroadcastNestedLoopJoin"))
    }
    // conf set but the interval side is broadcast-small: leave the
    // broadcast nested loop alone (the rewrite would only add shuffles)
    withConfs(Width -> "100") {
      val df = spark.sql(sqlKeyless)
      df.collect()
      assert(df.queryExecution.executedPlan.toString
        .contains("BroadcastNestedLoopJoin"))
    }
  }
}
