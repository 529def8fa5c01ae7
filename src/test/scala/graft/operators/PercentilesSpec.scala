package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PercentilesSpec extends SparkSpec {

  import spark.implicits._

  test("rank-selection percentiles equal the buffered exact " +
    "percentile() aggregate on real data") {
    val li = Tables.lineitem(spark, sf0001)
    val buffered = li.groupBy(col("l_returnflag"))
      .agg(round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(l_extendedprice, 0.75)"), 4).as("p75"),
        round(expr("percentile(l_extendedprice, 0.95)"), 4).as("p95"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    val ranked = Percentiles.exactByRank(li, Seq("l_returnflag"),
      "l_extendedprice",
      Seq("p25" -> 0.25, "p50" -> 0.5, "p75" -> 0.75, "p95" -> 0.95))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(ranked === buffered)
  }

  test("edge quantiles and tiny groups: p=0 is the min, p=1 the max, " +
    "a 1-row group returns its value for every p") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 4.0), ("a", 8.0),
      ("b", 42.0)).toDF("g", "v")
    val r = Percentiles.exactByRank(df, Seq("g"), "v",
      Seq("p0" -> 0.0, "p50" -> 0.5, "p100" -> 1.0))
      .collect().map(x => x.getString(0) ->
        (x.getDouble(1), x.getDouble(2), x.getDouble(3))).toMap
    assert(r("a") === ((1.0, 3.0, 8.0))) // h=1.5 → 2 + (4-2)*0.5
    assert(r("b") === ((42.0, 42.0, 42.0)))
  }

  test("the plan carries NO per-group percentile buffer — a window " +
    "sort + hash aggregate instead") {
    val li = Tables.lineitem(spark, sf0001)
    val plan = Percentiles.exactByRank(li, Seq("l_returnflag"),
      "l_extendedprice", Seq("p50" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("percentile("),
      "must not fall back to the buffered aggregate")
    assert(plan.contains("Window"), s"expected a window sort: $plan")
  }
}
