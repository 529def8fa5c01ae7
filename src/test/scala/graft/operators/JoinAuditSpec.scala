package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class JoinAuditSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed cardinality and skew on a hot key") {
    val l = Seq(1, 1, 1, 2, 3).map(k => (k.toLong, "l")).toDF("k", "s")
    val r = Seq(1, 1, 2, 4).map(k => (k.toLong, "r")).toDF("k", "s")
    // key 1: 3·2 = 6, key 2: 1·1 = 1; keys 3/4 don't match → total 7
    val rows = JoinAudit.joinCardinality(l, r, Seq("k"), k = 10)
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4),
          x.getDouble(5), x.getLong(6))).toMap
    assert(rows.keySet === Set(1L, 2L))
    assert(rows(1L) === ((3L, 2L, 6L, 7L, 0.857143, 1L)), rows.toString)
    assert(rows(2L) === ((1L, 1L, 1L, 7L, 0.142857, 2L)), rows.toString)
  }

  test("prediction equals the real join size on events self-join") {
    val ev = graft.Tables.events(spark, sf0001).select("user_id")
    val audit = JoinAudit.joinCardinality(ev, ev, Seq("user_id"),
      k = 1).head
    val predicted = audit.getLong(4)
    val actual = ev.as("a").join(ev.as("b"), "user_id").count()
    assert(predicted === actual,
      s"audit says $predicted, real join is $actual")
  }

  test("disjoint keys predict zero without dividing by it") {
    val l = Seq(1L).toDF("k")
    val r = Seq(2L).toDF("k")
    val rows = JoinAudit.joinCardinality(l, r, Seq("k")).collect()
    assert(rows.isEmpty)
  }
}
