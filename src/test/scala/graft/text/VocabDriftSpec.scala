package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class VocabDriftSpec extends SparkSpec {

  import spark.implicits._

  private def row(cur: org.apache.spark.sql.DataFrame,
                  prev: org.apache.spark.sql.DataFrame) =
    VocabDrift.summary(cur, prev, "doc_id", "text").collect()(0)

  test("identical corpora: zero divergence, zero churn") {
    val docs = Tables.documents(spark, sf0001)
    val r = row(docs, docs)
    assert(r.getLong(2) === 0L && r.getLong(3) === 0L)
    assert(r.getDouble(4) === 0.0)
  }

  test("disjoint vocabularies: JS = ln 2, full churn") {
    val a = Seq((1L, "x y z"), (2L, "x z")).toDF("doc_id", "text")
    val b = Seq((1L, "p q"), (2L, "q r")).toDF("doc_id", "text")
    val r = row(a, b)
    assert(r.getLong(0) === 3L && r.getLong(1) === 3L)
    assert(r.getLong(2) === 3L && r.getLong(3) === 3L)
    assert(math.abs(r.getDouble(4) - math.log(2.0)) < 1e-6)
  }

  test("divergence is symmetric and bounded") {
    val docs = Tables.documents(spark, sf0001)
    val cur = docs.filter(col("doc_id") >= 250)
      .withColumn("text",
        regexp_replace(col("text"), "\\bspark\\b", "sparkv2"))
    val prev = docs.filter(col("doc_id") < 250)
    val ab = row(cur, prev).getDouble(4)
    val ba = row(prev, cur).getDouble(4)
    assert(ab === ba, "JS must be symmetric")
    assert(ab > 0.0 && ab < math.log(2.0) + 1e-12)
  }
}
