package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurationFunnelSpec extends SparkSpec {

  import spark.implicits._

  test("first-fail attribution matches the composed filter chain") {
    val df = Seq(
      (1L, 5, "en"),   // fails gate 0 (len)
      (2L, 20, "de"),  // passes 0, fails 1 (lang)
      (3L, 50, "en"),  // survives
      (4L, 3, "de"),   // fails 0 — gate 1 must NOT also be charged
      (5L, 50, "en"))  // survives
      .toDF("id", "len", "lang")
    val stages = Seq(
      "len" -> (col("len") >= 10),
      "lang" -> (col("lang") === "en"))
    val out = CurationFunnel.report(df, stages)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(0L) === (("len", 5L, 2L, 3L)))
    assert(out(1L) === (("lang", 3L, 1L, 2L)))
    // ground truth by actually composing the filters
    val after0 = df.filter(stages(0)._2)
    val after1 = after0.filter(stages(1)._2)
    assert(after0.count() === out(0L)._4 && after1.count() === out(1L)._4)
  }

  test("null predicates fail the row; gates that drop nothing still report") {
    val df = Seq((1L, Some(5)), (2L, None), (3L, Some(50)))
      .toDF("id", "len")
    val out = CurationFunnel.report(df, Seq(
        "len" -> (col("len") >= 10),
        "noop" -> lit(true)))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // null len fails the len gate (charged there, not silently lost)
    assert(out(0L) === ((3L, 2L, 1L)))
    assert(out(1L) === ((1L, 0L, 1L)))
  }

  test("drop rates are per-gate conditional, and counts telescope") {
    val out = CurationFunnel.report(
        graft.Tables.documents(spark, sf0001), Seq(
          "min_chars" -> (col("n_chars") >= 100),
          "lang" -> col("lang").isin("en", "fr", "es")))
      .orderBy("stage_idx").collect()
    out.sliding(2).foreach { w =>
      if (w.length == 2) assert(w(0).getLong(4) === w(1).getLong(2),
        "n_out of gate i must equal n_in of gate i+1")
    }
    out.foreach { r =>
      assert(r.getLong(2) === r.getLong(3) + r.getLong(4))
    }
  }
}
