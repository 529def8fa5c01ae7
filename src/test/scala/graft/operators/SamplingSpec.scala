package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001).cache()

  test("deterministic: identical row sets across runs and layouts") {
    val f = Map("en" -> 0.5, "de" -> 0.8)
    val a = Sampling.stratified(docs, "doc_id", "lang", f, 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratified(docs.repartition(7), "doc_id", "lang", f, 0.2)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("nested: lower rate samples are subsets of higher rate samples") {
    def ids(r: Double) =
      Sampling.stratified(docs, "doc_id", "lang", Map.empty, r)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    val s10 = ids(0.1); val s30 = ids(0.3); val s100 = ids(1.0)
    assert(s10.subsetOf(s30))
    assert(s30.subsetOf(s100))
    assert(s100.size === docs.count())
  }

  test("per-stratum rates land near their targets") {
    val f = Map("en" -> 0.3, "fr" -> 0.7)
    val sampled = Sampling.stratified(docs, "doc_id", "lang", f, 0.0)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // only listed strata survive a zero default
    assert(sampled.keySet.subsetOf(f.keySet))
    f.foreach { case (lang, rate) =>
      val got = sampled.getOrElse(lang, 0L).toDouble / totals(lang)
      assert(math.abs(got - rate) < 0.15, s"$lang: got $got, want ~$rate")
    }
  }
}
