package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CompressionSignalSpec extends SparkSpec {

  import spark.implicits._

  test("discriminative ordering: repetitive < prose < random") {
    val rng = new scala.util.Random(7)
    val repetitive = ("spam " * 400).trim
    val prose = Tables.documents(spark, sf0001)
      .orderBy("doc_id").select("text").limit(1)
      .collect()(0).getString(0)
    val random = Array.fill(2000)((33 + rng.nextInt(90)).toChar).mkString
    val out = Seq((1L, repetitive), (2L, prose), (3L, random))
      .toDF("doc_id", "text")
    val r = CompressionSignal.ratios(out, "text")
      .collect().map(x => x.getLong(0) -> x.getDouble(4)).toMap
    assert(r(1L) < r(2L), s"repetitive ${r(1L)} !< prose ${r(2L)}")
    assert(r(2L) < r(3L), s"prose ${r(2L)} !< random ${r(3L)}")
    assert(r(1L) < 0.1 && r(3L) > 0.7)
  }

  test("empty/null text yields null ratio; determinism under repartition") {
    val df = Seq((1L, ""), (2L, "hello hello hello")).toDF("doc_id", "text")
    val r = CompressionSignal.ratios(df, "text").collect()
      .map(x => x.getLong(0) -> Option(x.get(4))).toMap
    assert(r(1L).isEmpty && r(2L).nonEmpty)
    val docs = Tables.documents(spark, sf0001).select("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      CompressionSignal.ratios(d, "text")
        .select("doc_id", "deflate_len").collect()
        .map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
    assert(run(docs) === run(docs.repartition(7)))
  }
}
