package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val assets =
    Multimodal.assetsFromDocuments(Tables.documents(spark, sf0001)).cache()

  test("asset schema carries binary payload + typed metadata") {
    val f = assets.schema("payload")
    assert(f.dataType.typeName === "binary")
    assert(assets.schema("meta").dataType.typeName === "struct")
  }

  test("feature extraction: fixed width, first feature = byte length") {
    val feats = Multimodal.extractFeatures(assets)
    val bad = feats.filter(
      size(col("features")) =!= 6 ||
      element_at(col("features"), 1) =!= length(col("payload")).cast("double"))
    assert(bad.count() === 0)
  }

  test("feature extraction preserves row count and is deterministic") {
    val a = Multimodal.extractFeatures(assets)
    assert(a.count() === assets.count())
    val s1 = a.agg(round(sum(element_at(col("features"), 2)), 6)).collect()(0).getDouble(0)
    val s2 = Multimodal.extractFeatures(assets)
      .agg(round(sum(element_at(col("features"), 2)), 6)).collect()(0).getDouble(0)
    assert(s1 === s2)
  }

  test("frame sampling produces non-empty frame arrays") {
    val framed = Multimodal.sampleFrames(assets)
    assert(framed.filter(size(col("frames")) < 1).count() === 0)
  }

  test("resize bounds payload size and keeps small payloads intact") {
    val resized = Multimodal.resize(assets, targetBytes = 100)
    // decimation by ceil(len/target) keeps at most target bytes
    assert(resized.filter(length(col("resized")) > 100).count() === 0)
    assert(resized.filter(length(col("resized")) < 1).count() === 0)
    // payloads already under target pass through byte-identical
    val small = resized.filter(length(col("payload")) <= 100)
    assert(small.filter(col("resized") =!= col("payload")).count() === 0)
    assert(resized.count() === assets.count())
  }
}
