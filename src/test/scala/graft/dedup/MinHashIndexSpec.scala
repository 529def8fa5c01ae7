package graft.dedup

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The persisted-bucket-index contract (the near-dup analog of
  * IvfIndexSpec): serving a batch against the persisted reference
  * bucket set returns EXACTLY what a fresh
  * StreamingNearDedup.incrementalKept recompute returns (shared serve
  * path, same banding parameters), and the index side of the serving
  * join is read in place — bucketed scan, no Exchange. */
class MinHashIndexSpec extends SparkSpec {

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("mh_index").toString

  test("serving from the persisted index equals a fresh incremental recompute") {
    val docs = Tables.documents(spark, sf001).localCheckpoint()
    val ref = docs.filter(col("doc_id") < 250)
    val batch = docs.filter(col("doc_id") >= 250)
    MinHashIndex.write(ref, "doc_id", "text",
      table = "mh_spec_buckets", path = s"$tmp/idx")
    val served = MinHashIndex.incrementalKept(spark, "mh_spec_buckets",
      batch, "doc_id", "text")
    val recomputed = graft.streaming.StreamingNearDedup.incrementalKept(
      batch, ref, "doc_id", "text")
    assert(recomputed.count() > 0, "degenerate fixture: no keeps at all")
    assert(served.exceptAll(recomputed).isEmpty &&
           recomputed.exceptAll(served).isEmpty,
      "served index keeps diverged from the one-shot recompute")
  }

  test("incremental merge: (write ∪ merge) ≡ one-shot rebuild of the union") {
    val docs = Tables.documents(spark, sf001).localCheckpoint()
    val part1 = docs.filter(col("doc_id") < 150)
    val part2 = docs.filter(col("doc_id") >= 150 && col("doc_id") < 250)
    val batch = docs.filter(col("doc_id") >= 250)
    MinHashIndex.write(part1, "doc_id", "text",
      table = "mh_incr_buckets", path = s"$tmp/idx_incr", numBuckets = 4)
    MinHashIndex.merge(spark, "mh_incr_buckets", part2, "doc_id", "text",
      numBuckets = 4)
    MinHashIndex.write(part1.union(part2), "doc_id", "text",
      table = "mh_full_buckets", path = s"$tmp/idx_full", numBuckets = 4)
    // banding is per-document, so the merged DISTINCT bucket set must
    // equal the one-shot union's exactly
    val merged = spark.table("mh_incr_buckets")
    val full = spark.table("mh_full_buckets")
    assert(merged.count() === merged.distinct().count(),
      "merge introduced duplicate buckets")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
      "merged bucket set != one-shot union bucket set")
    // and serving is therefore identical too
    val servedMerged = MinHashIndex.incrementalKept(spark,
      "mh_incr_buckets", batch, "doc_id", "text")
    val servedFull = MinHashIndex.incrementalKept(spark,
      "mh_full_buckets", batch, "doc_id", "text")
    assert(servedMerged.exceptAll(servedFull).isEmpty &&
           servedFull.exceptAll(servedMerged).isEmpty)
    // an empty batch is a no-op
    MinHashIndex.merge(spark, "mh_incr_buckets", batch.limit(0),
      "doc_id", "text", numBuckets = 4)
    assert(spark.table("mh_incr_buckets").count() === full.count())
  }

  test("index side of the serving join is bucketed — no Exchange on it") {
    val docs = Tables.documents(spark, sf001).localCheckpoint()
    MinHashIndex.write(docs.filter(col("doc_id") < 250), "doc_id", "text",
      table = "mh_plan_buckets", path = s"$tmp/idx2", numBuckets = 4)
    // force the shuffle join family: a broadcast of the tiny spec-sized
    // bucket set would trivially avoid exchanges and hide the property
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val served = MinHashIndex.incrementalKept(spark, "mh_plan_buckets",
        docs.filter(col("doc_id") >= 250), "doc_id", "text")
      served.collect() // finalize the AQE plan before reading it
      // AdaptiveSparkPlan.toString prints Final AND Initial plans —
      // assert on the final section only or every exchange counts twice
      val physical = served.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(physical.contains("Bucketed: true"),
        s"index scan not bucketed:\n${physical.take(2000)}")
      // the index side's join key is renamed __ref_bucket (the
      // IvfIndex __cell/__qcell trick), so an index-side shuffle is
      // visible BY NAME — it must never appear. The batch side owns
      // its exchanges: raw claims onto the bucket key, plus the
      // map-combined (bucket, min) keeper partials — both move batch
      // rows only, never the index.
      assert(!physical.contains("Exchange hashpartitioning(__ref_bucket"),
        s"the INDEX side shuffled:\n${physical.take(4000)}")
      // and every remaining bucket-key exchange is batch-side: the
      // claims shuffle onto the index layout, the map-combined keeper
      // partials at conf shuffle partitions, and — when conf
      // partitions ≠ the index bucket count, the NORMAL cluster case
      // (e.g. 16000 vs 32) — a third tiny re-alignment of those
      // (bucket, min) rows to the bucketed layout. All of them move
      // batch-derived rows only, never the index.
      val batchExchanges =
        "Exchange hashpartitioning\\(bucket[^\\n]*plan_id=(\\d+)".r
          .findAllMatchIn(physical).map(_.group(1)).toSet
      assert(batchExchanges.size <= 3,
        s"unexpected extra bucket-key exchanges " +
          s"(${batchExchanges.size}):\n${physical.take(4000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
