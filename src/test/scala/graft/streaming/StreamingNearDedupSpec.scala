package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Doc(doc_id: Long, text: String)

/** Online (first-wins) near-dup dedup: the streaming claim machine fed
  * through MemoryStream — in one trigger and split across several —
  * must keep exactly the docs the batch twin keeps, and the batch twin
  * is oracle-backed (c2_online_dedup_twin). */
class StreamingNearDedupSpec extends SparkSpec {

  import spark.implicits._

  private def streamKept(chunks: Seq[Seq[Doc]], name: String): Set[Long] = {
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Doc]
    val kept = scala.collection.mutable.Set[Long]()
    val q = StreamingNearDedup.bandVerdicts(input.toDF(), "doc_id", "text")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        kept ++= StreamingNearDedup.resolveKept(batch)
          .collect().map(_.getLong(0))
        ()
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory(s"neardedup_$name").toString)
      .start()
    chunks.foreach { c => input.addData(c); q.processAllAvailable() }
    q.stop()
    kept.toSet
  }

  private lazy val corpus = Tables.documents(spark, sf0001)
    .select(col("doc_id"), col("text")).as[Doc].collect().toSeq
    .sortBy(_.doc_id)

  private lazy val batchKept =
    StreamingNearDedup.keptBatch(Tables.documents(spark, sf0001),
      "doc_id", "text").collect().map(_.getLong(0)).toSet

  test("streaming == batch twin, single trigger") {
    val got = streamKept(Seq(corpus), "one")
    assert(batchKept.nonEmpty && batchKept.size < corpus.size,
      "corpus should contain near-dups for the test to bite")
    assert(got === batchKept)
  }

  test("streaming == batch twin, arrival split across three triggers") {
    val third = corpus.size / 3
    val chunks = Seq(corpus.take(third),
      corpus.slice(third, 2 * third), corpus.drop(2 * third))
    assert(streamKept(chunks, "three") === batchKept)
  }

  test("first-wins semantics: later duplicate dropped, unseen doc kept") {
    val a = Doc(1L, "alpha beta gamma delta epsilon zeta")
    val dupOfA = Doc(2L, "alpha beta gamma delta epsilon zeta")
    val fresh = Doc(3L, "one two three four five six seven")
    val got = streamKept(Seq(Seq(a), Seq(dupOfA, fresh)), "firstwins")
    assert(got === Set(1L, 3L))
  }

  test("drop precision and dup recall vs exact-jaccard ground truth") {
    // The low keep-rate (17/500 at sf0.001) is a property of the CORPUS,
    // not an artifact of the greedy 4x4 banding: measure it. Ground
    // truth = token-set jaccard >= 0.5 (unigram shingles, matching the
    // keptBatch default). A drop is justified iff some EARLIER doc is a
    // >=0.5-jaccard partner; a true-dup later doc should be dropped.
    // Measured at HEAD: precision 0.983, recall 0.988 (the corpus is
    // highly self-similar: 481/500 docs have an earlier 0.5+ partner).
    val docs = Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).cache()
    val truth = graft.dedup.DedupGroundTruth
      .jaccardTruthPairs(docs, "doc_id", "text", threshold = 0.5).cache()
    val kept = StreamingNearDedup.keptBatch(docs, "doc_id", "text")
      .select(col("doc_id"))
    val (nDropped, justified, nTrueDup, caught) =
      graft.dedup.DedupGroundTruth.firstWinsQuality(docs, "doc_id", kept, truth)
    assert(nDropped > 0 && nTrueDup > 0)
    assert(justified.toDouble / nDropped >= 0.9,
      s"drop precision too low: $justified/$nDropped")
    assert(caught.toDouble / nTrueDup >= 0.9,
      s"dup recall too low: $caught/$nTrueDup")
  }

  test("mega-buckets stay linear: keeper join emits exactly |claims| rows") {
    // keptBatch has NO degenerate-bucket cap (a cap would change keep
    // semantics vs the streaming fold and the oracle) — so pin the
    // property that makes that safe: the keeper side is one row per
    // bucket, hence the join output is |claims| regardless of skew.
    val docs = Tables.documents(spark, sf0001)
    val claims = graft.dedup.MinHashDedup
      .portableBandedDocs(docs, "doc_id", "text")
      .select(col("doc_id"), explode(col("buckets")).as("bucket")).cache()
    val keepers = claims.groupBy(col("bucket"))
      .agg(min(col("doc_id")).as("keeper")).cache()
    val maxBucket = claims.groupBy(col("bucket")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    info(s"claims=${claims.count()} buckets=${keepers.count()} " +
      s"max bucket size=$maxBucket")
    assert(claims.join(keepers, "bucket").count() === claims.count())
  }

  test("incrementalKept == keptBatch on the union restricted to batch ids") {
    // the semantic pin: with reference ids below batch ids, warm-
    // starting the first-wins machine with the reference is the same
    // as streaming reference-then-batch through one machine
    val docs = graft.Tables.documents(spark, sf001)
    val ref = docs.filter(col("doc_id") < 250)
    val batch = docs.filter(col("doc_id") >= 250)
    val inc = StreamingNearDedup.incrementalKept(batch, ref, "doc_id", "text")
    val union = StreamingNearDedup.keptBatch(docs, "doc_id", "text")
      .filter(col("doc_id") >= 250)
    assert(inc.exceptAll(union).count() === 0)
    assert(union.exceptAll(inc).count() === 0)
    assert(inc.count() > 0, "batch should keep at least one novel doc")
  }

  test("TTL: an expired bucket becomes claimable again; inside horizon still dedups") {
    // A TTL'd (processing-time) stateful query is ALWAYS-ON by
    // construction: once processing-time semantics are in play,
    // `shouldRunAnotherBatch` is permanently true and the engine keeps
    // scheduling (empty) micro-batches — `processAllAvailable` starves
    // and even Trigger.AvailableNow never terminates (measured: 593
    // batches before the test harness killed it). So this test POLLS
    // the verdicts collected by foreachBatch under a deadline instead
    // of waiting for quiescence.
    implicit val sqlCtx = spark.sqlContext
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val a = Doc(1L, "alpha beta gamma delta epsilon zeta")
    val dup = Doc(2L, "alpha beta gamma delta epsilon zeta")

    def runTtl(ttl: java.time.Duration, pauseMs: Long): Map[Long, Boolean] = {
      val verdicts = new java.util.concurrent.ConcurrentHashMap[Long, Boolean]()
      val input = MemoryStream[Doc]
      val q = StreamingNearDedup.bandVerdicts(input.toDF(), "doc_id", "text",
          ttl = org.apache.spark.sql.streaming.TTLConfig(ttl))
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          // any_dup per doc: true iff some band bucket was already claimed
          batch.groupBy(col("doc_id")).agg(max(col("dup")).as("any_dup"))
            .collect().foreach(r => verdicts.put(r.getLong(0), r.getBoolean(1)))
          ()
        }
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ttl").toString)
        .start()
      def await(id: Long): Unit = {
        val deadline = System.nanoTime() + 60e9.toLong
        while (!verdicts.containsKey(id) && System.nanoTime() < deadline)
          Thread.sleep(50)
        assert(verdicts.containsKey(id), s"doc $id never got a verdict")
      }
      input.addData(Seq(a)); await(1L)
      Thread.sleep(pauseMs)
      input.addData(Seq(dup)); await(2L)
      q.stop()
      import scala.jdk.CollectionConverters._
      verdicts.asScala.toMap
    }

    // duplicate arrives AFTER the TTL horizon -> the original claim has
    // expired, the bucket is claimable again, the doc is KEPT. The
    // 100 ms TTL vs 5 s pause gives ~50× slack so a GC pause or slow
    // executor can't deliver the duplicate while the claim still lives
    // (the old 300 ms/1.5 s margin was flaggable as flaky)
    val expired = runTtl(java.time.Duration.ofMillis(100), pauseMs = 5000L)
    assert(expired === Map(1L -> false, 2L -> false),
      s"expired bucket should be claimable again: $expired")

    // duplicate arriving INSIDE the horizon is still dropped
    val inside = runTtl(java.time.Duration.ofMinutes(10), pauseMs = 0L)
    assert(inside === Map(1L -> false, 2L -> true),
      s"inside-horizon duplicate must be dropped: $inside")
  }
}
