package graft.tools

import graft.{GraftExtensions, Tables}
import graft.streaming.{EventStreams, StreamingNearDedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Worked END-TO-END streaming example — the always-on ingest shape the
  * operator specs verify piecewise, wired up for real:
  *
  *   file source (one parquet chunk per micro-batch, the object-store
  *   landing-zone pattern) → [[StreamingNearDedup.bandVerdicts]] →
  *   `foreachBatch` { [[StreamingNearDedup.resolveKept]] → the
  *   curation-v3 gates: exact decontamination against a fixed eval
  *   slice (≤ 20% gram overlap) + quality-score floor } with per-batch
  *   kept/curated-rate + state-store row logging, then an
  *   [[EventStreams.hourlyTumbling]] watermarked window over the same
  *   landing zone.
  *
  * The run closes the loop against the BATCH twins TWICE: after the
  * stream drains, (1) kept ids must equal
  * [[StreamingNearDedup.keptBatch]] on the full corpus, and (2) the
  * CURATED ids (dedup ∘ decontaminate ∘ quality) must equal the same
  * gates applied batch-side to the keptBatch set — the composed
  * pipeline, not just its dedup stage, is stream==batch. (The gates
  * are per-doc against static reference data, so they commute with
  * micro-batching by construction; the check pins it.)
  *
  * Usage: runMain graft.tools.StreamingDedupDemo [sfDir] [nChunks]
  * (defaults: /root/testdata/sf0.01, 8 chunks). Runs in well under a
  * minute at sf0.01.
  */
object StreamingDedupDemo {

  /** Stages `df` into `dir` as `n` parquet files holding CONTIGUOUS
    * `orderCol` ranges, with increasing mtimes so the file stream
    * replays them in that order — arrival order == `orderCol` order,
    * the way a real ingest feed behaves. */
  private def stageOrdered(df: org.apache.spark.sql.Dataset[
      org.apache.spark.sql.Row], orderCol: String, n: Int, work: String,
      dir: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    import org.apache.spark.sql.expressions.Window
    // materialized once: every per-chunk filter+write below would
    // otherwise re-run the global-sort ntile window (n sorts of the
    // corpus instead of one)
    val tagged = df.withColumn("__chunk",
      ntile(n).over(Window.orderBy(col(orderCol))) - 1)
      .localCheckpoint()
    (0 until n).foreach { i =>
      val stage = s"$work/stage_${dir.replaceAll(".*/", "")}_$i"
      tagged.filter(col("__chunk") === i).drop("__chunk")
        .coalesce(1).write.parquet(stage)
      val part = new java.io.File(stage).listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val target = java.nio.file.Paths.get(f"$dir/chunk_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, target)
      target.toFile.setLastModified(1700000000000L + i * 60000L)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.01")
    val nChunks = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // transformWithState (the first-claim machine) requires RocksDB
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("graft_demo").toString
    val landing = s"$work/landing"
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    // landing zone: nChunks parquet files, one micro-batch each
    // (maxFilesPerTrigger=1), as CONTIGUOUS doc_id ranges — the greedy
    // first-wins fold equals the keptBatch min-id rule only when ids
    // are assigned in arrival order, which is exactly what a real
    // ingest does (ids ARE arrival order); hash-scattering ids across
    // batches would be replaying the corpus out of order. (The global
    // ntile window inside stageOrdered is demo STAGING, not an
    // operator — production data arrives pre-ordered.)
    stageOrdered(docs, "doc_id", nChunks, work, landing)
    val nDocs = docs.count()
    println(s"[demo] corpus $sfDir: $nDocs docs staged as $nChunks ordered chunks")

    // ---- streaming near-dedup over the landing zone ----------------
    val stream = spark.readStream.schema(docs.schema)
      .option("maxFilesPerTrigger", "1").parquet(landing)
    // TTLConfig.NONE keeps TimeMode.None so AvailableNow terminates;
    // an unbounded production ingest would pass a TTL horizon here
    val verdicts = StreamingNearDedup.bandVerdicts(stream, "doc_id", "text")
    val keptIds = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val curatedIds = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val seen = new java.util.concurrent.atomic.AtomicLong()
    // curation-v3 gates, streamed: the eval slice is STATIC reference
    // data (a benchmark suite doesn't change per micro-batch), so both
    // gates are per-doc and commute with batching. localCheckpoint the
    // eval side once — every micro-batch probes it.
    val evalSlice = docs.filter(col("doc_id") < 100)
      .select(col("text")).localCheckpoint()
    def curate(keptDocs: DataFrame): DataFrame = {
      val contam = graft.dedup.Decontaminate.contaminationScoreExact(
        keptDocs, evalSlice, "doc_id", "text")
      // LEFT join + coalesce(0): the score emits no row for docs too
      // short to form a single 8-gram, and those have trivially zero
      // eval overlap — an inner join would silently drop them from
      // the curated set (and the batch twin would agree, hiding it)
      keptDocs.join(contam.select(col("doc_id"), col("contamination")),
          Seq("doc_id"), "left")
        .filter(coalesce(col("contamination"), lit(0.0)) <= 0.2)
        .withColumn("quality",
          graft.text.TextFunctions.qualityScore(col("text")))
        .filter(col("quality") >= 0.5)
        .select(col("doc_id"))
    }
    val query = verdicts.writeStream
      .queryName("near_dedup_curation")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val keptDf = StreamingNearDedup.resolveKept(batch).localCheckpoint()
        val kept = keptDf.collect().map(_.getLong(0))
        // payload lookup by id from the store (a real pipeline carries
        // text alongside or fetches it by key — same join shape)
        val curated = curate(docs.join(keptDf, "doc_id"))
          .collect().map(_.getLong(0))
        val docsInBatch = batch.select("doc_id").distinct().count()
        seen.addAndGet(docsInBatch)
        kept.foreach(k => keptIds.add(k))
        curated.foreach(c => curatedIds.add(c))
        println(f"[demo] batch $id%2d: $docsInBatch%4d docs, " +
          f"${kept.length}%4d kept (${
            if (docsInBatch == 0) 0.0 else 100.0 * kept.length / docsInBatch
          }%5.1f%%), ${curated.length}%4d curated, " +
          f"cumulative kept ${keptIds.size()} / curated ${curatedIds.size()}")
        ()
      }
      .option("checkpointLocation", s"$work/ckpt_dedup")
      .trigger(Trigger.AvailableNow())
      .start()
    query.awaitTermination()
    // state-store footprint: one row per claimed band bucket
    val stateRows = Option(query.lastProgress)
      .toSeq.flatMap(_.stateOperators.toSeq.map(_.numRowsTotal)).sum
    println(s"[demo] stream drained: ${seen.get()} docs seen, " +
      s"${keptIds.size()} kept, state store holds $stateRows bucket claims")

    // ---- cross-check: stream == batch twin --------------------------
    val batchKept = StreamingNearDedup.keptBatch(docs, "doc_id", "text")
      .collect().map(_.getLong(0)).toSet
    val streamKept = {
      import scala.jdk.CollectionConverters._
      keptIds.asScala.toSet
    }
    require(streamKept == batchKept,
      s"stream kept ${streamKept.size} != batch twin ${batchKept.size}")
    println(s"[demo] stream kept set == keptBatch twin (${batchKept.size} docs) ✓")

    // ---- cross-check 2: the COMPOSED pipeline is stream == batch ----
    val batchCurated = curate(
        docs.join(StreamingNearDedup.keptBatch(docs, "doc_id", "text"),
          "doc_id"))
      .collect().map(_.getLong(0)).toSet
    val streamCurated = {
      import scala.jdk.CollectionConverters._
      curatedIds.asScala.toSet
    }
    require(streamCurated == batchCurated,
      s"stream curated ${streamCurated.size} != batch twin ${batchCurated.size}")
    println(s"[demo] stream curated set (dedup ∘ decontaminate ∘ quality) " +
      s"== batch twin (${batchCurated.size} docs) ✓")

    // ---- watermarked event-time window over a second stream --------
    val events = Tables.events(spark, sfDir)
      .select("ts", "event_type", "value", "user_id", "event_id")
    val evLanding = s"$work/events"
    // time-ordered chunks: a watermark tolerates BOUNDED disorder, so
    // replaying randomly-sliced history would silently drop everything
    // behind the advanced watermark — order by event time, as a real
    // feed (kafka by log-append time, files by landing time) would be
    stageOrdered(events, "ts", 4, work, evLanding)
    val evStream = spark.readStream.schema(events.schema)
      .option("maxFilesPerTrigger", "1").parquet(evLanding)
    var windowRows = 0L
    val evQuery = EventStreams.hourlyTumbling(evStream).writeStream
      .queryName("hourly_windows")
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, id: Long) =>
        val n = batch.count()
        windowRows += n
        println(s"[demo] window batch $id: $n closed hourly windows")
        ()
      }
      .option("checkpointLocation", s"$work/ckpt_windows")
      .trigger(Trigger.AvailableNow())
      .start()
    evQuery.awaitTermination()
    println(s"[demo] hourly windows emitted at watermark close: $windowRows " +
      "(append mode holds back the final open hour until its watermark passes)")
    println(s"[demo] done; artifacts under $work")
    spark.stop()
  }
}
