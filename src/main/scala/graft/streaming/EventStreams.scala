package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming operators over the `events` stream (C9/C10):
  * watermarked event-time windows, sessionization, and stateful dedup.
  *
  * Every transform here takes a DataFrame and works identically on a
  * batch frame or a `readStream` frame — that is the point: batch
  * equivalence is the correctness oracle for the streaming path
  * (ScalaTest feeds the same rows through MemoryStream and the batch
  * engine and asserts identical results at watermark close).
  *
  * Scale posture: state size is bounded by the watermark horizon ×
  * key cardinality; tumbling windows shuffle once on (window, type);
  * `dropDuplicatesWithinWatermark` keeps only in-horizon keys. All
  * state lives in the state store, partitioned by key — no driver
  * state anywhere.
  */
object EventStreams {

  /** Tumbling hourly aggregate (the streaming twin of query
    * b12_event_time_windows, minus countDistinct, which streaming
    * state doesn't support exactly — approx_count_distinct would be
    * the streaming substitute). */
  def hourlyTumbling(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(col("w.start").as("hour_start"), col("event_type"),
        col("n_events"), col("value_sum"))

  /** Sliding windows: 1-hour span every 15 minutes. */
  def sliding(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("window_start"), col("event_type"), col("n_events"))

  /** Per-user sessions closed by a 10-minute inactivity gap —
    * `session_window` keeps the state machine in the state store. */
  def sessionize(events: DataFrame, gap: String = "10 minutes",
                 watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("session_value"))
      .select(col("w.start").as("session_start"), col("w.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Stateful streaming dedup on event_id within the watermark horizon
    * (C10) — exactly-once-per-key semantics bounded by state TTL. */
  def dedupWithinWatermark(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** End-to-end archive sink (SURVEY C9's readStream → transform →
    * `foreachBatch` shape): watermark-bounded dedup, then every
    * micro-batch lands as date-partitioned parquet — the layout
    * `sources.TableSink` reads back with partition pruning. Returned
    * writer still needs `.option("checkpointLocation", ...).start()`.
    *
    * Replay safety: foreachBatch re-executes a batch whose checkpoint
    * commit was lost, so a blind append would double that batch's rows.
    * Each batch therefore writes under its own `__batch_id` partition
    * with DYNAMIC partition overwrite — a replayed batch replaces
    * exactly the (event_date, __batch_id) partitions it wrote before,
    * never touching other batches: idempotent per batch, the standard
    * foreachBatch file-sink contract.
    *
    * CONTRACT: `outPath` belongs to ONE checkpoint lineage. Batch ids
    * restart at 0 under a fresh checkpoint, so pointing a new query
    * (new checkpointLocation) at an existing archive would overwrite
    * the old run's same-numbered partitions — use a new outPath
    * alongside a new checkpoint. Read the archive back through
    * [[readArchive]], which strips the internal `__batch_id` column. */
  def archiveDeduped(events: DataFrame, outPath: String,
                     watermark: String = "1 hour")
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    dedupWithinWatermark(events, watermark)
      .withColumn("event_date", to_date(col("ts")))
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        batch.withColumn("__batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("event_date", "__batch_id")
          .parquet(outPath)
      }

  /** Reads an [[archiveDeduped]] archive, hiding the idempotency
    * bookkeeping column — readers see the event schema + event_date. */
  def readArchive(spark: org.apache.spark.sql.SparkSession,
                  path: String): DataFrame =
    spark.read.parquet(path).drop("__batch_id")

  /** Stream-static enrichment join (C9): every streaming event picks up
    * its user's profile row from a STATIC (batch) dimension — the
    * broadcast-enrichment pattern. No watermark needed and no state:
    * the static side is planned per micro-batch (broadcast under AQE
    * thresholds), so at 100 TB of stream the cost per batch is the
    * batch size, never the stream history. Works identically on a
    * batch frame (the spec's equivalence oracle). */
  def enrichWithProfile(events: DataFrame, profiles: DataFrame): DataFrame =
    events.join(
      profiles.select(col("user_id"), col("user_tier"), col("signup_ts")),
      Seq("user_id"), "left")

  /** Stream-stream interval join (C9): each `purchase` event joins the
    * same user's `click` events from the preceding `windowMinutes` —
    * the attribution join. Works identically on batch and stream
    * frames; on streams BOTH sides carry watermarks and the join
    * condition bounds click_ts to a finite interval around purchase_ts,
    * which is exactly what lets Spark's symmetric hash join evict
    * state: rows older than (watermark − window) can never match
    * again, so state is O(users × window), not O(stream).
    *
    * Batch twin `d7_interval_join` runs this same function under the
    * DuckDB oracle; StreamStreamJoinSpec asserts stream == batch on a
    * MemoryStream feed. */
  def attributionJoin(purchases: DataFrame, clicks: DataFrame,
                      windowMinutes: Int = 10,
                      watermark: String = "1 hour"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    val c = clicks
      .select(col("event_id").as("click_id"),
        col("user_id").as("click_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    p.join(c,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("purchase_ts") -
          expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("click_ts") < col("purchase_ts"))
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("purchase_value"), col("click_id"), col("click_ts"))
  }

  /** LEFT-OUTER stream-stream interval join — [[attributionJoin]] that
    * also emits UNATTRIBUTED purchases (null click columns): the
    * "which conversions had no preceding touchpoint" question, which
    * the inner join silently drops. On streams this is Spark's
    * watermarked outer join: a purchase is held in state until the
    * click-side watermark passes the end of its candidate interval,
    * THEN emitted with nulls if nothing matched — so outer results
    * trail the watermark by design, state stays O(users × window), and
    * the row set equals the batch twin once the watermark passes
    * (StreamStreamJoinSpec asserts it). Batch twin `d29_attribution_outer`
    * runs this same function under the DuckDB oracle (LEFT JOIN …
    * BETWEEN twin). */
  def attributionJoinOuter(purchases: DataFrame, clicks: DataFrame,
                           windowMinutes: Int = 10,
                           watermark: String = "1 hour"): DataFrame = {
    val p = purchases
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
      .withWatermark("purchase_ts", watermark)
    val c = clicks
      .select(col("event_id").as("click_id"),
        col("user_id").as("click_user"), col("ts").as("click_ts"))
      .withWatermark("click_ts", watermark)
    p.join(c,
      col("user_id") === col("click_user") &&
        col("click_ts") >= col("purchase_ts") -
          expr(s"INTERVAL $windowMinutes MINUTES") &&
        col("click_ts") < col("purchase_ts"),
      "leftOuter")
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        col("purchase_value"), col("click_id"), col("click_ts"))
  }
}
