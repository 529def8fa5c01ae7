package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join (C9): the same attribution join run on
  * two MemoryStreams must match the batch answer — and the batch form
  * is the oracle-backed query d7_interval_join, so the chain
  * stream == batch == DuckDB closes end-to-end. */
class StreamStreamJoinSpec extends SparkSpec {

  import spark.implicits._

  test("stream-stream attribution join == batch interval join") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val purchases = ev.filter(col("event_type") === "purchase")
    val clicks = ev.filter(col("event_type") === "click")

    val pIn = MemoryStream[Ev]
    val cIn = MemoryStream[Ev]
    pIn.addData(purchases.as[Ev].collect().toSeq)
    cIn.addData(clicks.as[Ev].collect().toSeq)
    val q = EventStreams.attributionJoin(pIn.toDF(), cIn.toDF())
      .writeStream.format("memory").queryName("ssj_sink")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()

    val order = Seq(col("purchase_id"), col("click_id"))
    val stream = spark.table("ssj_sink").orderBy(order: _*).collect().toSeq
    val batch = EventStreams.attributionJoin(purchases, clicks)
      .orderBy(order: _*).collect().toSeq
    assert(batch.nonEmpty, "fixture must produce matches")
    assert(stream === batch)
  }

  test("stream-static enrichment join == batch join") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    // static profile dim derived from the batch data: tier by activity
    val profiles = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"), min(col("ts")).as("signup_ts"))
      .withColumn("user_tier",
        when(col("n") >= 20, "heavy").otherwise("light"))
      .select("user_id", "user_tier", "signup_ts")
    val input = MemoryStream[Ev]
    input.addData(ev.as[Ev].collect().toSeq)
    val q = EventStreams.enrichWithProfile(input.toDF(), profiles)
      .writeStream.format("memory").queryName("enrich_sink")
      .outputMode("append").start()
    q.processAllAvailable()
    q.stop()
    val stream = spark.table("enrich_sink").orderBy("event_id")
    val batch = EventStreams.enrichWithProfile(ev, profiles).orderBy("event_id")
    assert(stream.columns.toSeq === batch.columns.toSeq)
    assert(stream.collect().toSeq === batch.collect().toSeq)
  }

  test("interval bounds are half-open: a click at the purchase instant does not match") {
    import java.sql.Timestamp
    val t0 = Timestamp.valueOf("2024-01-01 10:00:00")
    val tIn = Timestamp.valueOf("2024-01-01 09:55:00")
    val tEdge = Timestamp.valueOf("2024-01-01 09:50:00") // exactly -10 min
    val tOut = Timestamp.valueOf("2024-01-01 09:49:59")
    val purchases = Seq(Ev(1L, t0, 7L, "purchase", 5.0)).toDF()
    val clicks = Seq(
      Ev(10L, tIn, 7L, "click", 0.0),
      Ev(11L, tEdge, 7L, "click", 0.0),
      Ev(12L, tOut, 7L, "click", 0.0),
      Ev(13L, t0, 7L, "click", 0.0),
      Ev(14L, tIn, 8L, "click", 0.0)).toDF()
    val got = EventStreams.attributionJoin(purchases, clicks)
      .select("click_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got === Seq(10L, 11L), "closed lower bound, open upper bound")
  }

  test("outer attribution join (batch): unattributed purchases appear with null clicks") {
    val ev = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val purchases = ev.filter(col("event_type") === "purchase")
    val clicks = ev.filter(col("event_type") === "click")
    val inner = EventStreams.attributionJoin(purchases, clicks)
    val outer = EventStreams.attributionJoinOuter(purchases, clicks)
    // outer ⊇ inner, and the extra rows are exactly the unmatched
    // purchases, one row each, with null click columns
    assert(outer.where(col("click_id").isNotNull).count() === inner.count())
    val unmatched = outer.where(col("click_id").isNull)
    assert(unmatched.count() > 0, "fixture must have unattributed purchases")
    assert(unmatched.count() ===
      purchases.count() - inner.select("purchase_id").distinct().count())
    assert(unmatched.select("purchase_ts").na.drop().count()
      === unmatched.count(), "purchase side fully populated")
  }

  test("outer attribution join: stream == batch once the watermark passes") {
    implicit val sqlCtx = spark.sqlContext
    val ev = Tables.events(spark, sf0001)
      .select("event_id", "ts", "user_id", "event_type", "value")
    val purchases = ev.filter(col("event_type") === "purchase")
    val clicks = ev.filter(col("event_type") === "click")
    // outer results emit only after the watermark passes a purchase's
    // candidate interval: feed the real data, then a far-future flush
    // event on BOTH sides so the watermark overtakes every interval
    val maxTs = ev.agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val flushTs = new java.sql.Timestamp(maxTs.getTime + 48L * 3600 * 1000)
    val pIn = MemoryStream[Ev]
    val cIn = MemoryStream[Ev]
    val q = EventStreams.attributionJoinOuter(pIn.toDF(), cIn.toDF())
      .writeStream.format("memory").queryName("ssj_outer_sink")
      .outputMode("append").start()
    pIn.addData(purchases.as[Ev].collect().toSeq)
    cIn.addData(clicks.as[Ev].collect().toSeq)
    q.processAllAvailable()
    pIn.addData(Seq(Ev(-1L, flushTs, -1L, "purchase", 0.0)))
    cIn.addData(Seq(Ev(-2L, flushTs, -1L, "click", 0.0)))
    q.processAllAvailable()
    q.stop()
    val order = Seq(col("purchase_id"), col("click_id"))
    // drop the flush rows before comparing
    val stream = spark.table("ssj_outer_sink")
      .where(col("purchase_id") =!= -1L)
      .orderBy(order: _*).collect().toSeq
    val batch = EventStreams.attributionJoinOuter(purchases, clicks)
      .orderBy(order: _*).collect().toSeq
    assert(batch.exists(_.isNullAt(4)), "fixture has unattributed purchases")
    assert(stream === batch)
  }
}
