package graft.streaming

import graft.dedup.MinHashDedup
import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig}

/** One doc's claim on one LSH band bucket. */
case class BandClaim(doc_id: Long, bucket: String)

/** Per-band verdict: was this bucket already claimed by an earlier doc? */
case class BandVerdict(doc_id: Long, dup: Boolean)

/** State-store record: the bucket's first claimant. */
case class BucketClaimant(doc_id: Long)

/** ONLINE near-duplicate dedup — the streaming twin of the MinHash/LSH
  * pipeline in [[graft.dedup.MinHashDedup]]: documents arrive in
  * micro-batches and each is kept or dropped AT ARRIVAL, never
  * revisited. Semantics are greedy first-wins (the standard shape for
  * online corpus ingestion): a doc is dropped iff ANY of its band
  * buckets was claimed by an earlier doc — earlier micro-batch, or
  * smaller doc_id within the batch — where every arriving doc claims
  * its buckets whether or not it is kept. This differs from the batch
  * pipeline's connected-components clustering (which can see the whole
  * graph); greedy is what one-pass ingestion can decide.
  *
  * Scale shape: the state store holds ONE tiny record per distinct
  * bucket (the first claimant), partitioned by bucket key — no
  * signature matrix, no candidate join, no driver state. A doc's cost
  * is its banding projection plus `bands` state lookups. Pass a
  * `TTLConfig` to bound state on an unending stream (expired buckets
  * become claimable again — dedup horizon = TTL, the usual production
  * trade).
  *
  * Because "first claimant of a bucket" is order-insensitive once ids
  * are assigned in arrival order, the streaming fold equals a batch
  * rule — doc kept iff it is the min doc_id of EVERY bucket it lands
  * in — and that batch twin ([[keptBatch]]) uses the engine-portable
  * banding of [[MinHashDedup.portableBandedDocs]], so it sits under
  * the driver's exact DuckDB oracle (c2_online_dedup_twin). Stream ==
  * batch is asserted in StreamingNearDedupSpec; batch == DuckDB by the
  * oracle. */
object StreamingNearDedup {

  /** First-wins claim machine, keyed by bucket string: `ValueState`
    * holds the first claimant ever seen; rows within a micro-batch are
    * folded in doc_id order so a batch split is invisible. */
  class FirstClaimProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[String, BandClaim, BandVerdict] {
    @transient private var claimant:
      org.apache.spark.sql.streaming.ValueState[BucketClaimant] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      claimant = getHandle.getValueState[BucketClaimant]("claimant",
        Encoders.product[BucketClaimant], ttl)

    override def handleInputRows(key: String, rows: Iterator[BandClaim],
                                 timerValues: TimerValues)
        : Iterator[BandVerdict] = {
      val sorted = rows.toSeq.sortBy(_.doc_id)
      var first = Option(claimant.get())
      val out = sorted.map { r =>
        val dup = first.exists(_.doc_id != r.doc_id)
        if (first.isEmpty) {
          first = Some(BucketClaimant(r.doc_id))
          claimant.update(first.get)
        }
        BandVerdict(r.doc_id, dup)
      }
      out.iterator
    }
  }

  /** Exploded (doc_id, bucket) claims — a projection, streaming-safe. */
  private def claims(docs: DataFrame, idCol: String, textCol: String,
                     numHashes: Int, bands: Int, shingleSize: Int,
                     seed: Long): DataFrame =
    MinHashDedup.portableBandedDocs(docs, idCol, textCol, numHashes, bands,
        shingleSize, seed)
      .select(col("doc_id").cast("long").as("doc_id"),
        explode(col("buckets")).as("bucket"))

  /** Streaming per-band verdicts: one row per (doc, band) saying
    * whether that band bucket was already claimed. All of a doc's
    * verdicts land in its arrival micro-batch, so [[resolveKept]]
    * inside `foreachBatch` yields the kept doc ids per batch. Requires
    * the RocksDB state store provider (state v2). */
  def bandVerdicts(docs: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 16, bands: Int = 4, shingleSize: Int = 1,
                   seed: Long = 42L, ttl: TTLConfig = TTLConfig.NONE)
      : DataFrame = {
    val c = claims(docs, idCol, textCol, numHashes, bands, shingleSize, seed)
    import c.sparkSession.implicits._
    // state TTL is only evaluated under processing-time semantics —
    // TimeMode.None would reject (or silently never expire) the config
    val mode = if (ttl == TTLConfig.NONE) TimeMode.None()
               else TimeMode.ProcessingTime()
    c.as[BandClaim]
      .groupByKey(_.bucket)
      .transformWithState(new FirstClaimProcessor(ttl), mode,
        OutputMode.Append())
      .toDF()
  }

  /** Batch aggregation of [[bandVerdicts]] output → kept doc ids (docs
    * none of whose bands were previously claimed). Run inside
    * `foreachBatch`, where each doc's verdicts are complete. */
  def resolveKept(verdicts: DataFrame): DataFrame =
    verdicts.groupBy(col("doc_id"))
      .agg(max(col("dup")).as("any_dup"))
      .filter(!col("any_dup"))
      .select(col("doc_id"))

  /** Batch twin: kept = docs that are the min doc_id of EVERY band
    * bucket they land in; `min(boolean)` is conjunction. Bucket minima
    * come from a hash AGGREGATE + re-join rather than
    * `min over (partition by bucket)`: a window pins each bucket to one
    * task (a degenerate boilerplate bucket = one straggler, and AQE
    * cannot split window skew), while the agg is partial/final
    * map-combined and the re-join is AQE-skew-splittable. Equals the
    * streaming fold whenever doc ids are assigned in arrival order. */
  def keptBatch(docs: DataFrame, idCol: String, textCol: String,
                numHashes: Int = 16, bands: Int = 4, shingleSize: Int = 1,
                seed: Long = 42L): DataFrame = {
    // The banding projection (shingle → Horner → 16 permutations) is the
    // dominant cost; make sure it runs on every core. A single small
    // parquet row group scans as ONE partition, pinning the whole hash
    // pass to one thread — at real scale scan partitions ≫ cores and
    // this is a no-op (never a repartition of a large input).
    // Only probe the partition count when the plan is NARROW over its
    // source: on an exchange-bearing plan (join/agg/window upstream),
    // Dataset.rdd forces AQE to execute every upstream query stage just
    // to report a number — doubling arbitrary caller work — and such
    // plans already spread across shuffle partitions anyway.
    import org.apache.spark.sql.catalyst.plans.logical._
    val p = docs.sparkSession.sparkContext.defaultParallelism
    val narrowOverSource = !docs.queryExecution.optimizedPlan.exists {
      case _: Join | _: Aggregate | _: Window | _: Distinct | _: Deduplicate |
           _: RepartitionOperation | _: Sort => true
      case _ => false
    }
    val wide =
      if (narrowOverSource && docs.rdd.getNumPartitions < p) docs.repartition(p)
      else docs
    // checkpoint BEFORE the explode: post-explode, the explode-pushdown
    // filter re-evaluates the full banding pipeline a second time; the
    // pre-explode (doc_id, buckets) frame evaluates it once, feeds both
    // join sides, and the explode of a materialized 4-element array is
    // free.
    val banded = MinHashDedup.portableBandedDocs(wide, idCol, textCol,
        numHashes, bands, shingleSize, seed)
      .select(col("doc_id").cast("long").as("doc_id"), col("buckets"))
      .localCheckpoint()
    val c = banded.select(col("doc_id"), explode(col("buckets")).as("bucket"))
    // NO degenerate-bucket cap here, unlike the candidate-PAIR paths:
    // dropping a mega bucket there only loses candidates; here it would
    // CHANGE keep semantics (every doc in the dropped bucket would keep,
    // diverging from the streaming fold and the oracle). A mega bucket
    // is also harmless in this shape: the per-bucket min is a partial
    // (map-combined) aggregate, and the re-join probes ONE keeper row
    // per bucket, so output stays exactly |claims| rows — linear, and
    // AQE can split a skewed join partition. Linearity is pinned in
    // StreamingNearDedupSpec.
    val keepers = c.groupBy(col("bucket")).agg(min(col("doc_id")).as("keeper"))
    c.join(keepers, "bucket")
      .groupBy(col("doc_id"))
      .agg(min(col("doc_id") === col("keeper")).as("all_first"))
      .filter(col("all_first"))
      .select(col("doc_id"))
  }

  /** INCREMENTAL near-dup — the nightly-crawl companion to
    * c1_incremental_dedup at the LSH-band level: a new `batch` keeps a
    * doc iff none of its band buckets is claimed by the existing
    * `reference` corpus AND it is the min-id claimant of each of its
    * buckets within the batch (every batch doc claims its buckets,
    * kept or not — the online machine's rule). This is exactly the
    * warm-start of [[FirstClaimProcessor]]: stream the reference
    * first, then the batch — equivalently `keptBatch(reference ∪
    * batch)` restricted to batch ids whenever reference ids precede
    * batch ids (spec-pinned). Appending tomorrow's batch never
    * re-decides today's keeps.
    *
    * Scale shape: reference buckets arrive as a DISTINCT projection
    * joined (shuffled, never broadcast-pinned — the reference is the
    * BIG side) onto the batch claims; the within-batch rule is the
    * same skew-safe agg+re-join as [[keptBatch]]. Nothing rescans the
    * reference text: at 100 TB the distinct bucket set is the compact
    * incremental state you persist between runs. */
  def incrementalKept(batch: DataFrame, reference: DataFrame,
                      idCol: String, textCol: String, numHashes: Int = 16,
                      bands: Int = 4, shingleSize: Int = 1,
                      seed: Long = 42L): DataFrame = {
    val refBuckets = MinHashDedup.portableBandedDocs(reference, idCol,
        textCol, numHashes, bands, shingleSize, seed)
      .select(explode(col("buckets")).as("bucket")).distinct()
    incrementalKeptAgainstBuckets(batch, refBuckets, idCol, textCol,
      numHashes, bands, shingleSize, seed)
  }

  /** The incremental serve path shared by [[incrementalKept]]
    * (reference banded on the fly) and
    * [[graft.dedup.MinHashIndex.incrementalKept]] (bucket set read
    * from a persisted BUCKETED table). `refBuckets` must be a
    * single-column `bucket` frame, distinct per bucket.
    *
    * The reference join runs FIRST, directly on the batch claims: the
    * claims shuffle once onto the bucket key, and when `refBuckets` is
    * a bucketed scan its layout IS the join partitioning — the index
    * side is read in place with no Exchange (MinHashIndexSpec asserts
    * it on the executed plan; the reference key is renamed
    * `__ref_bucket` so an index-side shuffle would be visible by name,
    * the IvfIndex `__cell`/`__qcell` trick — alias-aware output
    * partitioning carries the bucketed layout through the rename).
    * The within-batch keeper minima ride a SECOND batch-side exchange
    * that is map-side combined down to one (bucket, min) row per
    * input partition — Catalyst prunes the ref join out of that
    * branch because min is duplicate-insensitive. When conf shuffle
    * partitions ≠ the index bucket count (the normal cluster case),
    * those already-tiny keeper rows re-align to the bucketed layout
    * in one more exchange; every bucket-key shuffle in the plan moves
    * batch-derived rows only, never the index. Since `refBuckets` is
    * distinct, the left join preserves claim multiplicity, so keeper
    * minima are identical to computing them before the join. */
  private[graft] def incrementalKeptAgainstBuckets(batch: DataFrame,
      refBuckets: DataFrame, idCol: String, textCol: String,
      numHashes: Int, bands: Int, shingleSize: Int,
      seed: Long): DataFrame = {
    val ref = refBuckets.select(col("bucket").as("__ref_bucket"),
      lit(true).as("__ref"))
    val c = MinHashDedup.portableBandedDocs(batch, idCol, textCol,
        numHashes, bands, shingleSize, seed)
      .select(col("doc_id").cast("long").as("doc_id"), col("buckets"))
      .localCheckpoint()
      .select(col("doc_id"), explode(col("buckets")).as("bucket"))
    val claims = c.join(ref, col("bucket") === col("__ref_bucket"), "left")
      .select(col("doc_id"), col("bucket"),
        coalesce(col("__ref"), lit(false)).as("__hit"))
    val keepers = claims.groupBy(col("bucket"))
      .agg(min(col("doc_id")).as("keeper"))
    claims.join(keepers, "bucket")
      .groupBy(col("doc_id"))
      .agg(min(col("doc_id") === col("keeper")).as("all_first"),
           max(col("__hit")).as("any_ref"))
      .filter(col("all_first") && !col("any_ref"))
      .select(col("doc_id"))
  }
}
