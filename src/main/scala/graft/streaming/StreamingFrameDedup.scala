package graft.streaming

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig}

/** One asset's claim on one frame hash. */
case class FrameClaim(asset_id: Long, fhash: Long)

/** Per-frame verdict: was this hash first claimed by an earlier asset? */
case class FrameVerdict(asset_id: Long, dup: Boolean)

/** State record: the frame hash's first claimant. */
case class FrameClaimant(asset_id: Long)

/** ONLINE VIDEO DEDUP — the streaming twin of
  * [[graft.multimodal.PerceptualHash.videoNearDupPairs]]: videos arrive
  * in micro-batches, each is kept or dropped AT ARRIVAL. Semantics are
  * greedy first-wins over FRAME hashes (the StreamingNearDedup shape,
  * with frame hashes where text dedup has LSH band buckets): every
  * arriving video claims its distinct frame hashes whether or not it
  * is kept, and a video is dropped when ≥ `minDupFrac` of its distinct
  * frames were already claimed — re-uploads, trims and shifted copies
  * share most frames; a single common title card does not cross a
  * sensible threshold.
  *
  * Scale shape: state holds ONE tiny record per distinct frame hash
  * (the first claimant), partitioned by hash — no signature matrix, no
  * pair join. A video costs its decode + |signature| state lookups.
  * TTL bounds state on an unending stream (the dedup-horizon trade,
  * same as text).
  *
  * Because "first claimant" is min asset_id once ids follow arrival
  * order, the stream equals the batch rule — dup frames are those
  * whose hash has a smaller claimant somewhere in the corpus — and
  * [[keptBatch]] computes that with one hash AGGREGATE + re-join
  * (never a per-hash window; the StreamingNearDedup anti-straggler
  * argument). The batch twin sits under the exact DuckDB oracle on
  * the closed-form GIF fixture (c6_online_frame_dedup_twin); stream ==
  * batch is StreamingFrameDedupSpec's job. */
object StreamingFrameDedup {

  class FirstFrameClaimProcessor(ttl: TTLConfig = TTLConfig.NONE)
      extends StatefulProcessor[Long, FrameClaim, FrameVerdict] {
    @transient private var claimant:
      org.apache.spark.sql.streaming.ValueState[FrameClaimant] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      claimant = getHandle.getValueState[FrameClaimant]("claimant",
        Encoders.product[FrameClaimant], ttl)

    override def handleInputRows(key: Long, rows: Iterator[FrameClaim],
                                 timerValues: TimerValues)
        : Iterator[FrameVerdict] = {
      // fold in asset order so a micro-batch split is invisible
      val sorted = rows.toSeq.sortBy(_.asset_id)
      var first = Option(claimant.get())
      val out = sorted.map { r =>
        val dup = first.exists(_.asset_id != r.asset_id)
        if (first.isEmpty) {
          first = Some(FrameClaimant(r.asset_id))
          claimant.update(first.get)
        }
        FrameVerdict(r.asset_id, dup)
      }
      out.iterator
    }
  }

  /** Per-(asset, frame-hash) verdicts for a stream of
    * `(asset_id, payload)` rows. The signature (distinct frame hashes)
    * is built INSIDE the per-row decode — no cross-row state — then
    * exploded into claims. Requires the RocksDB state store. */
  def frameVerdicts(assets: DataFrame, idCol: String,
                    ttl: TTLConfig = TTLConfig.NONE): DataFrame = {
    val sigs = graft.multimodal.PerceptualHash.frameSignatures(assets)
      .select(col(idCol).cast("long").as("asset_id"),
        explode(col("sig")).as("fhash"))
    import sigs.sparkSession.implicits._
    val mode = if (ttl == TTLConfig.NONE) TimeMode.None()
               else TimeMode.ProcessingTime()
    sigs.as[FrameClaim]
      .groupByKey(_.fhash)
      .transformWithState(new FirstFrameClaimProcessor(ttl), mode,
        OutputMode.Append())
      .toDF()
  }

  /** Fold verdicts → per-asset keep decision (run inside foreachBatch,
    * where an asset's verdicts are complete): kept iff the dup
    * fraction of its distinct frames stays BELOW `minDupFrac`. Output:
    * `(asset_id, n_frames, n_dup, dup_frac (6dp), kept)`. */
  def resolveKept(verdicts: DataFrame, minDupFrac: Double = 0.5): DataFrame =
    verdicts.groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("dup").cast("long")).as("n_dup"))
      .withColumn("dup_frac", round(col("n_dup").cast("double")
        / col("n_frames").cast("double"), 6))
      .withColumn("kept", col("dup_frac") < minDupFrac)

  /** Batch twin over `(asset_id, payload)`: a frame is dup iff its
    * hash's MIN claimant is a smaller asset id; same resolve. Equals
    * the streaming fold whenever ids follow arrival order. */
  def keptBatch(assets: DataFrame, idCol: String,
                minDupFrac: Double = 0.5): DataFrame = {
    val sig = graft.multimodal.PerceptualHash.frameSignatures(assets)
      .select(col(idCol).cast("long").as("asset_id"),
        explode(col("sig")).as("fhash"))
      .localCheckpoint() // feeds the min-agg AND the re-join
    val firsts = sig.groupBy(col("fhash"))
      .agg(min(col("asset_id")).as("__first"))
    sig.join(firsts, "fhash")
      .select(col("asset_id"), (col("__first") < col("asset_id")).as("dup"))
      .groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum(col("dup").cast("long")).as("n_dup"))
      .withColumn("dup_frac", round(col("n_dup").cast("double")
        / col("n_frames").cast("double"), 6))
      .withColumn("kept", col("dup_frac") < minDupFrac)
  }
}
