package graft.multimodal

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ENERGY VAD — voice-activity segmentation over the windowed frame
  * features ([[Multimodal.audioFrameFeatures]]): a frame is VOICED
  * when its exact integer energy clears a per-sample threshold
  * (Σ s² ≥ τ·n — per-sample so partial tail windows are judged
  * fairly), voiced frames merge into segments across gaps of up to
  * `hangover` unvoiced frames (the classic VAD hangover that keeps
  * short pauses inside an utterance), and segments shorter than
  * `minFrames` voiced frames are dropped as clicks. This is the step
  * between frame features and every speech-pipeline consumer —
  * silence trimming, per-segment quality gates, ASR batching — and
  * the audio twin of event sessionization (same gap-merge shape, the
  * axis is frames instead of time).
  *
  * Scale/determinism: input is the frame table (bounded fan-out of
  * the decode scan); the only shuffle is the per-asset window over
  * frame_idx (assets bound partition size the way users bound
  * session windows). Voicing is an exact integer compare, segment
  * boundaries are integer gap arithmetic — the whole operator sits
  * under the exact oracle on the closed-form WAV fixture. */
object Vad {

  /** Segments over `frames` (needs asset_id, frame_idx, n_samples,
    * energy). Output: `(asset_id, seg_idx, start_frame, end_frame,
    * n_voiced)` with seg_idx dense from 1 per asset. */
  def segments(frames: DataFrame, threshPerSample: Long,
               hangover: Int = 1, minFrames: Int = 2): DataFrame = {
    require(threshPerSample >= 0 && hangover >= 0 && minFrames >= 1)
    val voiced = frames.filter(
      col("energy") >= lit(threshPerSample) * col("n_samples"))
    val w = Window.partitionBy(col("asset_id")).orderBy(col("frame_idx"))
    val newSeg = when(lag(col("frame_idx"), 1).over(w).isNull ||
      col("frame_idx") - lag(col("frame_idx"), 1).over(w)
        > lit(hangover.toLong + 1L), 1L).otherwise(0L)
    val runs = Window.partitionBy(col("asset_id")).orderBy(col("frame_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    voiced
      .withColumn("__seg", sum(newSeg).over(runs))
      .groupBy(col("asset_id"), col("__seg"))
      .agg(min(col("frame_idx")).as("start_frame"),
        max(col("frame_idx")).as("end_frame"),
        count(lit(1)).as("n_voiced"))
      .filter(col("n_voiced") >= minFrames)
      .select(col("asset_id"), col("__seg").as("seg_idx"),
        col("start_frame"), col("end_frame"), col("n_voiced"))
  }

  /** Per-asset speech summary off [[segments]]' input: voiced/total
    * frame counts and the speech ratio (6 dp) — the "is this clip
    * mostly silence" curation gate. */
  def speechRatio(frames: DataFrame, threshPerSample: Long): DataFrame =
    frames.groupBy(col("asset_id"))
      .agg(count(lit(1)).as("n_frames"),
        sum((col("energy") >= lit(threshPerSample) * col("n_samples"))
          .cast("long")).as("n_voiced"))
      .withColumn("speech_ratio",
        round(col("n_voiced").cast("double") /
          col("n_frames").cast("double"), 6))
}
