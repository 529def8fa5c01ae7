package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column queries (C6): binary payload plumbing with typed
  * metadata. Byte-level aggregates are engine-portable (oracle); the
  * batched feature-extraction path (stubbed decoder) is rows-checked +
  * ScalaTest-verified.
  */
object MultimodalQueries extends Registry {

  val queries: Map[String, Q] = Map(
    // C6: per-modality byte accounting over the binary payload column.
    "c6_modality_stats" -> ((s, d) =>
      Multimodal.assetsFromDocuments(Tables.documents(s, d))
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("n_assets"),
             sum(length(col("payload")).cast("bigint")).as("total_bytes"),
             min(length(col("payload")).cast("bigint")).as("min_bytes"),
             max(length(col("payload")).cast("bigint")).as("max_bytes"))),
    // C6: batched partition-local feature extraction (decoder stubbed,
    // batching/schema real) → per-modality feature moments.
    "c6_feature_extract" -> ((s, d) =>
      Multimodal.extractFeatures(
        Multimodal.assetsFromDocuments(Tables.documents(s, d)))
        .groupBy(col("modality"))
        .agg(round(avg(element_at(col("features"), 2)), 6).as("mean_byte_avg"),
             count(lit(1)).as("n"))),
  )

  val oracle: Map[String, String] = Map(
    "c6_modality_stats" -> """
      SELECT 'text/' || lang AS modality, count(*) AS n_assets,
             CAST(sum(octet_length(text::BLOB)) AS BIGINT) AS total_bytes,
             CAST(min(octet_length(text::BLOB)) AS BIGINT) AS min_bytes,
             CAST(max(octet_length(text::BLOB)) AS BIGINT) AS max_bytes
      FROM documents GROUP BY 1""",
    // c6_feature_extract: decoder stub output — ScalaTest-verified.
  )
}
