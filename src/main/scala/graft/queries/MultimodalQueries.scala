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
    // C6: batched partition-local feature extraction (byte-stats
    // fallback path, batching/schema real) under the EXACT oracle: the
    // payloads are the same deterministic PPM fixture as
    // c6_image_decode (header "P6\nW H\n255\n" + pixel(i) =
    // (doc_id + i) mod 256), so decodeStub's length / mean byte /
    // 4-bin histogram are pure integer arithmetic DuckDB recomputes
    // without touching the bytes.
    "c6_feature_extract" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 50).select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.ppmFixtureBytes(
          (4 + id % 5).toInt, (3 + id % 4).toInt, id)))
        .toDF("asset_id", "payload")
      Multimodal.extractFeatures(fixture)
        .select(col("asset_id"),
          element_at(col("features"), 1).cast("bigint").as("n_bytes"),
          round(element_at(col("features"), 2), 6).as("mean_byte"),
          element_at(col("features"), 3).cast("bigint").as("bin0"),
          element_at(col("features"), 4).cast("bigint").as("bin1"),
          element_at(col("features"), 5).cast("bigint").as("bin2"),
          element_at(col("features"), 6).cast("bigint").as("bin3"))
    }),
    // C6: frame sampling under the exact oracle — every 256th 64-byte
    // slice of the payload (the video frame-sample shape, minus the
    // codec), reported as per-asset frame count + first/last frame
    // digests. Spark slices BYTES of the binary payload; the DuckDB
    // twin slices CHARACTERS of the text — equal because the corpus is
    // pure ASCII (asserted: octet_length == length on every doc, same
    // trick c6_modality_stats uses).
    "c6_frame_sample" -> ((s, d) =>
      Multimodal.sampleFrames(
          Multimodal.assetsFromDocuments(Tables.documents(s, d)))
        .select(col("asset_id"), col("modality"),
          size(col("frames")).cast("bigint").as("n_frames"),
          md5(element_at(col("frames"), 1)).as("first_md5"),
          md5(element_at(col("frames"), -1)).as("last_md5"))),
    // C6: REAL image decode under the exact oracle — PPM fixture bytes
    // are built per doc_id with pixel(i) = (doc_id + i) mod 256, decoded
    // by the pure-JVM P6 parser; DuckDB recomputes dimensions and
    // channel means from the same closed form without touching bytes.
    "c6_image_decode" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 50).select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.ppmFixtureBytes(
          (4 + id % 5).toInt, (3 + id % 4).toInt, id)))
        .toDF("asset_id", "payload")
      Multimodal.decodeImages(fixture)
        .select(col("asset_id"), col("format"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
    }),
  )

  val oracle: Map[String, String] = Map(
    "c6_modality_stats" -> """
      SELECT 'text/' || lang AS modality, count(*) AS n_assets,
             CAST(sum(octet_length(text::BLOB)) AS BIGINT) AS total_bytes,
             CAST(min(octet_length(text::BLOB)) AS BIGINT) AS min_bytes,
             CAST(max(octet_length(text::BLOB)) AS BIGINT) AS max_bytes
      FROM documents GROUP BY 1""",
    // c6_feature_extract: decodeStub byte stats over the closed-form PPM
    // fixture — header ASCII codes + (id + i) mod 256 pixels, all
    // integer arithmetic.
    "c6_feature_extract" -> """
      WITH f AS (
        SELECT doc_id AS asset_id,
               CAST(4 + doc_id % 5 AS BIGINT) AS w,
               CAST(3 + doc_id % 4 AS BIGINT) AS h
        FROM documents WHERE doc_id < 50
      ), b AS (
        SELECT asset_id,
          list_transform(range(1, length('P6' || chr(10) || w || ' ' || h || chr(10) || '255' || chr(10)) + 1),
            i -> ascii(('P6' || chr(10) || w || ' ' || h || chr(10) || '255' || chr(10))[i:i]))
          || list_transform(range(0, 3 * w * h), i -> (asset_id + i) % 256)
          AS bytes
        FROM f
      )
      SELECT asset_id,
        CAST(len(bytes) AS BIGINT) AS n_bytes,
        round(CAST(list_sum(bytes) AS DOUBLE) / len(bytes), 6) AS mean_byte,
        CAST(len(list_filter(bytes, c -> c // 64 = 0)) AS BIGINT) AS bin0,
        CAST(len(list_filter(bytes, c -> c // 64 = 1)) AS BIGINT) AS bin1,
        CAST(len(list_filter(bytes, c -> c // 64 = 2)) AS BIGINT) AS bin2,
        CAST(len(list_filter(bytes, c -> c // 64 = 3)) AS BIGINT) AS bin3
      FROM b""",
    "c6_frame_sample" -> """
      WITH f AS (
        SELECT doc_id AS asset_id, 'text/' || lang AS modality,
          list_transform(
            range(0, greatest((length(text) - 1) // 256, 0) + 1),
            i -> text[i * 256 + 1 : i * 256 + 64]) AS frames
        FROM documents)
      SELECT asset_id, modality,
        CAST(len(frames) AS BIGINT) AS n_frames,
        md5(frames[1]) AS first_md5,
        md5(frames[-1]) AS last_md5
      FROM f""",
    "c6_image_decode" -> """
      WITH f AS (
        SELECT doc_id AS asset_id,
               CAST(4 + doc_id % 5 AS BIGINT) AS width,
               CAST(3 + doc_id % 4 AS BIGINT) AS height
        FROM documents WHERE doc_id < 50
      )
      SELECT asset_id, 'ppm' AS format, width, height,
        CAST(list_sum(list_transform(range(0, width * height),
              p -> (asset_id + 3 * p + 0) % 256)) AS DOUBLE) / (width * height) AS mean_r,
        CAST(list_sum(list_transform(range(0, width * height),
              p -> (asset_id + 3 * p + 1) % 256)) AS DOUBLE) / (width * height) AS mean_g,
        CAST(list_sum(list_transform(range(0, width * height),
              p -> (asset_id + 3 * p + 2) % 256)) AS DOUBLE) / (width * height) AS mean_b
      FROM f""",
  )
}
