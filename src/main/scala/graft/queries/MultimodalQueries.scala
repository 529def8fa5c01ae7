package graft.queries

import graft.Tables
import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column queries (C6): binary payload plumbing with typed
  * metadata. Byte-level aggregates and LOSSLESS real decodes (PPM
  * parser, ImageIO PNG) are engine-portable closed forms under the
  * DuckDB oracle; lossy JPEG decode and the resize round-trip are
  * rows-checked + ScalaTest-bounded (deterministic within one JDK, not
  * across decoders).
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
    // C6: batched partition-local feature extraction routed through the
    // REAL image decode (extractFeatures decodes the PPM fixture and
    // emits imageFeatures = width/height/channel means/pixel count)
    // under the EXACT oracle: pixel(i) = (doc_id + i) mod 256 is a
    // closed form DuckDB recomputes without touching the bytes — the
    // same arithmetic c6_image_decode pins, now through the feature
    // vector path.
    "c6_feature_extract" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 50).select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.ppmFixtureBytes(
          (4 + id % 5).toInt, (3 + id % 4).toInt, id)))
        .toDF("asset_id", "payload")
      Multimodal.extractFeatures(fixture)
        .select(col("asset_id"),
          element_at(col("features"), 1).cast("bigint").as("width"),
          element_at(col("features"), 2).cast("bigint").as("height"),
          element_at(col("features"), 3).as("mean_r"),
          element_at(col("features"), 4).as("mean_g"),
          element_at(col("features"), 5).as("mean_b"),
          element_at(col("features"), 6).cast("bigint").as("n_pixels"))
    }),
    // C6 rows-only: the same feature extraction over REAL
    // documents-derived payloads (text bytes → decodeStub fallback) —
    // keeps a bench row measuring the scan-and-extract path over actual
    // table payloads (the fixture query above measures decode
    // arithmetic, not table scanning).
    "c6_feature_extract_raw" -> ((s, d) =>
      Multimodal.extractFeatures(
          Multimodal.assetsFromDocuments(Tables.documents(s, d)))
        .select(col("asset_id"),
          element_at(col("features"), 1).cast("bigint").as("n_bytes"),
          round(element_at(col("features"), 2), 6).as("mean_byte"))),
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
    // C6: REAL PNG decode via javax.imageio under the exact oracle —
    // the PNG fixture encodes the SAME closed-form pixels as the PPM
    // one ((doc_id + i) mod 256), and PNG is lossless, so ImageIO's
    // decoded channel means equal the identical DuckDB arithmetic.
    // This is the real-corpus decode path (a JPEG/PNG reader), not a
    // hand-rolled parser.
    "c6_png_decode" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 50).select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.imageFixtureBytes(
          (4 + id % 5).toInt, (3 + id % 4).toInt, id, "png")))
        .toDF("asset_id", "payload")
      Multimodal.decodeImages(fixture)
        .select(col("asset_id"), col("format"), col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
    }),
    // C6: MULTI-FRAME decode under the exact oracle — animated GIF
    // (the JDK's closest thing to video): per-frame grayscale means of
    // the 256-gray-palette fixture are the closed form
    // (asset_id + 7·frame + p) mod 256, encoded losslessly because the
    // fixture's own IndexColorModel becomes the GIF color table. One
    // row per decoded frame — the unit of frame-level corpus work.
    "c6_gif_frames" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 30).select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.gifFixtureBytes(
          (4 + id % 5).toInt, (3 + id % 4).toInt, (2 + id % 3).toInt, id)))
        .toDF("asset_id", "payload")
      Multimodal.decodeImageFrames(fixture)
        .select(col("asset_id"), col("frame_idx"), col("format"),
          col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
    }),
    // C6: MULTI-PAGE TIFF through the same frame walk — the second
    // multi-frame container (scanned sequences / multi-page docs),
    // same pixel rule, so the identical closed-form oracle applies
    // with format = 'tif'. TiffFramesSpec pins container-invariance
    // of the frame hashes (GIF frames ≡ TIFF frames).
    "c6_tiff_frames" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 30).select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.tiffFixtureBytes(
          (4 + id % 5).toInt, (3 + id % 4).toInt, (2 + id % 3).toInt, id)))
        .toDF("asset_id", "payload")
      Multimodal.decodeImageFrames(fixture)
        .select(col("asset_id"), col("frame_idx"), col("format"),
          col("width"), col("height"),
          col("mean_r"), col("mean_g"), col("mean_b"))
    }),
    // C6: VIDEO DEDUP under the exact oracle — the chained composition
    // decodeFrames → per-frame aHash → signature-overlap pairs, over a
    // planted-dup multi-frame fixture: asset (g, m) is member m of
    // group g with seed g·1000 + 7m, so member m's frame f is
    // bit-identical to member 0's frame f+m (the fixture's pixel rule
    // (seed + 7f + p) mod 256 makes a +7 seed shift a one-frame
    // trim) — shifted/trimmed copies of the same footage, the real
    // video-dedup shape. DuckDB recomputes every frame hash from the
    // closed form (tiny frames ⇒ cell = pixel, bit p iff v·n > Σv,
    // exactly the aHash integer rule) and the same Jaccard screen.
    "c6_frame_dedup" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 30).select(col("doc_id")).as[Long]
        .map { id =>
          val g = id % 10L; val m = id / 10L
          (id, Multimodal.gifFixtureBytes(
            (4 + g % 5).toInt, (3 + g % 4).toInt, 6, g * 1000L + 7L * m))
        }.toDF("asset_id", "payload")
      graft.multimodal.PerceptualHash.videoNearDupPairs(
        graft.multimodal.PerceptualHash.hashFrames(fixture), "asset_id",
        minJaccard = 0.45, maxHashFreq = 8)
    }),
    // C6: SHOT BOUNDARIES + keyframe selection — segment each fixture
    // video where consecutive frame hashes jump by > 4 bits, keep one
    // keyframe per shot: the frame-SAMPLING op (every-Nth oversamples
    // static shots, misses cuts). Same fixture and closed-form hash
    // oracle as c6_frame_dedup; pure XOR+popcount integer arithmetic.
    "c6_shot_boundaries" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 30).select(col("doc_id")).as[Long]
        .map { id =>
          val g = id % 10L; val m = id / 10L
          (id, Multimodal.gifFixtureBytes(
            (4 + g % 5).toInt, (3 + g % 4).toInt, 6, g * 1000L + 7L * m))
        }.toDF("asset_id", "payload")
      graft.multimodal.PerceptualHash.shotBoundaries(
        graft.multimodal.PerceptualHash.hashFrames(fixture), "asset_id",
        maxDist = 4)
    }),
    // C6: HAMMING-TOLERANT video dedup — the re-encode shape exact
    // frame matching misses: m=2 copies carry a +2 luma shift across
    // the fixture's mod-256 wrap, landing every frame hash at Hamming
    // distance 2 from its twin (zero EXACT shared frames). Group seeds
    // straddle the wrap 14 apart so only true frame twins sit within
    // t=4; group 2 never wraps — its shift is hash-invariant (a
    // uniform luma shift cancels in the cell-vs-mean rule) and its
    // trio matches exactly. DuckDB recomputes every hash from the
    // closed form and the same one-hop min-canonicalization (a plain
    // distance cross-join over the tiny distinct-hash set — the
    // banding the Spark side uses is lossless for t < nBands, so the
    // two candidate generators provably agree).
    "c6_frame_dedup_hamming" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 9).select(col("doc_id")).as[Long]
        .map { id =>
          val g = id % 3L; val m = id / 3L
          val base = if (g == 0L) 224L else if (g == 1L) 238L else 100L
          (id, Multimodal.gifFixtureBytes(7, 5, 2,
            base + (if (m == 2L) 2L else 0L)))
        }.toDF("asset_id", "payload")
      graft.multimodal.PerceptualHash.videoNearDupPairs(
        graft.multimodal.PerceptualHash.hashFrames(fixture), "asset_id",
        minJaccard = 0.45, maxHashFreq = 8, maxFrameDist = 4)
    }),
    // C6: ONLINE video dedup BATCH TWIN — greedy first-wins over frame
    // hashes (the StreamingNearDedup shape on the video modality):
    // kept iff < 50% of an asset's distinct frames were claimed by an
    // earlier asset. Stream ≡ batch is StreamingFrameDedupSpec's job;
    // batch ≡ DuckDB here on the same planted fixture as
    // c6_frame_dedup.
    "c6_online_frame_dedup_twin" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 30).select(col("doc_id")).as[Long]
        .map { id =>
          val g = id % 10L; val m = id / 10L
          (id, Multimodal.gifFixtureBytes(
            (4 + g % 5).toInt, (3 + g % 4).toInt, 6, g * 1000L + 7L * m))
        }.toDF("asset_id", "payload")
      graft.streaming.StreamingFrameDedup.keptBatch(fixture, "asset_id")
        .withColumn("kept", col("kept").cast("int"))
    }),
    // C6 rows-only: JPEG decode — lossy, so pixel values are
    // decoder-deterministic within one JDK but not a cross-engine
    // closed form; MultimodalSpec bounds the means against the source
    // pixels instead. Dimensions ARE exact.
    "c6_jpeg_decode" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 50).select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.imageFixtureBytes(
          (4 + id % 5).toInt, (3 + id % 4).toInt, id, "jpg")))
        .toDF("asset_id", "payload")
      Multimodal.decodeImages(fixture)
        .select(col("asset_id"), col("format"), col("width"), col("height"),
          round(col("mean_r"), 2).as("mean_r"),
          round(col("mean_g"), 2).as("mean_g"),
          round(col("mean_b"), 2).as("mean_b"))
    }),
    // C6: REAL audio decode under the exact oracle — WAV/PCM-16 fixture
    // with sample(i) = ((doc_id + i) mod 65536) - 32768, parsed by the
    // pure-JVM RIFF chunk walk; DuckDB recomputes |sample| stats from
    // the same closed form without touching bytes. Stereo rows exercise
    // the frames = samples/channels arithmetic.
    "c6_audio_decode" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 50).select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.wavFixtureBytes(
          (100 + id % 50).toInt, (1 + id % 2).toInt, 8000, id)))
        .toDF("asset_id", "payload")
      Multimodal.decodeAudios(fixture)
        .select(col("asset_id"), col("aformat"), col("channels"),
          col("sample_rate"), col("n_frames"), col("mean_abs"),
          col("peak_abs"))
    }),
    // C6: windowed audio frame features (the VAD/segmentation framing
    // step) over the same closed-form PCM fixture — 32-PCM-frame
    // windows so every asset gets several windows INCLUDING a partial
    // tail; integer sum/peak/energy + one-division mean per window.
    "c6_audio_frames" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 50).select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.wavFixtureBytes(
          (100 + id % 50).toInt, (1 + id % 2).toInt, 8000, id)))
        .toDF("asset_id", "payload")
      Multimodal.audioFrameFeatures(fixture, frameLen = 32)
        .select(col("asset_id"), col("frame_idx"), col("n_samples"),
          col("mean_abs"), col("peak_abs"), col("energy"))
    }),
    // C6: energy VAD — voiced/unvoiced segmentation over the windowed
    // frame energies of a block-modulated WAV fixture (alternating
    // loud / near-silent 64-sample blocks): exact integer energy
    // threshold, hangover gap-merge, min-length click filter. The
    // speech pipeline's silence-trim step under the exact oracle.
    "c6_vad_segments" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 50).select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.wavBlockFixtureBytes(
          (200 + id % 64).toInt, 8000, id)))
        .toDF("asset_id", "payload")
      val frames = Multimodal.audioFrameFeatures(fixture, frameLen = 32)
      graft.multimodal.Vad.segments(frames,
        threshPerSample = 100000000L, hangover = 1, minFrames = 2)
    }),
    // C6: letterbox/border detection — the crop step BEFORE perceptual
    // hashing (black bars own the luma grid and zero out hash
    // overlap). Planted borders on the closed-form PPM fixture; exact
    // integer blank-line scans → oracle.
    "c6_borders" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 50).select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.ppmBorderFixtureBytes(
          (10 + id % 4).toInt, (8 + id % 3).toInt,
          (id % 3).toInt, ((id + 1) % 3).toInt,
          (id % 2).toInt, ((id + 2) % 3).toInt, id)))
        .toDF("asset_id", "payload")
      graft.multimodal.PerceptualHash.detectBorders(fixture)
        .select(col("asset_id"), col("top"), col("bottom"),
          col("left"), col("right"), col("boxed"))
    }),
    // C6 rows-only: real resize — decode the PNG fixture, bilinear
    // scale to 8x8, re-encode PNG, decode AGAIN and report the
    // round-tripped dimensions (all 8x8 ⇒ the plumbing is proven by
    // the decode of the resized bytes, spec'd in MultimodalSpec).
    "c6_image_resize" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 50).select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.imageFixtureBytes(
          (4 + id % 5).toInt, (3 + id % 4).toInt, id, "png")))
        .toDF("asset_id", "payload")
      Multimodal.decodeImages(
          Multimodal.resizeImages(fixture, targetW = 8, targetH = 8)
            .drop("payload").withColumnRenamed("resized_img", "payload"))
        .select(col("asset_id"), col("format"), col("width"), col("height"))
    }),
    // C6: image perceptual hash (PerceptualHash.aHash) on REAL PNG
    // decode — the fixtures fit inside the 8×8 grid, so every cell is
    // one pixel and the exact integer bit rule (luma·N > totalLuma)
    // is DuckDB-expressible; PNG is lossless so ImageIO's pixels equal
    // the closed form.
    "c6_phash" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 50).select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.imageFixtureBytes(
          (4 + id % 5).toInt, (3 + id % 4).toInt, id, "png")))
        .toDF("asset_id", "payload")
      graft.multimodal.PerceptualHash.hashImages(fixture)
        .select(col("asset_id"), col("phash"))
    }),
    // C6: difference hash on the same lossless fixture — horizontal
    // GRADIENT bits (adjacent-pixel compares here: the images fit
    // inside the 9×8 dHash grid), the contrast-shift-proof sibling of
    // aHash real dedup kits pair with it. Exact integer compares →
    // closed-form oracle.
    "c6_dhash" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 50).select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.imageFixtureBytes(
          (4 + id % 5).toInt, (3 + id % 4).toInt, id, "png")))
        .toDF("asset_id", "payload")
      graft.multimodal.PerceptualHash.dHashImages(fixture)
        .select(col("asset_id"), col("dhash"))
    }),
    // C6: image near-dup pairs — banded blocking over the hash (the
    // SimHash pigeonhole argument on pixels), exact Hamming confirm;
    // lossless for maxDist < nBands, so the naive-pairs oracle matches.
    "c6_phash_pairs" -> ((s, d) => {
      import s.implicits._
      val fixture = Tables.documents(s, d)
        .filter(col("doc_id") < 50).select(col("doc_id")).as[Long]
        .map(id => (id, Multimodal.imageFixtureBytes(
          (4 + id % 5).toInt, (3 + id % 4).toInt, id, "png")))
        .toDF("asset_id", "payload")
      graft.multimodal.PerceptualHash.nearDupPairs(
        graft.multimodal.PerceptualHash.hashImages(fixture),
        "asset_id", maxDist = 3, nBands = 4)
    }),
  )

  val oracle: Map[String, String] = Map(
    "c6_modality_stats" -> """
      SELECT 'text/' || lang AS modality, count(*) AS n_assets,
             CAST(sum(octet_length(text::BLOB)) AS BIGINT) AS total_bytes,
             CAST(min(octet_length(text::BLOB)) AS BIGINT) AS min_bytes,
             CAST(max(octet_length(text::BLOB)) AS BIGINT) AS max_bytes
      FROM documents GROUP BY 1""",
    // c6_feature_extract: extractFeatures now routes decodable images
    // through the REAL decode, so the oracle is the image closed form
    // (same arithmetic as c6_image_decode) shaped as the feature
    // vector: width, height, channel means, pixel count.
    "c6_feature_extract" -> """
      WITH f AS (
        SELECT doc_id AS asset_id,
               CAST(4 + doc_id % 5 AS BIGINT) AS width,
               CAST(3 + doc_id % 4 AS BIGINT) AS height
        FROM documents WHERE doc_id < 50
      )
      SELECT asset_id, width, height,
        CAST(list_sum(list_transform(range(0, width * height),
              p -> (asset_id + 3 * p + 0) % 256)) AS DOUBLE) / (width * height) AS mean_r,
        CAST(list_sum(list_transform(range(0, width * height),
              p -> (asset_id + 3 * p + 1) % 256)) AS DOUBLE) / (width * height) AS mean_g,
        CAST(list_sum(list_transform(range(0, width * height),
              p -> (asset_id + 3 * p + 2) % 256)) AS DOUBLE) / (width * height) AS mean_b,
        width * height AS n_pixels
      FROM f""",
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
    "c6_tiff_frames" -> """
      WITH f AS (
        SELECT doc_id AS asset_id,
               CAST(4 + doc_id % 5 AS BIGINT) AS width,
               CAST(3 + doc_id % 4 AS BIGINT) AS height,
               CAST(2 + doc_id % 3 AS BIGINT) AS n_frames
        FROM documents WHERE doc_id < 30
      ), fr AS (
        SELECT asset_id, width, height, CAST(u.f AS BIGINT) AS frame_idx
        FROM f, unnest(range(0, n_frames)) AS u(f)
      )
      SELECT asset_id, frame_idx, 'tif' AS format, width, height,
        CAST(list_sum(list_transform(range(0, width * height),
              p -> (asset_id + 7 * frame_idx + p) % 256)) AS DOUBLE)
          / (width * height) AS mean_r,
        CAST(list_sum(list_transform(range(0, width * height),
              p -> (asset_id + 7 * frame_idx + p) % 256)) AS DOUBLE)
          / (width * height) AS mean_g,
        CAST(list_sum(list_transform(range(0, width * height),
              p -> (asset_id + 7 * frame_idx + p) % 256)) AS DOUBLE)
          / (width * height) AS mean_b
      FROM fr""",
    "c6_gif_frames" -> """
      WITH f AS (
        SELECT doc_id AS asset_id,
               CAST(4 + doc_id % 5 AS BIGINT) AS width,
               CAST(3 + doc_id % 4 AS BIGINT) AS height,
               CAST(2 + doc_id % 3 AS BIGINT) AS n_frames
        FROM documents WHERE doc_id < 30
      ), fr AS (
        SELECT asset_id, width, height, CAST(u.f AS BIGINT) AS frame_idx
        FROM f, unnest(range(0, n_frames)) AS u(f)
      )
      SELECT asset_id, frame_idx, 'gif' AS format, width, height,
        CAST(list_sum(list_transform(range(0, width * height),
              p -> (asset_id + 7 * frame_idx + p) % 256)) AS DOUBLE)
          / (width * height) AS mean_r,
        CAST(list_sum(list_transform(range(0, width * height),
              p -> (asset_id + 7 * frame_idx + p) % 256)) AS DOUBLE)
          / (width * height) AS mean_g,
        CAST(list_sum(list_transform(range(0, width * height),
              p -> (asset_id + 7 * frame_idx + p) % 256)) AS DOUBLE)
          / (width * height) AS mean_b
      FROM fr""",
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
    // c6_png_decode: PNG is lossless, so ImageIO's decode of the PNG
    // fixture reproduces the identical closed-form pixels — the only
    // difference from c6_image_decode is the format label.
    "c6_png_decode" -> """
      WITH f AS (
        SELECT doc_id AS asset_id,
               CAST(4 + doc_id % 5 AS BIGINT) AS width,
               CAST(3 + doc_id % 4 AS BIGINT) AS height
        FROM documents WHERE doc_id < 50
      )
      SELECT asset_id, 'png' AS format, width, height,
        CAST(list_sum(list_transform(range(0, width * height),
              p -> (asset_id + 3 * p + 0) % 256)) AS DOUBLE) / (width * height) AS mean_r,
        CAST(list_sum(list_transform(range(0, width * height),
              p -> (asset_id + 3 * p + 1) % 256)) AS DOUBLE) / (width * height) AS mean_g,
        CAST(list_sum(list_transform(range(0, width * height),
              p -> (asset_id + 3 * p + 2) % 256)) AS DOUBLE) / (width * height) AS mean_b
      FROM f""",
    // c6_audio_decode: |sample| stats of the closed-form PCM fixture —
    // pure integer arithmetic plus the same one-double-division mean
    // pattern as the image oracles.
    "c6_audio_decode" -> """
      WITH f AS (
        SELECT doc_id AS asset_id,
               CAST(100 + doc_id % 50 AS BIGINT) AS n_frames,
               CAST(1 + doc_id % 2 AS BIGINT) AS channels
        FROM documents WHERE doc_id < 50
      ), s AS (
        SELECT asset_id, channels, n_frames,
          list_transform(range(0, n_frames * channels),
            i -> abs(((asset_id + i) % 65536) - 32768)) AS a
        FROM f
      )
      SELECT asset_id, 'wav' AS aformat, channels,
        CAST(8000 AS BIGINT) AS sample_rate, n_frames,
        CAST(list_sum(a) AS DOUBLE) / (n_frames * channels) AS mean_abs,
        CAST(list_max(a) AS BIGINT) AS peak_abs
      FROM s""",
    // c6_audio_frames: per-window stats of the closed-form fixture —
    // window f covers samples [f·32·ch, min((f+1)·32·ch, total)).
    "c6_audio_frames" -> """
      WITH f AS (
        SELECT doc_id AS asset_id,
               CAST(100 + doc_id % 50 AS BIGINT) AS n_frames,
               CAST(1 + doc_id % 2 AS BIGINT) AS channels
        FROM documents WHERE doc_id < 50
      ), w AS (
        SELECT asset_id, channels, n_frames * channels AS total,
          32 * channels AS win,
          unnest(range(0, CAST(ceil(CAST(n_frames * channels AS DOUBLE)
            / (32 * channels)) AS BIGINT))) AS frame_idx
        FROM f
      ), s AS (
        SELECT asset_id, frame_idx,
          list_transform(range(frame_idx * win,
                               least((frame_idx + 1) * win, total)),
            i -> ((asset_id + i) % 65536) - 32768) AS smp
        FROM w
      )
      SELECT asset_id, frame_idx, CAST(len(smp) AS BIGINT) AS n_samples,
        CAST(list_sum(list_transform(smp, x -> abs(x))) AS DOUBLE)
          / len(smp) AS mean_abs,
        CAST(list_max(list_transform(smp, x -> abs(x))) AS BIGINT) AS peak_abs,
        CAST(list_sum(list_transform(smp, x -> x * x)) AS BIGINT) AS energy
      FROM s""",
    // c6_borders: planted letterbox widths recomputed from the luma
    // closed form — a line is blank iff uniform AND ≤ 16; side = its
    // leading blank run.
    "c6_borders" -> """
      WITH f AS (
        SELECT doc_id AS asset_id,
          CAST(10 + doc_id % 4 AS BIGINT) AS w,
          CAST(8 + doc_id % 3 AS BIGINT) AS h,
          CAST(doc_id % 3 AS BIGINT) AS pt,
          CAST((doc_id + 1) % 3 AS BIGINT) AS pb,
          CAST(doc_id % 2 AS BIGINT) AS pl,
          CAST((doc_id + 2) % 3 AS BIGINT) AS pr
        FROM documents WHERE doc_id < 50
      ), px AS (
        SELECT asset_id, w, h, y.y, x.x,
          CASE WHEN y.y < pt OR y.y >= h - pb
              OR x.x < pl OR x.x >= w - pr THEN 0
            ELSE 60 + ((asset_id + x.x + 3 * y.y) % 40) END AS v
        FROM f,
          LATERAL unnest(generate_series(0, h - 1)) y(y),
          LATERAL unnest(generate_series(0, w - 1)) x(x)
      ), rows0 AS (
        SELECT asset_id, h, y,
          CAST(max(v) = min(v) AND max(v) <= 16 AS INT) AS blank
        FROM px GROUP BY asset_id, h, y
      ), cols0 AS (
        SELECT asset_id, w, x,
          CAST(max(v) = min(v) AND max(v) <= 16 AS INT) AS blank
        FROM px GROUP BY asset_id, w, x
      ), sides AS (
        SELECT r.asset_id,
          (SELECT coalesce(min(y), max(r2.h))
           FROM rows0 r2 WHERE r2.asset_id = r.asset_id AND r2.blank = 0)
            AS top,
          (SELECT coalesce(max(r2.h) - 1 - max(y), max(r2.h))
           FROM rows0 r2 WHERE r2.asset_id = r.asset_id AND r2.blank = 0)
            AS bottom,
          (SELECT coalesce(min(x), max(c2.w))
           FROM cols0 c2 WHERE c2.asset_id = r.asset_id AND c2.blank = 0)
            AS lft,
          (SELECT coalesce(max(c2.w) - 1 - max(x), max(c2.w))
           FROM cols0 c2 WHERE c2.asset_id = r.asset_id AND c2.blank = 0)
            AS rgt
        FROM rows0 r GROUP BY r.asset_id)
      SELECT asset_id, CAST(top AS BIGINT) AS top,
        CAST(bottom AS BIGINT) AS bottom, CAST(lft AS BIGINT) AS "left",
        CAST(rgt AS BIGINT) AS "right",
        CAST(top + bottom + lft + rgt > 0 AS INT) AS boxed
      FROM sides""",
    // c6_vad_segments: the block fixture recomputed closed-form —
    // s(i) = ((i//64)%2)·20000 + ((id+i)%7), 32-sample windows,
    // voiced at energy ≥ 1e8·n, hangover 1, minFrames 2.
    "c6_vad_segments" -> """
      WITH f AS (
        SELECT doc_id AS asset_id,
          CAST(200 + doc_id % 64 AS BIGINT) AS total
        FROM documents WHERE doc_id < 50
      ), w AS (
        SELECT asset_id, total,
          unnest(range(0, CAST(ceil(CAST(total AS DOUBLE) / 32)
            AS BIGINT))) AS frame_idx
        FROM f
      ), e AS (
        SELECT asset_id, frame_idx,
          CAST(len(smp) AS BIGINT) AS n_samples,
          CAST(list_sum(list_transform(smp, x -> x * x)) AS BIGINT)
            AS energy
        FROM (
          SELECT asset_id, frame_idx,
            list_transform(range(frame_idx * 32,
                                 least((frame_idx + 1) * 32, total)),
              i -> ((i // 64) % 2) * 20000 + ((asset_id + i) % 7)) AS smp
          FROM w)
      ), voiced AS (
        SELECT asset_id, frame_idx FROM e
        WHERE energy >= 100000000 * n_samples
      ), marked AS (
        SELECT asset_id, frame_idx,
          CASE WHEN lag(frame_idx) OVER win IS NULL
                 OR frame_idx - lag(frame_idx) OVER win > 2
               THEN 1 ELSE 0 END AS newseg
        FROM voiced
        WINDOW win AS (PARTITION BY asset_id ORDER BY frame_idx)
      ), seg AS (
        SELECT asset_id, frame_idx,
          CAST(sum(newseg) OVER (PARTITION BY asset_id ORDER BY frame_idx
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS seg_idx
        FROM marked)
      SELECT asset_id, seg_idx,
        min(frame_idx) AS start_frame, max(frame_idx) AS end_frame,
        CAST(count(*) AS BIGINT) AS n_voiced
      FROM seg GROUP BY asset_id, seg_idx
      HAVING count(*) >= 2""",
    "c6_phash" -> """
      WITH f AS (
        SELECT doc_id AS asset_id,
          CAST(4 + doc_id % 5 AS BIGINT) AS w,
          CAST(3 + doc_id % 4 AS BIGINT) AS h
        FROM documents WHERE doc_id < 50
      ), px AS (
        SELECT asset_id, w, h, p.p,
          ((asset_id + 3 * p.p) % 256) + ((asset_id + 3 * p.p + 1) % 256)
            + ((asset_id + 3 * p.p + 2) % 256) AS luma
        FROM f, LATERAL unnest(generate_series(0, w * h - 1)) p(p)
      ), tot AS (
        SELECT asset_id, CAST(sum(luma) AS BIGINT) AS total,
          max(w * h) AS n
        FROM px GROUP BY asset_id)
      SELECT px.asset_id,
        CAST(coalesce(sum(CASE WHEN luma * n > total
          THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END), 0)
          AS BIGINT) AS phash
      FROM px JOIN tot USING (asset_id)
      GROUP BY px.asset_id""",
    // c6_dhash: adjacent-pixel gradient bits on the closed-form fixture
    // (every image fits inside the 9×8 grid → cell = pixel; bit index
    // y·(w−1)+x set when luma(x+1,y) > luma(x,y) strictly).
    "c6_dhash" -> """
      WITH f AS (
        SELECT doc_id AS asset_id,
          CAST(4 + doc_id % 5 AS BIGINT) AS w,
          CAST(3 + doc_id % 4 AS BIGINT) AS h
        FROM documents WHERE doc_id < 50
      ), px AS (
        SELECT asset_id, w, h, y.y, x.x,
          ((asset_id + 3 * (y.y * w + x.x)) % 256)
            + ((asset_id + 3 * (y.y * w + x.x) + 1) % 256)
            + ((asset_id + 3 * (y.y * w + x.x) + 2) % 256) AS luma
        FROM f,
          LATERAL unnest(generate_series(0, h - 1)) y(y),
          LATERAL unnest(generate_series(0, w - 1)) x(x)
      ), bits AS (
        SELECT l.asset_id, l.y, l.x,
          CASE WHEN r.luma > l.luma
            THEN (CAST(1 AS BIGINT) << CAST(l.y * (l.w - 1) + l.x AS INT))
            ELSE 0 END AS b
        FROM px l JOIN px r
          ON l.asset_id = r.asset_id AND l.y = r.y AND r.x = l.x + 1)
      SELECT asset_id,
        CAST(coalesce(sum(b), 0) AS BIGINT) AS dhash
      FROM bits GROUP BY asset_id""",
    "c6_online_frame_dedup_twin" -> """
      WITH f AS (
        SELECT doc_id AS id, doc_id % 10 AS g, doc_id // 10 AS m,
          CAST(4 + (doc_id % 10) % 5 AS BIGINT) AS w,
          CAST(3 + (doc_id % 10) % 4 AS BIGINT) AS h
        FROM documents WHERE doc_id < 30
      ), fr AS (
        SELECT id, g, m, w, h, fx.f
        FROM f, LATERAL unnest(generate_series(0, 5)) fx(f)
      ), px AS (
        SELECT id, f, w, h, p.p,
          (g * 1000 + 7 * m + 7 * f + p) % 256 AS v
        FROM fr, LATERAL unnest(generate_series(0, w * h - 1)) p(p)
      ), tot AS (
        SELECT id, f, CAST(sum(v) AS BIGINT) AS total, max(w * h) AS n
        FROM px GROUP BY 1, 2
      ), hashes AS (
        SELECT px.id, px.f,
          CAST(coalesce(sum(CASE WHEN v * n > total
            THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END), 0)
            AS BIGINT) AS fhash
        FROM px JOIN tot USING (id, f) GROUP BY 1, 2
      ), sig AS (SELECT DISTINCT id, fhash FROM hashes
      ), firsts AS (
        SELECT fhash, min(id) AS fst FROM sig GROUP BY 1
      ), j AS (
        SELECT s.id, CASE WHEN f.fst < s.id THEN 1 ELSE 0 END AS dup
        FROM sig s JOIN firsts f USING (fhash)
      ), r AS (
        SELECT id AS asset_id, CAST(count(*) AS BIGINT) AS n_frames,
          CAST(sum(dup) AS BIGINT) AS n_dup
        FROM j GROUP BY 1
      )
      SELECT asset_id, n_frames, n_dup,
        round(CAST(n_dup AS DOUBLE) / CAST(n_frames AS DOUBLE), 6)
          AS dup_frac,
        CAST(round(CAST(n_dup AS DOUBLE) / CAST(n_frames AS DOUBLE), 6)
          < 0.5e0 AS INT) AS kept
      FROM r""",
    "c6_shot_boundaries" -> """
      WITH f AS (
        SELECT doc_id AS id, doc_id % 10 AS g, doc_id // 10 AS m,
          CAST(4 + (doc_id % 10) % 5 AS BIGINT) AS w,
          CAST(3 + (doc_id % 10) % 4 AS BIGINT) AS h
        FROM documents WHERE doc_id < 30
      ), fr AS (
        SELECT id, g, m, w, h, fx.f
        FROM f, LATERAL unnest(generate_series(0, 5)) fx(f)
      ), px AS (
        SELECT id, f, w, h, p.p,
          (g * 1000 + 7 * m + 7 * f + p) % 256 AS v
        FROM fr, LATERAL unnest(generate_series(0, w * h - 1)) p(p)
      ), tot AS (
        SELECT id, f, CAST(sum(v) AS BIGINT) AS total, max(w * h) AS n
        FROM px GROUP BY 1, 2
      ), hashes AS (
        SELECT px.id, px.f,
          CAST(coalesce(sum(CASE WHEN v * n > total
            THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END), 0)
            AS BIGINT) AS fhash
        FROM px JOIN tot USING (id, f) GROUP BY 1, 2
      ), lagd AS (
        SELECT id, f, fhash,
          lag(fhash) OVER (PARTITION BY id ORDER BY f) AS prev
        FROM hashes
      ), cuts AS (
        SELECT id, f, fhash,
          CASE WHEN prev IS NULL THEN NULL
            ELSE CAST(bit_count(xor(prev, fhash)) AS BIGINT) END
            AS dist_prev,
          CASE WHEN prev IS NULL
              OR bit_count(xor(prev, fhash)) > 4 THEN 1
            ELSE 0 END AS cut
        FROM lagd)
      SELECT id AS asset_id, f AS frame_idx, fhash, dist_prev,
        CAST(sum(cut) OVER (PARTITION BY id ORDER BY f
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - 1
          AS BIGINT) AS shot_idx,
        CAST(cut AS BIGINT) AS is_keyframe
      FROM cuts""",
    "c6_frame_dedup" -> """
      WITH f AS (
        SELECT doc_id AS id, doc_id % 10 AS g, doc_id // 10 AS m,
          CAST(4 + (doc_id % 10) % 5 AS BIGINT) AS w,
          CAST(3 + (doc_id % 10) % 4 AS BIGINT) AS h
        FROM documents WHERE doc_id < 30
      ), fr AS (
        SELECT id, g, m, w, h, fx.f
        FROM f, LATERAL unnest(generate_series(0, 5)) fx(f)
      ), px AS (
        SELECT id, f, w, h, p.p,
          (g * 1000 + 7 * m + 7 * f + p) % 256 AS v
        FROM fr, LATERAL unnest(generate_series(0, w * h - 1)) p(p)
      ), tot AS (
        SELECT id, f, CAST(sum(v) AS BIGINT) AS total, max(w * h) AS n
        FROM px GROUP BY 1, 2
      ), hashes AS (
        SELECT px.id, px.f,
          CAST(coalesce(sum(CASE WHEN v * n > total
            THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END), 0)
            AS BIGINT) AS fhash
        FROM px JOIN tot USING (id, f) GROUP BY 1, 2
      ), sig AS (SELECT DISTINCT id, fhash FROM hashes
      ), blockable AS (
        SELECT sig.id, sig.fhash FROM sig
        JOIN (SELECT fhash FROM sig GROUP BY 1 HAVING count(*) <= 8) ok
          USING (fhash)
      -- sizes over the SAME capped universe as the overlap counts (the
      -- Spark side's consistent-Jaccard convention)
      ), sz AS (SELECT id, count(*) AS s FROM blockable GROUP BY 1
      ), pairs AS (
        SELECT a.id AS id_a, b.id AS id_b,
          CAST(count(*) AS BIGINT) AS shared_frames
        FROM blockable a JOIN blockable b
          ON a.fhash = b.fhash AND a.id < b.id
        GROUP BY 1, 2
      )
      SELECT id_a, id_b, shared_frames,
        round(CAST(shared_frames AS DOUBLE) /
          CAST(sa.s + sb.s - shared_frames AS DOUBLE), 6) AS jaccard
      FROM pairs
      JOIN sz sa ON sa.id = pairs.id_a
      JOIN sz sb ON sb.id = pairs.id_b
      WHERE round(CAST(shared_frames AS DOUBLE) /
          CAST(sa.s + sb.s - shared_frames AS DOUBLE), 6) >= 0.45""",
    "c6_frame_dedup_hamming" -> """
      WITH f AS (
        SELECT doc_id AS id,
          (CASE doc_id % 3 WHEN 0 THEN 224 WHEN 1 THEN 238 ELSE 100 END)
            + (CASE WHEN doc_id // 3 = 2 THEN 2 ELSE 0 END) AS s
        FROM documents WHERE doc_id < 9
      ), fr AS (
        SELECT id, s, fx.f
        FROM f, LATERAL unnest(generate_series(0, 1)) fx(f)
      ), px AS (
        SELECT id, f, p.p, (s + 7 * f + p) % 256 AS v
        FROM fr, LATERAL unnest(generate_series(0, 34)) p(p)
      ), tot AS (
        SELECT id, f, CAST(sum(v) AS BIGINT) AS total
        FROM px GROUP BY 1, 2
      ), hashes AS (
        SELECT px.id, px.f,
          CAST(coalesce(sum(CASE WHEN v * 35 > total
            THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END), 0)
            AS BIGINT) AS fhash
        FROM px JOIN tot USING (id, f) GROUP BY 1, 2
      -- one-hop min-canonicalization over the DISTINCT hash universe:
      -- the Spark side's banded candidate generation is lossless for
      -- t < nBands, so a plain distance cross-join here is equivalent
      ), hset AS (SELECT DISTINCT fhash FROM hashes
      ), canon AS (
        SELECT a.fhash, min(b.fhash) AS ch
        FROM hset a JOIN hset b
          ON bit_count(xor(a.fhash, b.fhash)) <= 4
        GROUP BY a.fhash
      ), sig AS (
        SELECT DISTINCT id, ch AS fhash FROM hashes JOIN canon USING (fhash)
      ), blockable AS (
        SELECT sig.id, sig.fhash FROM sig
        JOIN (SELECT fhash FROM sig GROUP BY 1 HAVING count(*) <= 8) ok
          USING (fhash)
      ), sz AS (SELECT id, count(*) AS s FROM blockable GROUP BY 1
      ), pairs AS (
        SELECT a.id AS id_a, b.id AS id_b,
          CAST(count(*) AS BIGINT) AS shared_frames
        FROM blockable a JOIN blockable b
          ON a.fhash = b.fhash AND a.id < b.id
        GROUP BY 1, 2
      )
      SELECT id_a, id_b, shared_frames,
        round(CAST(shared_frames AS DOUBLE) /
          CAST(sa.s + sb.s - shared_frames AS DOUBLE), 6) AS jaccard
      FROM pairs
      JOIN sz sa ON sa.id = pairs.id_a
      JOIN sz sb ON sb.id = pairs.id_b
      WHERE round(CAST(shared_frames AS DOUBLE) /
          CAST(sa.s + sb.s - shared_frames AS DOUBLE), 6) >= 0.45""",
    "c6_phash_pairs" -> """
      WITH f AS (
        SELECT doc_id AS asset_id,
          CAST(4 + doc_id % 5 AS BIGINT) AS w,
          CAST(3 + doc_id % 4 AS BIGINT) AS h
        FROM documents WHERE doc_id < 50
      ), px AS (
        SELECT asset_id, w, h, p.p,
          ((asset_id + 3 * p.p) % 256) + ((asset_id + 3 * p.p + 1) % 256)
            + ((asset_id + 3 * p.p + 2) % 256) AS luma
        FROM f, LATERAL unnest(generate_series(0, w * h - 1)) p(p)
      ), tot AS (
        SELECT asset_id, CAST(sum(luma) AS BIGINT) AS total,
          max(w * h) AS n
        FROM px GROUP BY asset_id
      ), hashes AS (
        SELECT px.asset_id,
          CAST(coalesce(sum(CASE WHEN luma * n > total
            THEN (CAST(1 AS BIGINT) << CAST(p AS INT)) ELSE 0 END), 0)
            AS BIGINT) AS phash
        FROM px JOIN tot USING (asset_id)
        GROUP BY px.asset_id)
      SELECT a.asset_id AS id_a, b.asset_id AS id_b,
        CAST(bit_count(xor(a.phash, b.phash)) AS BIGINT) AS dist
      FROM hashes a JOIN hashes b ON a.asset_id < b.asset_id
      WHERE bit_count(xor(a.phash, b.phash)) <= 3""",
  )
}
