package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** MULTIMODAL FILE INGEST — the missing first mile of the image/audio
  * pipeline: raw asset files on disk/object storage become a binary
  * DataFrame that the existing decode/feature operators consume. Two
  * built-in sources cover the format surface without any extra
  * dependency:
  *
  *  - `binaryFile`: one row per file `(path, modificationTime, length,
  *    content)` — the standard Spark ingestion path for images, audio
  *    and any opaque payloads. Supports glob filtering at the SOURCE
  *    (`pathGlobFilter` prunes by name before reading bytes) and
  *    `recursiveFileLookup` for nested asset trees.
  *  - ORC read/write round-trip — the other columnar format large
  *    lakes standardize on; Spark's native ORC source gives the same
  *    pushdown/pruning surface as parquet (spec-asserted).
  *
  * Scale shape: binaryFile parallelizes by file (each task reads whole
  * files; `spark.sql.files.maxPartitionBytes` packs small assets into
  * shared tasks). Millions of tiny files are a namespace problem, not
  * a Spark problem — land them once, then persist `(asset_id, content,
  * metadata)` as parquet/ORC with large row groups (the compacted
  * asset table every multimodal pipeline actually scans).
  */
object BinaryIngest {

  /** One row per file under `path` matching `glob` (e.g. "*.png").
    * Columns: path, modificationTime, length, content (binary). */
  def readBinaryDir(spark: SparkSession, path: String, glob: String = "*",
                    recursive: Boolean = true): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", recursive.toString)
      .load(path)

  /** Binary files decoded to the asset-table shape the multimodal
    * queries consume: `(asset_name, length, content)` with the file's
    * base name as the id (paths are env-specific; names are stable). */
  def assetTable(spark: SparkSession, path: String,
                 glob: String = "*"): DataFrame =
    readBinaryDir(spark, path, glob)
      .select(element_at(split(col("path"), "/"), -1).as("asset_name"),
        col("length"), col("content"))

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").format("orc").save(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.format("orc").load(path)
}
