package graft.sources

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Non-parquet source/sink formats (B1 breadth): JSON-lines and CSV —
  * the interchange formats a corpus actually arrives in before it is
  * compacted to parquet. The 100 TB posture for both:
  *
  *  - ALWAYS pass an explicit schema on read. Schema inference is a
  *    full extra pass over the data (and for JSON it samples, so two
  *    runs can disagree); an explicit schema makes the scan
  *    single-pass and the schema stable.
  *  - JSONL/CSV scans parallelize by file split exactly like parquet
  *    (text is splittable at line boundaries when uncompressed;
  *    gzip is NOT splittable — one task per .gz file — so large
  *    corpora should arrive uncompressed, zstd-seekable, or
  *    pre-chunked into many files).
  *  - Malformed lines are a certainty at corpus scale and must not
  *    kill a 40-hour ingest. JSONL reads therefore go line-first
  *    (`spark.read.text` → `from_json`): parsing is an ordinary
  *    projection, so the quarantine filter is plan-friendly (Spark
  *    disallows querying the file reader's INTERNAL corrupt-record
  *    column without caching — the line-first shape has no such
  *    restriction and nothing to cache). CSV cannot take this shape
  *    (quoted fields span lines), so its reader uses DROPMALFORMED.
  *
  * Thin wrappers over built-in readers — downstream operators and
  * column pruning work unchanged; TextSourcesSpec round-trips the
  * documents table through both formats bit-exactly.
  */
object TextSources {

  val CorruptCol = "_corrupt_record"
  private val RawCol = "__raw_line"

  /** JSON-lines as (parsed struct incl. corrupt field, raw line): the
    * quarantine substrate. `from_json` in PERMISSIVE mode fills the
    * declared corrupt-record field with the raw text for unparseable
    * lines (an all-null struct would blur "bad line" and "all-null
    * row" — the corrupt field keeps the distinction). Data schemas
    * must not themselves contain a `_corrupt_record` column. */
  private def parsedJson(spark: SparkSession, path: String,
                         schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"data schema must not contain $CorruptCol")
    spark.read.text(path)
      .select(col("value").as(RawCol),
        from_json(col("value"), schema.add(CorruptCol, "string"),
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> CorruptCol).asJava)
          .as("__parsed"))
  }

  /** Rows that parsed cleanly, in the data schema. */
  def readJsonLines(spark: SparkSession, path: String,
                    schema: StructType): DataFrame =
    parsedJson(spark, path, schema)
      .filter(col("__parsed").getField(CorruptCol).isNull)
      .select(col("__parsed.*")).drop(CorruptCol)

  /** Quarantined raw lines for the dead-letter path. */
  def corruptJsonLines(spark: SparkSession, path: String,
                       schema: StructType): DataFrame =
    parsedJson(spark, path, schema)
      .filter(col("__parsed").getField(CorruptCol).isNotNull)
      .select(col(RawCol).as(CorruptCol))

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Schema-explicit CSV read (header, quoted fields, RFC-ish escapes —
    * the settings that survive free text with commas and newlines).
    * Malformed records are dropped, not fatal; CSV's multi-line quoting
    * rules out the line-first quarantine shape JSONL uses. */
  def readCsv(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .option("multiLine", "true")
      .option("escape", "\"")
      .csv(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", "true")
      .option("escape", "\"")
      .csv(path)

  /** ORC — the other columnar table format large estates actually hold
    * (Hive-era warehouses ship it; a migration engine must read it in
    * place, not demand a parquet rewrite first). Spark's native
    * vectorized ORC reader gives the same columnar virtues as parquet:
    * predicate pushdown into stripe/row-group statistics, column
    * pruning, splittable files — TextSourcesSpec asserts the pushdown
    * reaches the scan and the round-trip is bit-exact. Schema-explicit
    * for the same single-pass reason as the text formats. */
  def readOrc(spark: SparkSession, path: String,
              schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)
}
