package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the ten driver-generated test tables (TESTDATA.md,
  * FIXTURES.md §1). All path handling lives here so queries never
  * hardcode scale-factor directories.
  *
  * Scale posture: at 100 TB these would be catalog tables partitioned on
  * date/key columns (orders by o_orderdate month, lineitem by l_shipdate
  * month, events by day(ts)) and bucketed on their join keys
  * (lineitem/orders on orderkey, customer on custkey) so the star joins
  * are co-located and partition pruning applies. The loaders keep the
  * same relational shape; only the `spark.read` source changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame     = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = load(s, d, "lineitem")
  /** `events.ts` has shipped as two physical parquet types across data
    * generations: TIMESTAMP(NANOS) (which Spark 4 refuses outright —
    * [PARQUET_TYPE_ILLEGAL] — unless read as long via the legacy conf)
    * and TIMESTAMP(MICROS, isAdjustedToUTC=false) (which Spark loads as
    * TIMESTAMP_NTZ). Branch on the type that actually loaded so both
    * generations normalize to a microsecond TimestampType:
    *  - LongType (nanosAsLong): integer-divide ns→µs — a double
    *    division would lose precision at 1.7e18 ns; DuckDB applies the
    *    same truncation, so oracles agree.
    *  - TIMESTAMP_NTZ: reinterpret as UTC. Sessions pin
    *    spark.sql.session.timeZone=UTC, so the cast is value-preserving
    *    and matches DuckDB's naive read of the same file. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", expr("timestamp_micros(ts DIV 1000)"))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
