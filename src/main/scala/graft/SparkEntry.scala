package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries are contributed by per-area registries (graft.queries.*);
  * every oracle-able operator appears in BOTH maps with matching column
  * names (the driver sorts columns by name before hashing).
  */
object SparkEntry {
  private[graft] val registries: Seq[Registry] = Seq(
    ImputeQueries,
    RelationalQueries,
    TextQueries,
    DedupQueries,
    SimilarityQueries,
    MultimodalQueries,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's raison d'être: impute missing values in a table. */
  def entry(spark: SparkSession): DataFrame =
    ImputeQueries.rbmClean(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registries.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registries.flatMap(_.oracle).toMap
}
