package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of driver-contract queries. Each milestone module
  * (impute, relational, dedup, similarity, text, streaming) exposes one
  * of these; `graft.SparkEntry` concatenates them.
  *
  * Contract (SparkEntry.scala): every query is `(spark, sfDir) => DF`;
  * `oracle` holds DuckDB-runnable SQL producing the SAME column names
  * (the driver sorts columns by name and hashes values). Stochastic /
  * approximate / streaming ops have no oracle entry and are covered by
  * ScalaTest invariants instead (SURVEY.md §5.2).
  */
trait Registry {
  type Q = (SparkSession, String) => DataFrame
  def queries: Map[String, Q]
  def oracle: Map[String, String]
}

// Determinism convention shared by every oracle SQL in this package
// (SURVEY §5.3): money doubles sit on a 2-decimal grid (FIXTURES.md), so
// `CAST(sum(CAST(x AS DECIMAL(p,2))) AS DOUBLE)` yields exact,
// addition-order-insensitive sums that are bit-identical in Spark and
// DuckDB; float literals are written with an e0 exponent so DuckDB
// parses them as DOUBLE, never DECIMAL (see Noise.sqlDouble).
