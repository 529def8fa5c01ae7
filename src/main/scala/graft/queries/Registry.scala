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

object Registry {
  /** Determinism helpers shared by oracle SQL builders (SURVEY §5.3):
    * money doubles sit on a 2-decimal grid (verified, FIXTURES.md), so
    * `CAST(x AS DECIMAL)` → exact integer-scaled sums → `CAST AS DOUBLE`
    * is bit-identical in Spark and DuckDB regardless of addition order.
    */
  def decSum(expr: String, prec: Int = 18, scale: Int = 2): String =
    s"CAST(sum(CAST($expr AS DECIMAL($prec,$scale))) AS DOUBLE)"
}
