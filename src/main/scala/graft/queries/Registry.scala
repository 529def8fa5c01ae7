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

  /** (catalog table, tmp path) for build+serve queries that persist an
    * index inside the timed query (c3_ivf_serve, c2_incremental_
    * persisted). Keyed on the sf dir: a Verify at sf0.01 and a Bench
    * at sf0.1 on the same host must not overwrite each other's index
    * mid-scan (lazy reads racing an Overwrite). The hash is masked to
    * non-negative (`& 0x7fffffff`, not math.abs — abs(Int.MinValue) is
    * negative and would put a '-' in a catalog table name). */
  protected def indexScratch(sfDir: String, prefix: String): (String, String) = {
    val suffix = (sfDir.hashCode & 0x7fffffff).toString
    (s"${prefix}_$suffix",
      s"${System.getProperty("java.io.tmpdir")}/${prefix}_$suffix")
  }
}

// Determinism convention shared by every oracle SQL in this package
// (SURVEY §5.3): money doubles sit on a 2-decimal grid (FIXTURES.md), so
// `CAST(sum(CAST(x AS DECIMAL(p,2))) AS DOUBLE)` yields exact,
// addition-order-insensitive sums that are bit-identical in Spark and
// DuckDB; float literals are written with an e0 exponent so DuckDB
// parses them as DOUBLE, never DECIMAL (see Noise.sqlDouble).
