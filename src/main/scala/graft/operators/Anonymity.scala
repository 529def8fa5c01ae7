package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** K-ANONYMITY / L-DIVERSITY AUDIT — the privacy gate a training-data
  * pipeline runs before releasing or mixing user-derived tables: group
  * rows into equivalence classes on the quasi-identifier columns
  * (attributes an attacker could link externally) and measure, per
  * class, how many rows share the identity-blurring combination
  * (k-anonymity) and how many distinct sensitive values it shelters
  * (l-diversity — a k-large class whose sensitive column is constant
  * still leaks the value).
  *
  * Determinism: pure exact counting — `count(*)` and
  * `count(DISTINCT sensitive)` per class, the at-risk flag an integer
  * comparison — so every cell is oracle-exact.
  *
  * Scale shape (100 TB): ONE hash aggregation over the table, keyed on
  * the quasi-identifier tuple. `class_size` is partial-aggregatable
  * map-side; the single distinct aggregate plans as Spark's standard
  * two-phase distinct (partial by (class, value) then final by class)
  * — two shuffles of at most |table| rows, no window, no collect, no
  * Expand (single distinct column). For corpora where exact distinct
  * counts per class are overkill, `approxDiversity = true` swaps in
  * `approx_count_distinct` (mergeable HLL, one shuffle, ±2%), the same
  * trade documented on ColumnProfile.
  */
object Anonymity {

  /** One row per equivalence class: quasi columns + `class_size` +
    * `l_diversity` + `at_risk` (1 when class_size < k). */
  def audit(df: DataFrame, quasi: Seq[String], sensitive: String, k: Int,
            approxDiversity: Boolean = false): DataFrame = {
    require(quasi.nonEmpty && k >= 1)
    val diversity =
      if (approxDiversity) approx_count_distinct(col(sensitive))
      else countDistinct(col(sensitive))
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        diversity.as("l_diversity"))
      .withColumn("at_risk", (col("class_size") < k).cast("int"))
  }

  /** DuckDB twin of [[audit]] (exact mode). */
  def sqlAudit(table: String, quasi: Seq[String], sensitive: String,
               k: Int): String = {
    val q = quasi.mkString(", ")
    s"""SELECT $q,
          CAST(count(*) AS BIGINT) AS class_size,
          CAST(count(DISTINCT $sensitive) AS BIGINT) AS l_diversity,
          CAST(count(*) < $k AS INT) AS at_risk
        FROM $table GROUP BY $q"""
  }
}
