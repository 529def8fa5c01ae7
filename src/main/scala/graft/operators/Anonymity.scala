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

  // ---- Laplace-noised release counts ------------------------------
  // The differential-privacy MECHANISM shape (Dwork et al.: count +
  // Laplace(Δf/ε) noise, Δf = 1 for counting queries) as an engine
  // operator: per-group counts released with calibrated noise, the
  // standard "publish how many users did X without revealing whether
  // user u did" aggregate. The noise here is keyed hash-noise pushed
  // through the Laplace inverse CDF — DETERMINISTIC and engine-
  // portable, so the whole release sits under the bit-exact oracle
  // and re-runs never re-roll (a re-published count must not wobble,
  // or the wobble itself leaks). A cryptographic deployment would
  // swap the public keyed hash for a secret-seeded generator — one
  // line; the mechanism, sensitivity calibration and plan shape are
  // what the engine provides.
  //
  // Scale: ONE hash aggregate (partial map-side) + a projection.

  /** Per-group counts with Laplace(1/ε) noise. Output: groupCols +
    * `noised_n` (6-dp double; true counts withheld by design — that's
    * the point of the release). */
  def noisedCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
                   salt: Int = 29): DataFrame = {
    require(groupCols.nonEmpty && epsilon > 0)
    val key = graft.dedup.MinHashDedup.portableShingleHash(
      concat_ws("", groupCols.map(col): _*))
    // clamp u away from {0,1}: u = 0 → ln(1−2|u−½|) = ln(0) = −∞, and
    // near-0/1 values give noise far beyond the DP calibration
    val u = greatest(lit(1e-12), least(lit(1.0 - 1e-12),
      graft.functions.Noise.hashNoise(key, salt)))
    // inverse-CDF Laplace: −b·sign(u−½)·ln(1−2|u−½|), b = 1/ε
    val b = lit(1.0 / epsilon)
    val c = u - lit(0.5)
    val noise = -b * signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("noised_n", round(col("__n").cast("double") + noise, 6))
      .drop("__n")
  }

  /** DuckDB twin of [[noisedCounts]] — identical hash, CDF and op
    * order. `groupCols` must be string columns (the hash input). */
  def sqlNoisedCounts(table: String, groupCols: Seq[String],
                      epsilon: Double, salt: Int = 29): String = {
    import graft.functions.Noise.sqlDouble
    val q = groupCols.mkString(", ")
    val cat = groupCols.mkString("concat_ws(chr(1), ", ", ", ")")
    val key = s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, len($cat) + 1),
        j -> CAST(ascii(($cat)[j:j]) AS BIGINT))),
      (a, ch) -> (a * 31 + ch) % 1000000007)"""
    val u0 = graft.functions.Noise.sqlNoise(key, salt)
    val u = s"greatest(${sqlDouble(1e-12)}, least(${sqlDouble(1.0 - 1e-12)}, $u0))"
    val c = s"(($u) - 5.0e-1)"
    val noise = s"""(-${sqlDouble(1.0 / epsilon)} * sign($c)
      * ln(1.0e0 - 2.0e0 * abs($c)))"""
    s"""WITH g AS (
          SELECT $q, count(*) AS n FROM $table GROUP BY $q)
        SELECT $q, round(CAST(n AS DOUBLE) + $noise, 6) AS noised_n
        FROM g"""
  }
}
