package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
    * the point of the release).
    *
    * '''NOT a cryptographic DP mechanism''': the noise is a
    * DETERMINISTIC PUBLIC function of the group key and `salt` —
    * anyone with this code (or who guesses the salt) can recompute
    * and subtract it, recovering the exact counts. What this operator
    * provides is the mechanism SHAPE (sensitivity calibration, the
    * Laplace inverse CDF, the engine-portable plan) under the
    * bit-exact oracle; a real privacy deployment MUST replace the
    * keyed hash with a secret-seeded generator. */
  def noisedCounts(df: DataFrame, groupCols: Seq[String], epsilon: Double,
                   salt: Int = 29): DataFrame = {
    require(groupCols.nonEmpty && epsilon > 0)
    val key = graft.dedup.MinHashDedup.portableShingleHash(
      concat_ws("\u0001", groupCols.map(col): _*))
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
      // floor-portable round (§5.3 signed-zero rule): noise can drive
      // a small count to a tiny negative, and round(·,6) would emit
      // -0.0 in DuckDB vs +0.0 through BigDecimal
      .withColumn("noised_n",
        floor((col("__n").cast("double") + noise) * lit(1e6) + lit(0.5))
          / lit(1e6))
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
        SELECT $q, floor((CAST(n AS DOUBLE) + $noise) * 1000000.0e0
          + 0.5e0) / 1000000.0e0 AS noised_n
        FROM g"""
  }

  /** Per-group counts under the GAUSSIAN MECHANISM — the (ε, δ)
    * member the pure-ε Laplace family was missing: calibrate
    * σ = Δ·sqrt(2·ln(1.25/δ))/ε (the classic analytic bound, Δ = 1
    * for counts) and add N(0, σ²) noise. Gaussian releases compose
    * more gracefully across many queries (advanced composition /
    * zCDP) — the reason production ledgers ([[DpLedger]]) track
    * (ε, δ) pairs. Noise is Φ⁻¹ of the keyed hash uniform via
    * Acklam's rational approximation ([[graft.functions.Noise
    * .invNormal]]) — pure arithmetic + sqrt/ln, so the release sits
    * under the bit-exact oracle like the Laplace rows.
    *
    * Same NON-CRYPTOGRAPHIC caveat as [[noisedCounts]]: the keyed
    * hash is a public function — this is the mechanism SHAPE
    * (sensitivity calibration, CDF inversion, portable plan); a real
    * deployment must swap in a secret-seeded generator. */
  def noisedCountsGaussian(df: DataFrame, groupCols: Seq[String],
                           epsilon: Double, delta: Double,
                           salt: Int = 31): DataFrame = {
    require(groupCols.nonEmpty && epsilon > 0)
    require(delta > 0 && delta < 1, s"delta must be in (0,1): $delta")
    // the classic analytic Gaussian bound sigma = sqrt(2 ln(1.25/d))/e
    // is only a valid (e, d)-DP calibration for e < 1 (Dwork & Roth,
    // Thm 3.22); outside that range it UNDER-noises, so refuse rather
    // than publish an uncalibrated release claimed as DP
    require(epsilon < 1,
      s"analytic Gaussian calibration requires epsilon < 1: $epsilon")
    val key = graft.dedup.MinHashDedup.portableShingleHash(
      concat_ws("\u0001", groupCols.map(col): _*))
    val u = greatest(lit(1e-12), least(lit(1.0 - 1e-12),
      graft.functions.Noise.hashNoise(key, salt)))
    val sigma = math.sqrt(2.0 * math.log(1.25 / delta)) / epsilon
    val noise = lit(sigma) * graft.functions.Noise.invNormal(u)
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .withColumn("noised_n",
        floor((col("__n").cast("double") + noise) * lit(1e6) + lit(0.5))
          / lit(1e6))
      .drop("__n")
  }

  /** DuckDB twin of [[noisedCountsGaussian]] — identical hash, σ
    * calibration, Φ⁻¹ sequence and floor grid. */
  def sqlNoisedCountsGaussian(table: String, groupCols: Seq[String],
                              epsilon: Double, delta: Double,
                              salt: Int = 31): String = {
    // same calibration-validity guard as the Spark side: the analytic
    // sigma under-noises at epsilon >= 1, so the SQL twin must refuse
    // the exact release the Spark mechanism refuses
    require(epsilon < 1,
      s"analytic Gaussian calibration requires epsilon < 1: $epsilon")
    import graft.functions.Noise.sqlDouble
    val q = groupCols.mkString(", ")
    val cat = groupCols.mkString("concat_ws(chr(1), ", ", ", ")")
    val key = s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, len($cat) + 1),
        j -> CAST(ascii(($cat)[j:j]) AS BIGINT))),
      (a, ch) -> (a * 31 + ch) % 1000000007)"""
    val u0 = graft.functions.Noise.sqlNoise(key, salt)
    val u = s"greatest(${sqlDouble(1e-12)}, least(${sqlDouble(1.0 - 1e-12)}, $u0))"
    val sigma = math.sqrt(2.0 * math.log(1.25 / delta)) / epsilon
    val noise =
      s"(${sqlDouble(sigma)} * ${graft.functions.Noise.sqlInvNormal(u)})"
    s"""WITH g AS (
          SELECT $q, count(*) AS n FROM $table GROUP BY $q)
        SELECT $q, floor((CAST(n AS DOUBLE) + $noise) * 1000000.0e0
          + 0.5e0) / 1000000.0e0 AS noised_n
        FROM g"""
  }

  /** Per-group Laplace-noised SUMS with CONTRIBUTION BOUNDING — the
    * half of a DP release [[noisedCounts]] doesn't cover, and the
    * half people get wrong: a sum's sensitivity is unbounded until
    * each UNIT's total contribution per group is clamped to ±`cap`,
    * after which Laplace(cap/ε) calibrates. Skipping the clamp (or
    * clamping EVENTS instead of units) silently publishes an
    * uncalibrated release — the operator makes the right shape the
    * only shape.
    *
    * Determinism: the [[noisedCounts]] recipe — keyed hash-noise
    * through the Laplace inverse CDF, so the release is bit-stable
    * across re-runs and engines (re-publication must not wobble).
    * '''NOT a cryptographic DP mechanism''' — see [[noisedCounts]]:
    * the deterministic public noise is recoverable by anyone with the
    * code; a real deployment must swap in a secret-seeded generator.
    * Scale: per-(group, unit) partial-agg'd sum, clamp, group agg,
    * projection — two hash aggregates, no window, no join.
    * Output: groupCols + `noised_sum` (6 dp). */
  def noisedSums(df: DataFrame, groupCols: Seq[String], unitCol: String,
                 valueCol: String, cap: Double, epsilon: Double,
                 salt: Int = 37): DataFrame = {
    require(groupCols.nonEmpty && cap > 0 && epsilon > 0)
    val capD = lit(cap).cast("decimal(18,6)")
    val perUnit = df
      .groupBy((groupCols.map(col) :+ col(unitCol)): _*)
      .agg(sum(col(valueCol).cast("decimal(18,6)")).as("__s"))
      .withColumn("__sc",
        greatest(-capD, least(capD, col("__s"))).cast("decimal(18,6)"))
    val key = graft.dedup.MinHashDedup.portableShingleHash(
      concat_ws("\u0001", groupCols.map(col): _*))
    val u = greatest(lit(1e-12), least(lit(1.0 - 1e-12),
      graft.functions.Noise.hashNoise(key, salt)))
    val b = lit(cap / epsilon)
    val c = u - lit(0.5)
    val noise = -b * signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
    perUnit.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__sc")).as("__t"))
      // floor-portable round — same §5.3 signed-zero rationale as
      // noisedCounts (clamped sums near zero + negative noise)
      .withColumn("noised_sum",
        floor((col("__t").cast("double") + noise) * lit(1e6) + lit(0.5))
          / lit(1e6))
      .drop("__t")
  }

  /** DuckDB twin of [[noisedSums]] — identical clamp, hash, CDF and
    * op order. `groupCols` must be string columns. */
  def sqlNoisedSums(table: String, groupCols: Seq[String],
                    unitCol: String, valueCol: String, cap: Double,
                    epsilon: Double, salt: Int = 37): String = {
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
    val noise = s"""(-${sqlDouble(cap / epsilon)} * sign($c)
      * ln(1.0e0 - 2.0e0 * abs($c)))"""
    val capSql = s"CAST(${sqlDouble(cap)} AS DECIMAL(18,6))"
    s"""WITH pu AS (
          SELECT $q, $unitCol AS unit,
            greatest(-$capSql, least($capSql,
              sum(CAST($valueCol AS DECIMAL(18,6))))) AS sc
          FROM $table GROUP BY $q, $unitCol
        ), g AS (
          SELECT $q, sum(sc) AS t FROM pu GROUP BY $q)
        SELECT $q, floor((CAST(t AS DOUBLE) + $noise) * 1000000.0e0
          + 0.5e0) / 1000000.0e0 AS noised_sum
        FROM g"""
  }

  /** [[noisedSums]] under the GAUSSIAN MECHANISM — the (ε, δ) sum
    * release that composes via [[DpLedger.advancedSummary]]'s √k
    * account: same unit-level contribution clamp (sensitivity = cap),
    * σ = cap·sqrt(2·ln(1.25/δ))/ε, noise = σ·Φ⁻¹(hash uniform). Same
    * non-cryptographic caveat as the whole family. */
  def noisedSumsGaussian(df: DataFrame, groupCols: Seq[String],
                         unitCol: String, valueCol: String, cap: Double,
                         epsilon: Double, delta: Double,
                         salt: Int = 41): DataFrame = {
    require(groupCols.nonEmpty && cap > 0 && epsilon > 0)
    require(delta > 0 && delta < 1, s"delta must be in (0,1): $delta")
    // the classic analytic Gaussian bound sigma = sqrt(2 ln(1.25/d))/e
    // is only a valid (e, d)-DP calibration for e < 1 (Dwork & Roth,
    // Thm 3.22); outside that range it UNDER-noises, so refuse rather
    // than publish an uncalibrated release claimed as DP
    require(epsilon < 1,
      s"analytic Gaussian calibration requires epsilon < 1: $epsilon")
    val capD = lit(cap).cast("decimal(18,6)")
    val perUnit = df
      .groupBy((groupCols.map(col) :+ col(unitCol)): _*)
      .agg(sum(col(valueCol).cast("decimal(18,6)")).as("__s"))
      .withColumn("__sc",
        greatest(-capD, least(capD, col("__s"))).cast("decimal(18,6)"))
    val key = graft.dedup.MinHashDedup.portableShingleHash(
      concat_ws("\u0001", groupCols.map(col): _*))
    val u = greatest(lit(1e-12), least(lit(1.0 - 1e-12),
      graft.functions.Noise.hashNoise(key, salt)))
    val sigma = cap * math.sqrt(2.0 * math.log(1.25 / delta)) / epsilon
    val noise = lit(sigma) * graft.functions.Noise.invNormal(u)
    perUnit.groupBy(groupCols.map(col): _*)
      .agg(sum(col("__sc")).as("__t"))
      .withColumn("noised_sum",
        floor((col("__t").cast("double") + noise) * lit(1e6) + lit(0.5))
          / lit(1e6))
      .drop("__t")
  }

  /** DuckDB twin of [[noisedSumsGaussian]]. */
  def sqlNoisedSumsGaussian(table: String, groupCols: Seq[String],
                            unitCol: String, valueCol: String,
                            cap: Double, epsilon: Double, delta: Double,
                            salt: Int = 41): String = {
    require(epsilon < 1,
      s"analytic Gaussian calibration requires epsilon < 1: $epsilon")
    import graft.functions.Noise.sqlDouble
    val q = groupCols.mkString(", ")
    val cat = groupCols.mkString("concat_ws(chr(1), ", ", ", ")")
    val key = s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, len($cat) + 1),
        j -> CAST(ascii(($cat)[j:j]) AS BIGINT))),
      (a, ch) -> (a * 31 + ch) % 1000000007)"""
    val u0 = graft.functions.Noise.sqlNoise(key, salt)
    val u = s"greatest(${sqlDouble(1e-12)}, least(${sqlDouble(1.0 - 1e-12)}, $u0))"
    val sigma = cap * math.sqrt(2.0 * math.log(1.25 / delta)) / epsilon
    val noise =
      s"(${sqlDouble(sigma)} * ${graft.functions.Noise.sqlInvNormal(u)})"
    val capSql = s"CAST(${sqlDouble(cap)} AS DECIMAL(18,6))"
    s"""WITH pu AS (
          SELECT $q, $unitCol AS unit,
            greatest(-$capSql, least($capSql,
              sum(CAST($valueCol AS DECIMAL(18,6))))) AS sc
          FROM $table GROUP BY $q, $unitCol
        ), g AS (
          SELECT $q, sum(sc) AS t FROM pu GROUP BY $q)
        SELECT $q, floor((CAST(t AS DOUBLE) + $noise) * 1000000.0e0
          + 0.5e0) / 1000000.0e0 AS noised_sum
        FROM g"""
  }

  // ---- Laplace-noised histogram release ---------------------------
  // The third leg of the private-release family: a DISTRIBUTION
  // release (histogram over a bounded equi-width bin axis) rather
  // than a scalar count/sum per named group. Composes the existing
  // bounded-bin fold (Histogram.equiWidth: one scan, one hash agg on
  // the bucket id, dense nb+2 spine with explicit zero rows — empty
  // bins MUST be released noised too, or their absence leaks) with
  // the deterministic Laplace machinery above, noise keyed on the
  // bucket id.
  //
  // ε-composition: the bins partition the domain, so with the unit of
  // privacy = ONE ROW (count sensitivity 1 per bin; a unit that can
  // contribute k rows costs k·ε — pre-aggregate to one row per unit
  // first, as noisedSums does) the whole histogram is ONE ε release
  // by parallel composition: each row lands in exactly one bin, so
  // the worst-case neighbor differs in one bin's count only.
  // Releasing quantiles read off the noised CDF costs nothing further
  // (post-processing).

  /** Equi-width histogram of `column` over [lo, hi) with `nb` bins
    * (+ under/overflow) and Laplace(1/ε) noise per bin. Output:
    * `(bucket, lo_edge, hi_edge, noised_n)` — true counts withheld,
    * empty bins noised like any other. '''NOT a cryptographic DP
    * mechanism''' — see [[noisedCounts]]: deterministic public
    * keyed-hash noise; swap in a secret seed for a real deployment. */
  def noisedHistogram(df: DataFrame, column: String, lo: Double,
                      hi: Double, nb: Int, epsilon: Double,
                      salt: Int = 41): DataFrame = {
    require(epsilon > 0)
    val hist = Histogram.equiWidth(df, column, lo, hi, nb)
    val key = graft.dedup.MinHashDedup.portableShingleHash(
      col("bucket").cast("string"))
    val u = greatest(lit(1e-12), least(lit(1.0 - 1e-12),
      graft.functions.Noise.hashNoise(key, salt)))
    val b = lit(1.0 / epsilon)
    val c = u - lit(0.5)
    val noise = -b * signum(c) * log(lit(1.0) - lit(2.0) * abs(c))
    hist.select(col("bucket"), col("lo_edge"), col("hi_edge"),
      // floor-portable round (§5.3): noised empty bins straddle zero
      (floor((col("n_rows").cast("double") + noise) * lit(1e6)
        + lit(0.5)) / lit(1e6)).as("noised_n"))
  }

  /** DuckDB twin of [[noisedHistogram]] — identical bin rule, spine,
    * hash, CDF and op order. lo/hi/width must be exactly-representable
    * doubles (the d18 contract). */
  def sqlNoisedHistogram(table: String, column: String, lo: Double,
                         hi: Double, nb: Int, epsilon: Double,
                         salt: Int = 41): String = {
    import graft.functions.Noise.sqlDouble
    val w = (hi - lo) / nb
    val loS = sqlDouble(lo); val hiS = sqlDouble(hi)
    val wS = sqlDouble(w)
    val key = s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, len(CAST(s.bucket AS VARCHAR)) + 1),
        j -> CAST(ascii((CAST(s.bucket AS VARCHAR))[j:j]) AS BIGINT))),
      (a, ch) -> (a * 31 + ch) % 1000000007)"""
    val u0 = graft.functions.Noise.sqlNoise(key, salt)
    val u = s"greatest(${sqlDouble(1e-12)}, least(${sqlDouble(1.0 - 1e-12)}, $u0))"
    val c = s"(($u) - 5.0e-1)"
    val noise = s"""(-${sqlDouble(1.0 / epsilon)} * sign($c)
      * ln(1.0e0 - 2.0e0 * abs($c)))"""
    s"""
    WITH counts AS (
      SELECT CASE WHEN $column < $loS THEN CAST(-1 AS BIGINT)
                  WHEN $column >= $hiS THEN CAST($nb AS BIGINT)
                  ELSE CAST(floor(($column - $loS) / $wS) AS BIGINT)
             END AS bucket,
             count(*) AS n_rows
      FROM $table WHERE $column IS NOT NULL
      GROUP BY 1
    ), s AS (
      SELECT CAST(unnest(generate_series(-1, $nb)) AS BIGINT) AS bucket
    )
    SELECT s.bucket,
      CASE WHEN s.bucket BETWEEN 0 AND ${nb - 1}
           THEN $loS + s.bucket * $wS END AS lo_edge,
      CASE WHEN s.bucket BETWEEN 0 AND ${nb - 1}
           THEN $loS + (s.bucket + 1) * $wS END AS hi_edge,
      floor((CAST(coalesce(c.n_rows, 0) AS DOUBLE) + $noise)
        * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS noised_n
    FROM s LEFT JOIN counts c ON s.bucket = c.bucket"""
  }

  /** [[noisedHistogram]] under the GAUSSIAN MECHANISM — the (ε, δ)
    * distribution release (parallel composition across bins holds for
    * Gaussian noise exactly as for Laplace: a neighbor moves one
    * bin's count). σ = sqrt(2·ln(1.25/δ))/ε, Δ = 1 per bin with the
    * one-row-per-unit contract. Same non-cryptographic caveat. */
  def noisedHistogramGaussian(df: DataFrame, column: String, lo: Double,
                              hi: Double, nb: Int, epsilon: Double,
                              delta: Double,
                              salt: Int = 43): DataFrame = {
    require(epsilon > 0)
    require(delta > 0 && delta < 1, s"delta must be in (0,1): $delta")
    // the classic analytic Gaussian bound sigma = sqrt(2 ln(1.25/d))/e
    // is only a valid (e, d)-DP calibration for e < 1 (Dwork & Roth,
    // Thm 3.22); outside that range it UNDER-noises, so refuse rather
    // than publish an uncalibrated release claimed as DP
    require(epsilon < 1,
      s"analytic Gaussian calibration requires epsilon < 1: $epsilon")
    val hist = Histogram.equiWidth(df, column, lo, hi, nb)
    val key = graft.dedup.MinHashDedup.portableShingleHash(
      col("bucket").cast("string"))
    val u = greatest(lit(1e-12), least(lit(1.0 - 1e-12),
      graft.functions.Noise.hashNoise(key, salt)))
    val sigma = math.sqrt(2.0 * math.log(1.25 / delta)) / epsilon
    val noise = lit(sigma) * graft.functions.Noise.invNormal(u)
    hist.select(col("bucket"), col("lo_edge"), col("hi_edge"),
      (floor((col("n_rows").cast("double") + noise) * lit(1e6)
        + lit(0.5)) / lit(1e6)).as("noised_n"))
  }

  /** DuckDB twin of [[noisedHistogramGaussian]]. */
  def sqlNoisedHistogramGaussian(table: String, column: String,
                                 lo: Double, hi: Double, nb: Int,
                                 epsilon: Double, delta: Double,
                                 salt: Int = 43): String = {
    require(epsilon < 1,
      s"analytic Gaussian calibration requires epsilon < 1: $epsilon")
    import graft.functions.Noise.sqlDouble
    val w = (hi - lo) / nb
    val loS = sqlDouble(lo); val hiS = sqlDouble(hi)
    val wS = sqlDouble(w)
    val key = s"""list_reduce(list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, len(CAST(s.bucket AS VARCHAR)) + 1),
        j -> CAST(ascii((CAST(s.bucket AS VARCHAR))[j:j]) AS BIGINT))),
      (a, ch) -> (a * 31 + ch) % 1000000007)"""
    val u0 = graft.functions.Noise.sqlNoise(key, salt)
    val u = s"greatest(${sqlDouble(1e-12)}, least(${sqlDouble(1.0 - 1e-12)}, $u0))"
    val sigma = math.sqrt(2.0 * math.log(1.25 / delta)) / epsilon
    val noise =
      s"(${sqlDouble(sigma)} * ${graft.functions.Noise.sqlInvNormal(u)})"
    s"""
    WITH counts AS (
      SELECT CASE WHEN $column < $loS THEN CAST(-1 AS BIGINT)
                  WHEN $column >= $hiS THEN CAST($nb AS BIGINT)
                  ELSE CAST(floor(($column - $loS) / $wS) AS BIGINT)
             END AS bucket,
             count(*) AS n_rows
      FROM $table WHERE $column IS NOT NULL
      GROUP BY 1
    ), s AS (
      SELECT CAST(unnest(generate_series(-1, $nb)) AS BIGINT) AS bucket
    )
    SELECT s.bucket,
      CASE WHEN s.bucket BETWEEN 0 AND ${nb - 1}
           THEN $loS + s.bucket * $wS END AS lo_edge,
      CASE WHEN s.bucket BETWEEN 0 AND ${nb - 1}
           THEN $loS + (s.bucket + 1) * $wS END AS hi_edge,
      floor((CAST(coalesce(c.n_rows, 0) AS DOUBLE) + $noise)
        * 1000000.0e0 + 0.5e0) / 1000000.0e0 AS noised_n
    FROM s LEFT JOIN counts c ON s.bucket = c.bucket"""
  }

  /** Quantiles read off the NOISED CDF of [[noisedHistogram]] — free
    * by the post-processing property of DP (a function of an ε-DP
    * release is ε-DP; no further budget). Per requested p: clamp each
    * bin's noised count to ≥ 0, cumulate over the bin axis in bucket
    * order, and linearly interpolate inside the first bin whose
    * cumulative mass reaches p · total. Under/overflow bins carry
    * mass but have no width — a quantile landing there reports the
    * boundary edge (`lo`/`hi`). Output: one row per p:
    * `(p, noised_q)`. Accuracy degrades with ε exactly as the
    * histogram's noise does; ~nb·b mass error total. '''NOT a
    * cryptographic DP mechanism''' — see [[noisedCounts]]. */
  def noisedQuantiles(df: DataFrame, column: String, lo: Double,
                      hi: Double, nb: Int, epsilon: Double,
                      ps: Seq[Double], salt: Int = 41): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    import org.apache.spark.sql.expressions.Window
    val w = (hi - lo) / nb
    // masses quantized to BIGINT MICRO-UNITS before cumulating:
    // noised_n is already on the 6-dp grid, so floor(m·1e6 + 0.5)
    // recovers its exact integer micro-count and the cum/tot windows
    // below are pure integer folds — immune to the Spark running-frame
    // vs DuckDB segment-tree double-summation order (§5.3)
    val hist = noisedHistogram(df, column, lo, hi, nb, epsilon, salt)
      .withColumn("__m", floor(greatest(col("noised_n"), lit(0.0))
        * lit(1e6) + lit(0.5)).cast("bigint"))
    val wOrd = Window.orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    // nb+2 rows total — the window-without-partition warning is moot
    val cum = hist
      .withColumn("__cum", sum(col("__m")).over(wOrd))
      .withColumn("__tot", sum(col("__m")).over(wAll))
      .withColumn("__prev", col("__cum") - col("__m"))
    val psDf = cum.sparkSession.range(ps.length)
      .select(col("id").cast("int").as("__i"))
      .withColumn("p", element_at(array(ps.map(lit): _*), col("__i") + 1))
      .drop("__i")
    // first bucket whose cum reaches p·tot; interpolate inside it.
    // cum/tot/prev/m are exact integers (< 2^53 in double), so both
    // the boundary compare and the interpolation are ONE fixed IEEE
    // sequence; the emitted quantile finishes on the 6-dp
    // floor-portable grid (no unrounded emitted doubles, §5.3)
    psDf.crossJoin(cum)
      .filter(col("__cum").cast("double") >=
        col("p") * col("__tot").cast("double"))
      .withColumn("__q",
        when(col("bucket") === -1L, lit(lo))
          .when(col("bucket") === nb.toLong, lit(hi))
          // m = 0 rows can pass the cum filter but can never be the
          // min_by winner (their predecessor already reached p·tot);
          // the guard only keeps ANSI mode from throwing on them
          .when(col("__m") === 0L, col("lo_edge"))
          .otherwise(col("lo_edge") + lit(w) *
            ((col("p") * col("__tot").cast("double")
              - col("__prev").cast("double")) / col("__m").cast("double"))))
      .groupBy(col("p"))
      .agg((floor(min_by(col("__q"), col("bucket")) * lit(1e6) + lit(0.5))
        / lit(1e6)).as("noised_q"))
  }

  /** DuckDB twin of [[noisedQuantiles]] — identical clamp, cumulation
    * and interpolation over the [[sqlNoisedHistogram]] release. */
  def sqlNoisedQuantiles(table: String, column: String, lo: Double,
                         hi: Double, nb: Int, epsilon: Double,
                         ps: Seq[Double], salt: Int = 41): String = {
    import graft.functions.Noise.sqlDouble
    val w = sqlDouble((hi - lo) / nb)
    val psList = ps.map(sqlDouble).mkString("[", ", ", "]")
    s"""
    WITH hist AS (${sqlNoisedHistogram(table, column, lo, hi, nb,
        epsilon, salt)}),
    m AS (
      SELECT bucket, lo_edge,
        CAST(floor(greatest(noised_n, 0.0e0) * 1e6 + 0.5e0) AS BIGINT) AS m
      FROM hist
    ), cum AS (
      SELECT bucket, lo_edge,
        m, CAST(sum(m) OVER (ORDER BY bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        CAST(sum(m) OVER () AS BIGINT) AS tot
      FROM m
    ), ps AS (SELECT unnest($psList) AS p)
    SELECT p,
      floor(min_by(CASE WHEN bucket = -1 THEN ${sqlDouble(lo)}
                  WHEN bucket = $nb THEN ${sqlDouble(hi)}
                  WHEN m = 0 THEN lo_edge
                  ELSE lo_edge + $w * ((p * CAST(tot AS DOUBLE)
                    - CAST(cum - m AS DOUBLE)) / CAST(m AS DOUBLE))
             END, bucket) * 1e6 + 0.5e0) / 1e6 AS noised_q
    FROM ps JOIN cum ON CAST(cum.cum AS DOUBLE) >= ps.p * CAST(cum.tot AS DOUBLE)
    GROUP BY p"""
  }

  // ---- t-closeness ------------------------------------------------
  // The audit [[audit]] cannot see: a class can be k-large and
  // l-diverse yet still leak — if every row in the class has a HIGH
  // salary, knowing membership narrows the sensitive value to "high"
  // even though the exact value stays hidden. t-closeness (Li, Li &
  // Venkatasubramanian, ICDE 2007) bounds the DISTANCE between each
  // class's sensitive distribution and the table-wide one; for ordered
  // (numeric) attributes the distance is the Earth Mover's Distance
  // with ordered ground distance,
  //
  //   D[P, Q] = (1/(m−1)) · Σᵢ |Σ_{j≤i} (p_j − q_j)|
  //
  // over the m globally-distinct values in order — the same
  // cumulative-difference fold as Wasserstein-1, normalized to [0, 1]
  // by the axis span.

  /** Per-class ordered-distance EMD against the global distribution.
    *
    * Determinism: all counts exact BIGINT; each per-value term is ONE
    * fixed double sequence (cc/n_class − cg/N); both the cumulative
    * difference and the Σ|·| run as ORDERED expanding windows over the
    * value axis, so addition order is pinned on both engines.
    *
    * Scale: the axis is the DISTINCT SENSITIVE VALUE grid — the
    * sensitive column is decimal-cast ([[graft.impute.Robust.ecdf]]'s
    * bounded-grid contract; quantize continuous metrics first), so the
    * working set is classes × m (model-sized), never corpus rows: two
    * hash aggregates over the table, a broadcast of the m-row axis,
    * and per-class ordered windows over m rows. Null quasi or
    * sensitive values are excluded (joins cannot carry null keys
    * cross-engine; the k-audit still counts them).
    *
    * Output per class: `(quasi…, class_size, m_values,
    * t_closeness (6dp), at_risk)` — `at_risk` = 1 when t_closeness
    * exceeds `threshold`. */
  def tCloseness(df: DataFrame, quasi: Seq[String], sensitive: String,
                 threshold: Double): DataFrame = {
    require(quasi.nonEmpty && threshold > 0)
    import org.apache.spark.sql.expressions.Window
    val g = quasi.map(col)
    val rows = df
      .filter(quasi.map(col(_).isNotNull).reduce(_ && _)
        && col(sensitive).isNotNull)
      .select(g :+ col(sensitive).cast("decimal(18,2)").as("__v"): _*)
    val global = rows.groupBy(col("__v")).agg(count(lit(1)).as("__cg"))
    val tot = global.agg(sum(col("__cg")).cast("bigint").as("__N"),
      count(lit(1)).as("__m"))
    val classes = rows.groupBy(g: _*).agg(count(lit(1)).as("class_size"))
    val classVal = rows.groupBy(g :+ col("__v"): _*)
      .agg(count(lit(1)).as("__cc"))
    val wCum = Window.partitionBy(g: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    def d(c: Column) = c.cast("double")
    val grid = classes
      .crossJoin(broadcast(global))
      .join(classVal, quasi :+ "__v", "left")
      .crossJoin(broadcast(tot))
      .withColumn("__r",
        d(coalesce(col("__cc"), lit(0L))) / d(col("class_size"))
          - d(col("__cg")) / d(col("__N")))
      .withColumn("__cum", sum(col("__r")).over(wCum))
      .withColumn("__acc", sum(abs(col("__cum"))).over(wCum))
    grid.groupBy(g: _*)
      .agg(max(col("class_size")).as("class_size"),
        max(col("__m")).as("m_values"),
        round(when(max(col("__m")) === 1L, lit(0.0))
          .otherwise(max_by(col("__acc"), col("__v"))
            / (d(max(col("__m"))) - lit(1.0))), 6).as("t_closeness"))
      .withColumn("at_risk", (col("t_closeness") > threshold).cast("int"))
  }

  /** DuckDB twin of [[tCloseness]] — identical exclusions, term
    * arithmetic and ordered folds. */
  def sqlTCloseness(table: String, quasi: Seq[String], sensitive: String,
                    threshold: Double): String = {
    import graft.functions.Noise.sqlDouble
    val q = quasi.mkString(", ")
    val qc = quasi.map(c => s"c.$c").mkString(", ")
    val notNull = (quasi :+ sensitive).map(c => s"$c IS NOT NULL")
      .mkString(" AND ")
    val onQ = quasi.map(c => s"cv.$c = c.$c").mkString(" AND ")
    s"""
    WITH rows0 AS (
      SELECT $q, CAST($sensitive AS DECIMAL(18,2)) AS v
      FROM $table WHERE $notNull
    ), gax AS (
      SELECT v, CAST(count(*) AS BIGINT) AS cg FROM rows0 GROUP BY v
    ), tot AS (
      SELECT CAST(sum(cg) AS BIGINT) AS nn, CAST(count(*) AS BIGINT) AS m
      FROM gax
    ), classes AS (
      SELECT $q, CAST(count(*) AS BIGINT) AS class_size
      FROM rows0 GROUP BY $q
    ), cv AS (
      SELECT $q, v, CAST(count(*) AS BIGINT) AS cc
      FROM rows0 GROUP BY $q, v
    ), grid AS (
      SELECT $qc, c.class_size, g.v, g.cg,
        coalesce(cv.cc, CAST(0 AS BIGINT)) AS cc
      FROM classes c CROSS JOIN gax g
      LEFT JOIN cv ON $onQ AND cv.v = g.v
    ), terms AS (
      SELECT $q, class_size, v,
        CAST(cc AS DOUBLE) / CAST(class_size AS DOUBLE)
          - CAST(cg AS DOUBLE) / CAST(nn AS DOUBLE) AS r, m
      FROM grid CROSS JOIN tot
    ), cums AS (
      SELECT $q, class_size, v, m,
        sum(r) OVER (PARTITION BY $q ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM terms
    ), accs AS (
      SELECT $q, class_size, v, m,
        sum(abs(cum)) OVER (PARTITION BY $q ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS acc
      FROM cums
    ), agg AS (
      SELECT $q, max(class_size) AS class_size, max(m) AS m_values,
        round(CASE WHEN max(m) = 1 THEN 0.0e0
          ELSE max_by(acc, v) / (CAST(max(m) AS DOUBLE) - 1.0e0) END, 6)
          AS t_closeness
      FROM accs GROUP BY $q)
    SELECT $q, class_size, m_values, t_closeness,
      CAST(t_closeness > ${sqlDouble(threshold)} AS INT) AS at_risk
    FROM agg"""
  }

  // ---- entropy l-diversity ----------------------------------------

  /** ENTROPY l-DIVERSITY (Machanavajjhala et al. 2007) — the stronger
    * form of the [[audit]] distinct count: a class whose sensitive
    * values split 99 : 1 "has 2 distinct values" but discloses the
    * sensitive attribute with 99% confidence. Entropy l-diversity
    * requires H(class) ≥ ln(l); the EFFECTIVE l = e^H reads as "this
    * class is as diverse as a uniform distribution over l values".
    * With [[audit]] (k-anonymity + distinct l) and [[tCloseness]]
    * this completes the classic release-audit triad.
    *
    * Scale/determinism: one (quasi, sensitive) hash agg then a
    * class-axis agg; each value's −p·ln p is quantized to the 1e-9
    * integer grid (floor-portable) so the per-class entropy sum is an
    * exact BIGINT — order-free in both engines — and effective l is
    * one `exp` off it, 6-dp rounded. Output: `(quasi…, class_size,
    * distinct_l, entropy (6 dp), effective_l (6 dp), at_risk)`. */
  def entropyLDiversity(df: DataFrame, quasi: Seq[String],
                        sensitive: String, l: Double): DataFrame = {
    require(quasi.nonEmpty && l >= 1)
    val g = quasi.map(col)
    val rows = df
      .filter(quasi.map(col(_).isNotNull).reduce(_ && _)
        && col(sensitive).isNotNull)
    val perVal = rows.groupBy(g :+ col(sensitive).as("__s"): _*)
      .agg(count(lit(1)).as("__c"))
    val perClass = perVal.groupBy(g: _*)
      .agg(sum(col("__c")).cast("bigint").as("class_size"),
        count(lit(1)).as("distinct_l"))
    def d(c: Column) = c.cast("double")
    val plogp = floor(
      -(d(col("__c")) / d(col("class_size"))) *
        log(d(col("__c")) / d(col("class_size"))) * lit(1e9) + lit(0.5))
      .cast("bigint")
    val h = perVal.join(perClass, quasi)
      .withColumn("__t", plogp)
      .groupBy(g: _*)
      .agg(max(col("class_size")).as("class_size"),
        max(col("distinct_l")).as("distinct_l"),
        sum(col("__t")).as("__h9"))
    h.select((g ++ Seq(col("class_size"), col("distinct_l"),
        round(d(col("__h9")) / lit(1e9), 6).as("entropy"),
        round(exp(d(col("__h9")) / lit(1e9)), 6).as("effective_l"),
        (exp(d(col("__h9")) / lit(1e9)) < lit(l)).cast("int")
          .as("at_risk"))): _*)
  }

  /** DuckDB twin of [[entropyLDiversity]]. */
  def sqlEntropyLDiversity(table: String, quasi: Seq[String],
                           sensitive: String, l: Double): String = {
    val q = quasi.mkString(", ")
    val notNull = (quasi :+ sensitive).map(c => s"$c IS NOT NULL")
      .mkString(" AND ")
    s"""
    WITH pv AS (
      SELECT $q, $sensitive AS s, CAST(count(*) AS BIGINT) AS c
      FROM $table WHERE $notNull GROUP BY $q, $sensitive
    ), pc AS (
      SELECT $q, CAST(sum(c) AS BIGINT) AS class_size,
        CAST(count(*) AS BIGINT) AS distinct_l
      FROM pv GROUP BY $q
    ), terms AS (
      SELECT pv.*, pc.class_size, pc.distinct_l,
        CAST(floor(-(CAST(c AS DOUBLE) / CAST(class_size AS DOUBLE))
          * ln(CAST(c AS DOUBLE) / CAST(class_size AS DOUBLE))
          * 1e9 + 0.5e0) AS BIGINT) AS t
      FROM pv JOIN pc USING ($q)
    ), agg AS (
      SELECT $q, max(class_size) AS class_size,
        max(distinct_l) AS distinct_l,
        CAST(sum(t) AS BIGINT) AS h9
      FROM terms GROUP BY $q)
    SELECT $q, class_size, distinct_l,
      round(CAST(h9 AS DOUBLE) / 1e9, 6) AS entropy,
      round(exp(CAST(h9 AS DOUBLE) / 1e9), 6) AS effective_l,
      CAST(exp(CAST(h9 AS DOUBLE) / 1e9)
        < ${graft.functions.Noise.sqlDouble(l)} AS INT) AS at_risk
    FROM agg"""
  }
}
