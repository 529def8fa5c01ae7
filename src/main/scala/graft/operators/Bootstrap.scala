package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** POISSON BOOTSTRAP CONFIDENCE INTERVALS — the distributed-systems
  * form of the bootstrap (Chamandy et al., "Estimating Uncertainty for
  * Massive Data Streams", the pattern behind large-scale metric CIs):
  * classic resampling draws n rows WITH replacement per replica, which
  * is a shuffle per replica and unshardable; the Poisson trick observes
  * that each row's multiplicity in a replica is ≈ Poisson(1), which is
  * per-row INDEPENDENT — so every replica becomes a per-row weight and
  * all B replicas compute in ONE aggregation pass, map-side
  * partial-agg'd, no resampling shuffle anywhere.
  *
  * Determinism (the whole CI sits under the bit-exact oracle): the
  * Poisson(1) draw comes from keyed hash-noise pushed through the
  * inverse CDF as a fixed literal ladder (the residual tail mass past
  * the 9-entry ladder — P ≈ 1e-6 — maps to weight 9,
  * and BOTH engines map it identically so this is a definition, not an
  * approximation); replica means are exact decimal Σ(w·x) over exact
  * integer Σw with ONE double division; CI bounds are exact type-7
  * percentiles over the B replica means (B is bounded, so the
  * per-group percentile buffer is B doubles — none of the exact-
  * percentile scale hazard applies).
  *
  * Scale shape (100 TB): the replica explosion is map-side (B rows per
  * input row) feeding a partial aggregate keyed on (group, replica) —
  * shuffle traffic is |groups|·B rows, NOT |corpus|·B; the percentile
  * pass runs over |groups|·B. CPU pays the inherent B× multiplier —
  * that's the bootstrap; B is the dial (Chamandy recommends 100–1000).
  */
object Bootstrap {

  /** Poisson(1) inverse-CDF ladder: cumulative e⁻¹·Σ 1/k!, written as
    * exact double literals so both engines compare against identical
    * bits. */
  private val PoissonCdf: Seq[Double] = Seq(
    0.36787944117144233, 0.7357588823428847, 0.9196986029286058,
    0.9810118431238463, 0.9963401531726563, 0.9994058151824183,
    0.999916758850712, 0.9999897508033253, 0.999998874797402)

  private def poissonDraw(u: Column): Column =
    PoissonCdf.zipWithIndex.foldRight(lit(PoissonCdf.length.toLong)) {
      case ((c, k), rest) => when(u < lit(c), lit(k.toLong)).otherwise(rest)
    }

  /** Per-(row, replica) uniform: the hashNoise recipe with the replica
    * index folded into the salt term, so replicas are independent
    * streams off the same row key. */
  private def replicaNoise(key: Column, replica: Column, salt: Int): Column = {
    val x = sin(key * lit(12.9898) +
      (lit(salt.toDouble) + replica.cast("double")) * lit(78.233)) *
      lit(43758.5453)
    x - floor(x)
  }

  /** Bootstrap CI for the per-group MEAN of `valueCol`: one row per
    * group with `mean` (point estimate, exact-decimal), `ci_lo`,
    * `ci_hi` (percentile bootstrap at `alpha`), `n_rows`. `keyExpr`
    * must be a small-integer row key (the sin-hash domain — same
    * contract as Noise.hashNoise). */
  def meanCi(df: DataFrame, valueCol: String, groupCols: Seq[String],
             keyExpr: Column, b: Int = 100, alpha: Double = 0.05,
             salt: Int = 97): DataFrame = {
    require(b >= 10 && alpha > 0 && alpha < 1)
    val dec = col(valueCol).cast("decimal(18,2)")
    // point estimate + n from the REAL sample (one agg)
    val point = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        (sum(dec).cast("double") / count(dec).cast("double")).as("mean"))
    // B replicas: explode the replica axis map-side, Poisson weight per
    // (row, replica), exact Σ(w·x) / Σw per (group, replica)
    val reps = df
      .select(groupCols.map(col) :+ dec.as("__x") :+ keyExpr.as("__k"): _*)
      .select(col("*"),
        explode(sequence(lit(0), lit(b - 1))).as("__r"))
      .withColumn("__w", poissonDraw(replicaNoise(col("__k"), col("__r"), salt)))
      .groupBy((groupCols.map(col) :+ col("__r")): _*)
      .agg(sum(col("__x") * col("__w")).as("__sw"), sum(col("__w")).as("__n"))
      .select(groupCols.map(col) :+
        when(col("__n") > 0,
          col("__sw").cast("double") / col("__n").cast("double")).as("__m"): _*)
    val lo = alpha / 2; val hi = 1 - alpha / 2
    val ci = reps.groupBy(groupCols.map(col): _*)
      .agg(round(expr(s"percentile(__m, $lo)"), 6).as("ci_lo"),
        round(expr(s"percentile(__m, $hi)"), 6).as("ci_hi"))
    point.join(ci, groupCols)
      .select(groupCols.map(col) ++ Seq(col("n_rows"),
        round(col("mean"), 6).as("mean"), col("ci_lo"), col("ci_hi")): _*)
  }

  /** Bootstrap CI for the DIFFERENCE of two variant means — the A/B
    * readout form: per replica, the same Poisson weights produce both
    * variant means from ONE aggregate (conditional sums), and the CI
    * comes from the percentile of the B mean differences. A CI
    * excluding 0 is the nonparametric significance call — no normality
    * assumption on the metric, which is the point for revenue-shaped
    * data. Same one-pass scale shape as [[meanCi]]. Output one row:
    * `n_a, n_b, diff (point, b−a, 6dp), ci_lo, ci_hi`. */
  def diffCi(perUnit: DataFrame, variantCol: String, valueCol: String,
             a: String, b: String, keyExpr: Column, nBoot: Int = 100,
             alpha: Double = 0.05, salt: Int = 97): DataFrame = {
    require(nBoot >= 10 && alpha > 0 && alpha < 1)
    val dec = col(valueCol).cast("decimal(18,2)")
    val isA = col(variantCol) === lit(a)
    val isB = col(variantCol) === lit(b)
    val point = perUnit.filter(isA || isB).agg(
      count(when(isA, lit(1))).as("n_a"),
      count(when(isB, lit(1))).as("n_b"),
      (sum(when(isB, dec)).cast("double") / count(when(isB, dec))
        - sum(when(isA, dec)).cast("double") / count(when(isA, dec)))
        .as("__diff"))
    val reps = perUnit.filter(isA || isB)
      .select(col(variantCol).as("__v"), dec.as("__x"), keyExpr.as("__k"))
      .select(col("*"), explode(sequence(lit(0), lit(nBoot - 1))).as("__r"))
      .withColumn("__w", poissonDraw(replicaNoise(col("__k"), col("__r"), salt)))
      .groupBy(col("__r"))
      .agg(
        sum(when(col("__v") === a, col("__x") * col("__w"))).as("__swa"),
        sum(when(col("__v") === a, col("__w"))).as("__na"),
        sum(when(col("__v") === b, col("__x") * col("__w"))).as("__swb"),
        sum(when(col("__v") === b, col("__w"))).as("__nb"))
      .select(
        when(col("__na") > 0 && col("__nb") > 0,
          col("__swb").cast("double") / col("__nb").cast("double")
            - col("__swa").cast("double") / col("__na").cast("double"))
          .as("__d"))
    val lo = alpha / 2; val hi = 1 - alpha / 2
    val ci = reps.agg(
      round(expr(s"percentile(__d, $lo)"), 6).as("ci_lo"),
      round(expr(s"percentile(__d, $hi)"), 6).as("ci_hi"))
    point.crossJoin(ci)
      .select(col("n_a"), col("n_b"), round(col("__diff"), 6).as("diff"),
        col("ci_lo"), col("ci_hi"))
  }

  /** DuckDB twin of [[diffCi]]. `perUnitSql` must select
    * `(variant, m, key)`. */
  def sqlDiffCi(perUnitSql: String, a: String, b: String,
                nBoot: Int = 100, alpha: Double = 0.05,
                salt: Int = 97): String = {
    import graft.functions.Noise.sqlDouble
    val x = s"sin(key * 12.9898e0 + " +
      s"(${sqlDouble(salt.toDouble)} + CAST(r.r AS DOUBLE)) * 78.233e0) " +
      "* 43758.5453e0"
    val u = s"(($x) - floor($x))"
    val ladder = PoissonCdf.zipWithIndex
      .map { case (c, k) => s"WHEN ($u) < ${sqlDouble(c)} THEN $k" }
      .mkString(" ")
    val w = s"(CASE $ladder ELSE ${PoissonCdf.length} END)"
    s"""WITH pu AS ($perUnitSql), reps AS (
          SELECT r.r AS rr,
            CAST(sum(CASE WHEN variant = '$a'
              THEN CAST(m AS DECIMAL(18,2)) * $w END) AS DECIMAL(38,2)) AS swa,
            CAST(sum(CASE WHEN variant = '$a' THEN $w END) AS BIGINT) AS na,
            CAST(sum(CASE WHEN variant = '$b'
              THEN CAST(m AS DECIMAL(18,2)) * $w END) AS DECIMAL(38,2)) AS swb,
            CAST(sum(CASE WHEN variant = '$b' THEN $w END) AS BIGINT) AS nb
          FROM pu, LATERAL unnest(generate_series(0, ${nBoot - 1})) r(r)
          WHERE variant IN ('$a', '$b')
          GROUP BY r.r
        ), diffs AS (
          SELECT CASE WHEN na > 0 AND nb > 0
            THEN CAST(swb AS DOUBLE) / CAST(nb AS DOUBLE)
               - CAST(swa AS DOUBLE) / CAST(na AS DOUBLE) END AS d
          FROM reps
        ), ci AS (
          SELECT round(quantile_cont(d, ${sqlDouble(alpha / 2)}), 6) AS ci_lo,
            round(quantile_cont(d, ${sqlDouble(1 - alpha / 2)}), 6) AS ci_hi
          FROM diffs
        ), pt AS (
          SELECT
            CAST(count(CASE WHEN variant = '$a' THEN 1 END) AS BIGINT) AS n_a,
            CAST(count(CASE WHEN variant = '$b' THEN 1 END) AS BIGINT) AS n_b,
            round(CAST(sum(CASE WHEN variant = '$b'
                THEN CAST(m AS DECIMAL(18,2)) END) AS DOUBLE)
                / count(CASE WHEN variant = '$b' THEN m END)
              - CAST(sum(CASE WHEN variant = '$a'
                THEN CAST(m AS DECIMAL(18,2)) END) AS DOUBLE)
                / count(CASE WHEN variant = '$a' THEN m END), 6) AS diff
          FROM pu WHERE variant IN ('$a', '$b')
        )
        SELECT n_a, n_b, diff, ci_lo, ci_hi FROM pt CROSS JOIN ci"""
  }

  /** DuckDB twin of [[meanCi]] — identical draw ladder, exact sums,
    * type-7 percentiles. `keySql` mirrors `keyExpr`. */
  def sqlMeanCi(table: String, valueCol: String, groupCols: Seq[String],
                keySql: String, b: Int = 100, alpha: Double = 0.05,
                salt: Int = 97): String = {
    import graft.functions.Noise.sqlDouble
    val g = groupCols.mkString(", ")
    val x = s"sin(($keySql) * 12.9898e0 + " +
      s"(${sqlDouble(salt.toDouble)} + CAST(r.r AS DOUBLE)) * 78.233e0) " +
      "* 43758.5453e0"
    val u = s"(($x) - floor($x))"
    val ladder = PoissonCdf.zipWithIndex
      .map { case (c, k) => s"WHEN ($u) < ${sqlDouble(c)} THEN $k" }
      .mkString(" ")
    val w = s"(CASE $ladder ELSE ${PoissonCdf.length} END)"
    s"""WITH reps AS (
          SELECT $g, r.r AS __r,
            CAST(sum(CAST($valueCol AS DECIMAL(18,2)) * $w)
              AS DECIMAL(38,2)) AS sw,
            CAST(sum($w) AS BIGINT) AS n
          FROM $table, LATERAL unnest(generate_series(0, ${b - 1})) r(r)
          GROUP BY $g, r.r
        ), means AS (
          SELECT $g,
            CASE WHEN n > 0 THEN CAST(sw AS DOUBLE) / CAST(n AS DOUBLE)
            END AS m
          FROM reps
        ), ci AS (
          SELECT $g,
            round(quantile_cont(m, ${sqlDouble(alpha / 2)}), 6) AS ci_lo,
            round(quantile_cont(m, ${sqlDouble(1 - alpha / 2)}), 6) AS ci_hi
          FROM means GROUP BY $g
        ), pt AS (
          SELECT $g, CAST(count(*) AS BIGINT) AS n_rows,
            round(CAST(sum(CAST($valueCol AS DECIMAL(18,2))) AS DOUBLE)
              / count($valueCol), 6) AS mean
          FROM $table GROUP BY $g
        )
        SELECT $g, n_rows, mean, ci_lo, ci_hi
        FROM pt JOIN ci USING ($g)"""
  }
}
