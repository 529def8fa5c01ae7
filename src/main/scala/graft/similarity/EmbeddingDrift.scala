package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** EMBEDDING-SPACE DRIFT — the drift family ([[graft.operators.Drift]]:
  * PSI/JSD/KS over scalars, profile drift over tables) extended to the
  * EMBEDDING COLUMN: when the encoder is retrained or the corpus mix
  * shifts, the vector space moves, and every persisted ANN index /
  * centroid model built on the old space silently degrades (the
  * IvfIndex re-fit policy's trigger). This operator reads the shift
  * directly from two snapshots:
  *
  *  - per-dimension: mean/variance of each coordinate in A and B and
  *    the mean shift — the axis that moved is usually diagnostic
  *    (a single drifted dim = a feature pipeline bug; uniform drift =
  *    a retrained encoder);
  *  - overall: cosine between the two MEAN vectors (1.0 = direction
  *    preserved) and the L2 norm of the mean shift.
  *
  * Determinism (§5.3): coordinates quantize to the 6-dp grid
  * ([[Pca.covarianceExact]]'s convention) so per-dim sums fold as
  * exact decimals; the cross-dim dot/norm folds quantize each term to
  * a 1e-9 integer grid (order-free BIGINT sums); every emitted double
  * finishes on the 6-dp floor-portable grid. Scale: one posexplode
  * scan per snapshot into a (snapshot, dim)-keyed hash agg — partial
  * map-side, d-row result; the overall row folds the d-row frame. */
object EmbeddingDrift {

  private def r6(c: Column): Column =
    floor(c * lit(1e6) + lit(0.5)) / lit(1e6)

  /** Per-dimension drift stats between snapshots `a` and `b` (same
    * vector dim): one row per dim `(i, n_a, mean_a, var_a, n_b,
    * mean_b, var_b, mean_shift)`, population variance, 6-dp. */
  def perDim(a: DataFrame, b: DataFrame, vecCol: String): DataFrame = {
    def stats(df: DataFrame, sfx: String): DataFrame = {
      val q = (floor(col("__x").cast("double") * lit(1e6) + lit(0.5))
        / lit(1e6)).cast("decimal(18,6)")
      df.filter(col(vecCol).isNotNull)
        .select(posexplode(col(vecCol)).as(Seq("__i", "__x")))
        .select(col("__i").cast("bigint").as("i"), q.as("__q"))
        .groupBy(col("i"))
        .agg(count(lit(1)).as(s"n_$sfx"),
          sum(col("__q")).as(s"__s_$sfx"),
          sum(col("__q") * col("__q")).as(s"__ss_$sfx"))
    }
    def d(c: Column) = c.cast("double")
    stats(a, "a").join(stats(b, "b"), "i")
      .select(col("i"), col("n_a"),
        r6(d(col("__s_a")) / d(col("n_a"))).as("mean_a"),
        r6(d(col("__ss_a")) / d(col("n_a"))
          - (d(col("__s_a")) / d(col("n_a")))
          * (d(col("__s_a")) / d(col("n_a")))).as("var_a"),
        col("n_b"),
        r6(d(col("__s_b")) / d(col("n_b"))).as("mean_b"),
        r6(d(col("__ss_b")) / d(col("n_b"))
          - (d(col("__s_b")) / d(col("n_b")))
          * (d(col("__s_b")) / d(col("n_b")))).as("var_b"),
        r6(d(col("__s_b")) / d(col("n_b"))
          - d(col("__s_a")) / d(col("n_a"))).as("mean_shift"))
  }

  /** One-row summary over [[perDim]]'s output: `(dims, mean_cosine,
    * shift_l2)` — cosine between the two 6-dp mean vectors and the L2
    * norm of the shift, every cross-dim term on the 1e-9 grid. */
  def summary(perDimStats: DataFrame): DataFrame = {
    def g(c: Column): Column =
      floor(c * lit(1e9) + lit(0.5)).cast("bigint")
    def d(c: Column) = c.cast("double")
    // 6-dp means: products have ≤ 12 dp — 1e9-grid rounding of the
    // product is one floor both engines repeat identically
    perDimStats
      .select(col("i"),
        g(col("mean_a") * col("mean_b")).as("__ab"),
        g(col("mean_a") * col("mean_a")).as("__aa"),
        g(col("mean_b") * col("mean_b")).as("__bb"),
        g(col("mean_shift") * col("mean_shift")).as("__dd"))
      .agg(count(lit(1)).as("dims"),
        sum(col("__ab")).as("__sab"), sum(col("__aa")).as("__saa"),
        sum(col("__bb")).as("__sbb"), sum(col("__dd")).as("__sdd"))
      .select(col("dims"),
        r6(when(col("__saa") === 0L || col("__sbb") === 0L, lit(0.0))
          .otherwise(d(col("__sab"))
            / (sqrt(d(col("__saa"))) * sqrt(d(col("__sbb"))))))
          .as("mean_cosine"),
        r6(sqrt(d(col("__sdd")) / lit(1e9))).as("shift_l2"))
  }

  /** DuckDB twin of [[perDim]]: each snapshot SQL must select `v`
    * (the embedding list). */
  def sqlPerDim(aSql: String, bSql: String): String = {
    def stats(src: String, sfx: String) = s"""
      SELECT CAST(s.i AS BIGINT) AS i,
        CAST(count(*) AS BIGINT) AS n_$sfx,
        sum(q) AS s_$sfx, sum(q * q) AS ss_$sfx
      FROM (
        SELECT CAST(floor(CAST(unnest(v) AS DOUBLE) * 1000000.0e0
            + 0.5e0) / 1000000.0e0 AS DECIMAL(18,6)) AS q,
          CAST(unnest(generate_series(0, len(v) - 1)) AS BIGINT) AS i
        FROM ($src) WHERE v IS NOT NULL) s
      GROUP BY s.i"""
    s"""
    WITH sa AS (${stats(aSql, "a")}), sb AS (${stats(bSql, "b")})
    SELECT sa.i, n_a,
      floor(CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) * 1e6 + 0.5e0)
        / 1e6 AS mean_a,
      floor((CAST(ss_a AS DOUBLE) / CAST(n_a AS DOUBLE)
        - (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))
        * (CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE))) * 1e6 + 0.5e0)
        / 1e6 AS var_a,
      n_b,
      floor(CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) * 1e6 + 0.5e0)
        / 1e6 AS mean_b,
      floor((CAST(ss_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        - (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))
        * (CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE))) * 1e6 + 0.5e0)
        / 1e6 AS var_b,
      floor((CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)
        - CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)) * 1e6 + 0.5e0)
        / 1e6 AS mean_shift
    FROM sa JOIN sb ON sa.i = sb.i"""
  }

  /** DuckDB twin of [[perDim]] → [[summary]] composed. */
  def sqlSummary(aSql: String, bSql: String): String = s"""
    WITH pd AS (${sqlPerDim(aSql, bSql)}),
    gr AS (
      SELECT CAST(count(*) AS BIGINT) AS dims,
        sum(CAST(floor(mean_a * mean_b * 1e9 + 0.5e0) AS BIGINT)) AS sab,
        sum(CAST(floor(mean_a * mean_a * 1e9 + 0.5e0) AS BIGINT)) AS saa,
        sum(CAST(floor(mean_b * mean_b * 1e9 + 0.5e0) AS BIGINT)) AS sbb,
        sum(CAST(floor(mean_shift * mean_shift * 1e9 + 0.5e0) AS BIGINT))
          AS sdd
      FROM pd)
    SELECT dims,
      floor(CASE WHEN saa = 0 OR sbb = 0 THEN 0.0e0
        ELSE CAST(sab AS DOUBLE)
          / (sqrt(CAST(saa AS DOUBLE)) * sqrt(CAST(sbb AS DOUBLE)))
        END * 1e6 + 0.5e0) / 1e6 AS mean_cosine,
      floor(sqrt(CAST(sdd AS DOUBLE) / 1e9) * 1e6 + 0.5e0) / 1e6
        AS shift_l2
    FROM gr"""
}
