package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MULTIVARIATE OUTLIER DETECTION — Mahalanobis distance under the
  * exact-moment covariance: the cleaning diagnostic the per-column
  * fences ([[graft.impute.Robust]]) cannot produce. A row whose every
  * coordinate is individually plausible can still be JOINTLY
  * impossible (list price at the cap AND discount at the cap AND
  * quantity at the cap); the squared Mahalanobis distance
  *
  *   d²(x) = (x − μ)ᵀ Σ⁻¹ (x − μ)
  *
  * scores exactly that joint surprise, in units calibrated by the
  * χ²_p tail when the bulk is elliptical. This is the multivariate
  * front door to the impute/clean family: rank by d², audit or
  * re-impute the top of the list.
  *
  * Fixed at p = 3 columns so the precision matrix is the CLOSED-FORM
  * adjugate/determinant inverse — every entry one fixed IEEE sequence
  * from exact decimal moments, identically written in the Column and
  * SQL forms, so the whole scorer (moments → covariance → inverse →
  * per-row d²) sits under the bit-exact oracle with no driver-side
  * linear algebra to drift. (For general p the same shape holds with
  * a driver-side solve; p = 3 keeps both engines on one formula.)
  *
  * Scale shape (100 TB): pass 1 is ONE hash aggregate producing a
  * single 10-field moment row (n, 3 sums, 6 cross-sums — partial-agg,
  * map-side combined); pass 2 broadcasts that row and scores each
  * record scan-side, then global top-k via sort+limit
  * (TakeOrderedAndProject — per-partition heaps, no global sort). No
  * shuffle beyond the 1-row aggregate and the k-row gather.
  *
  * Determinism: inputs must sit on an exact grid (DECIMAL/integer) so
  * the moments are exact; d² is floor-portable-rounded to 6 dp BEFORE
  * the threshold compare and the rank, so both engines cut and order
  * the same rows (ties broken by the id columns). */
object Outliers {

  /** Top-`k` rows of `df` by squared Mahalanobis distance over exactly
    * three grid-valued columns. Output: `(idCols…, md2 (6 dp), flagged
    * = md2 > chi2Crit, rank)` ordered by (md2 desc, idCols).
    * `chi2Crit` defaults to the χ²₃ 0.999 tail. */
  def mahalanobis3(df: DataFrame, cols: Seq[String], idCols: Seq[String],
                   k: Int = 100, chi2Crit: Double = 16.266236):
      DataFrame = {
    require(cols.length == 3, s"exactly 3 columns required: $cols")
    require(idCols.nonEmpty && k >= 1)
    val Seq(x1, x2, x3) = cols.map(col)
    val pairs = Seq((1, x1), (2, x2), (3, x3))
    val moments = df.agg(
      count(lit(1)).as("__n"),
      (pairs.map { case (i, x) => sum(x).as(s"__s$i") } ++
        (for ((i, xi) <- pairs; (j, xj) <- pairs if i <= j)
          yield sum(xi * xj).as(s"__q$i$j"))): _*)
    def d(c: String) = col(c).cast("double")
    val n = d("__n")
    def mean(i: Int) = d(s"__s$i") / n
    def cov(i: Int, j: Int) =
      (d(s"__q$i$j") - d(s"__s$i") * d(s"__s$j") / n) / (n - lit(1.0))
    val (c11, c12, c13) = (cov(1, 1), cov(1, 2), cov(1, 3))
    val (c22, c23, c33) = (cov(2, 2), cov(2, 3), cov(3, 3))
    val det = c11 * (c22 * c33 - c23 * c23) -
      c12 * (c12 * c33 - c23 * c13) +
      c13 * (c12 * c23 - c22 * c13)
    val a11 = (c22 * c33 - c23 * c23) / det
    val a12 = (c13 * c23 - c12 * c33) / det
    val a13 = (c12 * c23 - c13 * c22) / det
    val a22 = (c11 * c33 - c13 * c13) / det
    val a23 = (c12 * c13 - c11 * c23) / det
    val a33 = (c11 * c22 - c12 * c12) / det
    val e1 = x1.cast("double") - mean(1)
    val e2 = x2.cast("double") - mean(2)
    val e3 = x3.cast("double") - mean(3)
    val d2 = a11 * e1 * e1 + a22 * e2 * e2 + a33 * e3 * e3 +
      lit(2.0) * (a12 * e1 * e2 + a13 * e1 * e3 + a23 * e2 * e3)
    val md2 = floor(d2 * lit(1e6) + lit(0.5)) / lit(1e6)
    val ranked = df.crossJoin(broadcast(moments))
      .select((idCols.map(col) :+ md2.as("md2")): _*)
      .orderBy((col("md2").desc +: idCols.map(col)): _*)
      .limit(k)
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy((col("md2").desc +: idCols.map(col)): _*)
    ranked
      .withColumn("flagged", (col("md2") > lit(chi2Crit)).cast("bigint"))
      .withColumn("rank", row_number().over(w).cast("bigint"))
  }

  /** DuckDB twin of [[mahalanobis3]]: `rowsSql` must select
    * `(id1 …, x1, x2, x3)` with the x's on an exact grid; `idOut`
    * names the id columns in `rowsSql`'s output. */
  def sqlMahalanobis3(rowsSql: String, idOut: Seq[String], k: Int = 100,
                      chi2Crit: Double = 16.266236): String = {
    import graft.functions.Noise.sqlDouble
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val n = d("n")
    def mean(i: Int) = s"(${d(s"s$i")} / $n)"
    def cov(i: Int, j: Int) =
      s"((${d(s"q$i$j")} - ${d(s"s$i")} * ${d(s"s$j")} / $n) / ($n - 1.0e0))"
    val (c11, c12, c13) = (cov(1, 1), cov(1, 2), cov(1, 3))
    val (c22, c23, c33) = (cov(2, 2), cov(2, 3), cov(3, 3))
    val det = s"""($c11 * ($c22 * $c33 - $c23 * $c23)
      - $c12 * ($c12 * $c33 - $c23 * $c13)
      + $c13 * ($c12 * $c23 - $c22 * $c13))"""
    val a11 = s"(($c22 * $c33 - $c23 * $c23) / $det)"
    val a12 = s"(($c13 * $c23 - $c12 * $c33) / $det)"
    val a13 = s"(($c12 * $c23 - $c13 * $c22) / $det)"
    val a22 = s"(($c11 * $c33 - $c13 * $c13) / $det)"
    val a23 = s"(($c12 * $c13 - $c11 * $c23) / $det)"
    val a33 = s"(($c11 * $c22 - $c12 * $c12) / $det)"
    val e1 = s"(${d("x1")} - ${mean(1)})"
    val e2 = s"(${d("x2")} - ${mean(2)})"
    val e3 = s"(${d("x3")} - ${mean(3)})"
    val d2 = s"""($a11 * $e1 * $e1 + $a22 * $e2 * $e2 + $a33 * $e3 * $e3
      + 2.0e0 * ($a12 * $e1 * $e2 + $a13 * $e1 * $e3 + $a23 * $e2 * $e3))"""
    val ids = idOut.mkString(", ")
    s"""
    WITH r0 AS ($rowsSql), m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
        sum(x1) AS s1, sum(x2) AS s2, sum(x3) AS s3,
        sum(x1 * x1) AS q11, sum(x1 * x2) AS q12, sum(x1 * x3) AS q13,
        sum(x2 * x2) AS q22, sum(x2 * x3) AS q23, sum(x3 * x3) AS q33
      FROM r0
    ), scored AS (
      SELECT $ids, floor($d2 * 1e6 + 0.5e0) / 1e6 AS md2
      FROM r0, m
    ), ranked AS (
      SELECT $ids, md2,
        CAST(md2 > ${sqlDouble(chi2Crit)} AS BIGINT) AS flagged,
        CAST(row_number() OVER (ORDER BY md2 DESC, $ids) AS BIGINT) AS rank
      FROM scored)
    SELECT * FROM ranked WHERE rank <= $k"""
  }
}
