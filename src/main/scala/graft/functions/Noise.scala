package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable pseudo-noise.
  *
  * The reference fills missing cells with Uniform[0,1) noise before RBM
  * training (denoising trick) and the test data ships null-free
  * (FIXTURES.md §2), so both missingness injection and noise fill must
  * reproduce bit-identically in Spark and the driver's DuckDB oracle.
  * Engine RNGs (`rand(seed)`) stream differently per engine and per
  * partitioning, so we use the classic shader hash — pure double
  * arithmetic, identical on both sides:
  *
  *   hashNoise(key, salt) = fract(sin(key*12.9898 + salt*78.233) * 43758.5453)
  *
  * Being key-derived (not row-position-derived) it is also stable under
  * repartitioning — a requirement at 100 TB where partition layout is
  * not reproducible.
  */
object Noise {

  /** Uniform-ish value in [0,1), derived from a numeric key column. */
  def hashNoise(key: Column, salt: Int): Column = {
    val x = sin(key * lit(12.9898) + lit(salt.toDouble) * lit(78.233)) * lit(43758.5453)
    x - floor(x)
  }

  /** Engine-portable integer rank in [0, 1e9+7): pure BIGINT multiply/
    * add/mod — no libm calls — so Spark and DuckDB agree on EVERY rank
    * bit-exactly, not just away from a threshold. Use where the k-th
    * rank boundary is STRUCTURAL (top-k sampling cuts): [[hashNoise]]'s
    * sin() can differ between JVM Math.sin and a host libm by 1 ulp,
    * which a `< frac` threshold absorbs (boundary rows are measure-zero)
    * but a rank cut turns into a different k-th row on every run. The
    * middle round is SQUARED so consecutive keys don't map to an
    * arithmetic stride (a purely linear map would — any composition of
    * linear rounds stays linear mod p). */
  def intRank(key: Column, salt: Int): Column = {
    require(salt >= 0, "salt must be non-negative")
    val p = lit(1000000007L)
    val k0 = pmod(key.cast("long"), p)
    // multiplier = Knuth's 2654435761 (fits: k0 * 2654435761 < 2^62,
    // h1² < (1e9+7)² < 2^60 — no 64-bit overflow on either engine). A
    // SMALL multiplier here is a trap: for keys below √p / a the square
    // never wraps the modulus, so ranks stay monotone in the key and
    // "top-k by rank" degenerates to "first k keys".
    val h1 = pmod((k0 + lit(salt.toLong) + lit(1L)) * lit(2654435761L), p)
    pmod(h1 * h1 + k0, p)
  }

  /** DuckDB-compatible SQL for intRank(key, salt) — identical BIGINT
    * arithmetic term-for-term (DuckDB's % is sign-of-dividend like
    * Java's, so the double-mod makes k0 non-negative on both sides). */
  def sqlIntRank(keyExpr: String, salt: Int): String = {
    require(salt >= 0, "salt must be non-negative")
    val p = "1000000007"
    val k0 = s"(((CAST($keyExpr AS BIGINT) % $p) + $p) % $p)"
    val h1 = s"(((($k0 + $salt + 1) * 2654435761) % $p))"
    s"(($h1 * $h1 + $k0) % $p)"
  }

  /** True where the cell should be treated as missing (fraction `frac`). */
  def missingMask(key: Column, salt: Int, frac: Double): Column =
    hashNoise(key, salt) < lit(frac)

  /** Nulls out ~`frac` of `valueCol`, keyed on `keyCol` with `salt`. */
  def injectMissing(df: DataFrame, valueCol: String, keyCol: String,
                    salt: Int, frac: Double): DataFrame =
    df.withColumn(valueCol,
      when(missingMask(col(keyCol), salt, frac), lit(null))
        .otherwise(col(valueCol)))

  // ---- SQL string builders so oracle queries use the exact same math ----
  // Literals carry an `e0` exponent: DuckDB parses bare decimal literals
  // as DECIMAL and would evaluate the whole argument in exact decimal
  // arithmetic — up to 1 ulp away from Spark's double arithmetic, which
  // sin() then amplifies into visible drift. `12.9898e0` forces DOUBLE.

  /** Renders a Double as a DuckDB DOUBLE literal (plain decimal form +
    * e0 exponent so it can never be mistaken for DECIMAL). */
  def sqlDouble(v: Double): String = {
    require(!v.isNaN && !v.isInfinite, s"non-finite literal $v")
    java.math.BigDecimal.valueOf(v).toPlainString + "e0"
  }

  /** DuckDB-compatible SQL for hashNoise(key, salt). */
  def sqlNoise(keyExpr: String, salt: Int): String = {
    val x = s"sin($keyExpr * 12.9898e0 + ${salt}e0 * 78.233e0) * 43758.5453e0"
    s"(($x) - floor($x))"
  }

  /** DuckDB-compatible SQL for missingMask(key, salt, frac). */
  def sqlMissing(keyExpr: String, salt: Int, frac: Double): String =
    s"(${sqlNoise(keyExpr, salt)} < ${sqlDouble(frac)})"

  // ---- portable inverse normal CDF (Acklam's rational approximation,
  // the widely-published public-domain coefficients): pure +,−,×,÷,
  // sqrt, ln — the same transcendental budget the Laplace inverse CDF
  // already proved cross-engine-stable — so Gaussian noise can sit
  // under the bit-exact oracle like the Laplace mechanisms do. Max
  // relative error ~1.15e-9, far inside the 6-dp emission grid. ----

  private val AckA = Seq(-3.969683028665376e+01, 2.209460984245205e+02,
    -2.759285104469687e+02, 1.383577518672690e+02,
    -3.066479806614716e+01, 2.506628277459239e+00)
  private val AckB = Seq(-5.447609879822406e+01, 1.615858368580409e+02,
    -1.556989798598866e+02, 6.680131188771972e+01,
    -1.328068155288572e+01)
  private val AckC = Seq(-7.784894002430293e-03, -3.223964580411365e-01,
    -2.400758277161838e+00, -2.549732539343734e+00,
    4.374664141464968e+00, 2.938163982698783e+00)
  private val AckD = Seq(7.784695709041462e-03, 3.224671290700398e-01,
    2.445134137142996e+00, 3.754408661907416e+00)
  private val AckLow = 0.02425

  /** Φ⁻¹(u) for u ∈ (0,1): Acklam's piecewise rational approximation
    * as one fixed Column-arithmetic sequence (central region + the
    * two sqrt(−2 ln ·) tails). Callers must clamp u away from {0,1}. */
  def invNormal(u: Column): Column = {
    // Horner evaluation matching the canonical published form
    def num(cs: Seq[Double], x: Column): Column =
      cs.tail.foldLeft(lit(cs.head)) { (acc, cf) => acc * x + lit(cf) }
    val qc = u - lit(0.5)
    val rc = qc * qc
    val central = num(AckA, rc) * qc / (num(AckB, rc) * rc + lit(1.0))
    val ql = sqrt(lit(-2.0) * log(u))
    val lower = num(AckC, ql) / (num(AckD, ql) * ql + lit(1.0))
    val qh = sqrt(lit(-2.0) * log(lit(1.0) - u))
    val upper = -(num(AckC, qh) / (num(AckD, qh) * qh + lit(1.0)))
    when(u < lit(AckLow), lower)
      .when(u > lit(1.0 - AckLow), upper)
      .otherwise(central)
  }

  /** DuckDB twin of [[invNormal]] — identical piecewise rational
    * sequence, term for term. */
  def sqlInvNormal(uExpr: String): String = {
    def num(cs: Seq[Double], x: String): String =
      cs.tail.foldLeft(sqlDouble(cs.head)) { (acc, cf) =>
        s"($acc * $x + ${sqlDouble(cf)})" }
    val u = s"($uExpr)"
    val qc = s"($u - 0.5e0)"
    val rc = s"($qc * $qc)"
    val central = s"(${num(AckA, rc)} * $qc / (${num(AckB, rc)} * $rc + 1.0e0))"
    val ql = s"sqrt(-2.0e0 * ln($u))"
    val lower = s"(${num(AckC, ql)} / (${num(AckD, ql)} * $ql + 1.0e0))"
    val qh = s"sqrt(-2.0e0 * ln(1.0e0 - $u))"
    val upper = s"(-(${num(AckC, qh)} / (${num(AckD, qh)} * $qh + 1.0e0)))"
    s"""(CASE WHEN $u < ${sqlDouble(AckLow)} THEN $lower
      WHEN $u > ${sqlDouble(1.0 - AckLow)} THEN $upper
      ELSE $central END)"""
  }
}
