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
}
