package graft.impute

import graft.functions.Noise
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic end-to-end imputation slice (SURVEY.md §7 M1): the full
  * reference `clean()` dataflow shape — mask (A3), min-max fit (A4),
  * scale (A5), fill, merge (A12), inverse-scale (A13), restore schema
  * (A15) — with the model stage replaced by the mean of known values.
  * Being projection + one global aggregate, the whole pipeline is
  * oracle-able in DuckDB and runs as one codegen stage over a broadcast
  * one-row stats frame: no collect, no shuffle beyond the agg, scales
  * linearly with input at any SF.
  *
  * Determinism: the mean is computed as `cast(sum(decimal(30,2)) as
  * double) / count` — exact integer-scaled arithmetic, bit-identical
  * across engines and partition orders (values sit on a 2-decimal grid,
  * FIXTURES.md).
  */
object MeanImpute {

  /** Injects `frac` missingness into `valueCol` (keyed hash-noise, so the
    * oracle reproduces the mask exactly) then mean-imputes it through the
    * scale/unscale round trip. Known cells pass through untouched —
    * the reference's core invariant (SURVEY §5.1-ii). */
  def imputeNumeric(df: DataFrame, valueCol: String, keyCol: String,
                    salt: Int = 1, frac: Double = 0.10): DataFrame = {
    // keyCol may be any SQL expression (e.g. a composite row key)
    val masked = df
      .withColumn("__miss", Noise.missingMask(expr(keyCol), salt, frac))
      .withColumn(valueCol,
        when(col("__miss"), lit(null)).otherwise(col(valueCol)))
    val stats = masked.agg(
      min(col(valueCol)).as("__mn"),
      max(col(valueCol)).as("__mx"),
      (sum(col(valueCol).cast("decimal(30,2)")).cast("double") /
        count(col(valueCol))).as("__mean"))
    val mn = col("__mn"); val mx = col("__mx")
    val scaledMean = Scaling.scale(col("__mean"), mn, mx)
    val filled = Scaling.unscale(scaledMean, mn, mx)
    masked.crossJoin(broadcast(stats))
      .withColumn(valueCol, when(col("__miss"), filled).otherwise(col(valueCol)))
      .drop("__miss", "__mn", "__mx", "__mean")
  }

  /** Deterministic categorical imputation: fill missing cells with the
    * global mode (most frequent value; ties break to the lexicographic
    * smallest). One groupBy + a one-row broadcast — the categorical
    * twin of the mean slice, linear at any SF. */
  def imputeMode(df: DataFrame, valueCol: String, keyCol: String,
                 salt: Int, frac: Double = 0.10): DataFrame = {
    val masked = df
      .withColumn("__miss", Noise.missingMask(expr(keyCol), salt, frac))
      .withColumn(valueCol,
        when(col("__miss"), lit(null)).otherwise(col(valueCol)))
    val mode = masked.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).as("__val")).count()
      .orderBy(col("count").desc, col("__val").asc)
      .limit(1).select(col("__val").as("__mode"))
    masked.crossJoin(broadcast(mode))
      .withColumn(valueCol,
        when(col("__miss"), col("__mode")).otherwise(col(valueCol)))
      .drop("__miss", "__mode")
  }

  /** DuckDB oracle for [[imputeMode]]. */
  def modeOracleSql(tbl: String, allCols: Seq[String], valueCol: String,
                    keyExpr: String, salt: Int, frac: Double = 0.10): String = {
    val miss = Noise.sqlMissing(keyExpr, salt, frac)
    val maskedCols = allCols.map {
      case `valueCol` => s"CASE WHEN $miss THEN NULL ELSE $valueCol END AS $valueCol"
      case c => c
    }.mkString(", ")
    val outCols = allCols.map {
      case `valueCol` => s"CASE WHEN __miss THEN __mode ELSE $valueCol END AS $valueCol"
      case c => c
    }.mkString(", ")
    s"""WITH masked AS (
       |  SELECT $maskedCols, $miss AS __miss FROM $tbl
       |), m AS (
       |  SELECT $valueCol AS __mode FROM masked WHERE $valueCol IS NOT NULL
       |  GROUP BY $valueCol ORDER BY count(*) DESC, $valueCol ASC LIMIT 1
       |)
       |SELECT $outCols FROM masked, m""".stripMargin
  }

  /** DuckDB oracle for [[imputeNumeric]] over table `tbl`: same math,
    * same expression shape, same output columns. */
  def oracleSql(tbl: String, allCols: Seq[String], valueCol: String,
                keyCol: String, salt: Int = 1, frac: Double = 0.10): String = {
    val miss = Noise.sqlMissing(keyCol, salt, frac)
    val maskedCols = allCols.map {
      case `valueCol` => s"CASE WHEN $miss THEN NULL ELSE $valueCol END AS $valueCol"
      case c => c
    }.mkString(", ")
    val scaledMean = "CASE WHEN __mx = __mn THEN 0.0 ELSE (__mean - __mn)/(__mx - __mn) END"
    val outCols = allCols.map {
      case `valueCol` =>
        s"CASE WHEN __miss THEN ($scaledMean) * (__mx - __mn) + __mn ELSE $valueCol END AS $valueCol"
      case c => c
    }.mkString(", ")
    s"""WITH masked AS (
       |  SELECT $maskedCols, $miss AS __miss FROM $tbl
       |), s AS (
       |  SELECT min($valueCol) AS __mn, max($valueCol) AS __mx,
       |         CAST(sum(CAST($valueCol AS DECIMAL(30,2))) AS DOUBLE) / count($valueCol) AS __mean
       |  FROM masked
       |)
       |SELECT $outCols FROM masked, s""".stripMargin
  }
}
