package graft.operators

import graft.functions.Noise
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the training-data mixing
  * primitive (upsample rare languages, downsample boilerplate sources).
  * Unlike `DataFrameStatFunctions.sampleBy` (seeded `rand`, whose
  * stream depends on partitioning and engine), the keep decision is
  * `hashNoise(key, salt) < fraction(stratum)`: a pure projection +
  * filter over the row's own key, so it is
  *
  *  - reproducible: same key ⇒ same decision on any cluster layout,
  *    any engine — the property that makes a 100 TB sample re-runnable
  *    incrementally (appending new data never re-rolls old rows);
  *  - nested: the salt-`s` sample at 10% is a superset of the
  *    salt-`s` sample at 5% (threshold on the same noise), so sweeps
  *    over sampling rates reuse work;
  *  - oracle-able: the noise formula is engine-portable arithmetic
  *    (see graft.functions.Noise), so DuckDB can verify the exact
  *    sampled row set.
  *
  * No shuffle, no state: scales with the scan.
  */
object Sampling {

  /** Keep each row with probability `fractions(stratum)` (or
    * `defaultFraction` for unlisted strata), decided by keyed noise.
    * @param keyCol numeric row key driving the decision */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
                 fractions: Map[String, Double],
                 defaultFraction: Double = 0.0,
                 salt: Int = 7): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f =>
      f >= 0.0 && f <= 1.0), "fractions must be in [0, 1]")
    // one FLAT CaseWhen, not a fold of nested when/otherwise — a
    // per-source fractions map can carry thousands of strata, and a
    // thousands-deep expression tree hits Catalyst's deep-tree
    // analysis/codegen pathologies
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val frac: Column =
      if (fractions.isEmpty) lit(defaultFraction)
      else column(org.apache.spark.sql.catalyst.expressions.CaseWhen(
        fractions.toSeq.map { case (k, f) =>
          expression(col(strataCol) === k) -> expression(lit(f))
        },
        Some(expression(lit(defaultFraction)))))
    df.filter(Noise.hashNoise(col(keyCol), salt) < frac)
  }

  /** DuckDB twin of [[stratified]]'s predicate, for oracle SQL.
    * Stratum keys are SQL-escaped; an empty map degenerates to the
    * bare default literal (CASE with zero WHENs is invalid SQL). */
  def sqlPredicate(keyExpr: String, strataExpr: String,
                   fractions: Map[String, Double],
                   defaultFraction: Double = 0.0, salt: Int = 7): String = {
    val fracSql =
      if (fractions.isEmpty) Noise.sqlDouble(defaultFraction)
      else {
        val cases = fractions.toSeq.sortBy(_._1).map { case (k, f) =>
          s"WHEN $strataExpr = '${k.replace("'", "''")}' THEN ${Noise.sqlDouble(f)}"
        }.mkString(" ")
        s"(CASE $cases ELSE ${Noise.sqlDouble(defaultFraction)} END)"
      }
    s"(${Noise.sqlNoise(keyExpr, salt)} < $fracSql)"
  }
}
