package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** RECORD LINKAGE — blocked fuzzy matching between a clean entity
  * table and a dirty/foreign one, the classic data-cleaning join that
  * plain equi-joins can't express ("Customer#000000042" vs
  * "Customer#00000p042") and a naive theta-join turns into an
  * all-pairs cartesian.
  *
  * Blocking scheme: the SYMSPELL DELETION NEIGHBORHOOD. Each name
  * emits its radius-1 deletion variants (the string itself plus every
  * single-character deletion — O(len) keys per record); two strings
  * within Levenshtein distance 1 ALWAYS share at least one variant
  * (substitution at p → both sides delete p; insertion/deletion → the
  * shorter string IS a deletion variant of the longer), so recall is
  * exact, not heuristic. Candidate generation is then one EQUI-join on
  * the variant key — block sizes stay tiny (a key pools only strings
  * one edit apart at that position), and the plan never contains a
  * CartesianProduct or BroadcastNestedLoopJoin (spec-asserted). A
  * length-band prefilter and a final `levenshtein ≤ maxDist` verify
  * kill the false candidates.
  *
  * Scale shape: explode ×(len+1) on both sides (narrow), one shuffle
  * on the variant key, one distinct on the id pair. At 100 TB the key
  * explosion is the standard price of the technique (SymSpell, spell-
  * correction services); radius t > 1 multiplies keys by C(len, t) —
  * this implementation fixes t = 1, the overwhelmingly common typo
  * radius, and documents the combinatorial cliff rather than hiding
  * it. */
object RecordLinkage {

  /** Radius-1 deletion-neighborhood keys of `name` in `df`: one row
    * per variant — `__i = 0` keeps the original, `__i = p` deletes
    * 1-indexed position p. */
  private def withDeletionKeys(df: DataFrame, nameCol: String): DataFrame = {
    val name = col(nameCol)
    df.withColumn("__i", explode(sequence(lit(0), length(name))))
      .withColumn("__key", when(col("__i") === 0, name)
        .otherwise(concat(
          name.substr(lit(1), col("__i") - 1),
          name.substr(col("__i") + 1, length(name)))))
  }

  /** All (left, right) pairs with `levenshtein(leftName, rightName) ≤
    * maxDist` (= 1: the deletion-neighborhood recall guarantee is
    * radius-1). Output: `leftId, rightId, leftName as left_name,
    * rightName as right_name, dist`. */
  def fuzzyJoin(left: DataFrame, right: DataFrame,
                leftId: String, rightId: String,
                leftName: String, rightName: String,
                maxDist: Int = 1): DataFrame = {
    require(maxDist == 1,
      s"deletion-neighborhood blocking is exact for radius 1 only: $maxDist")
    val lk = withDeletionKeys(
      left.select(col(leftId), col(leftName)), leftName)
      .select(col(leftId), col(leftName).as("left_name"), col("__key"))
    val rk = withDeletionKeys(
      right.select(col(rightId), col(rightName)), rightName)
      .select(col(rightId), col(rightName).as("right_name"), col("__key"))
    lk.join(rk, "__key")
      .select(col(leftId), col(rightId),
        col("left_name"), col("right_name"))
      .distinct()
      .filter(abs(length(col("left_name")) - length(col("right_name")))
        <= maxDist)
      .withColumn("dist",
        levenshtein(col("left_name"), col("right_name")).cast("bigint"))
      .filter(col("dist") <= maxDist)
  }

  /** DuckDB twin of [[fuzzyJoin]]: `leftSql`/`rightSql` must select
    * `(id, name)`; output column names match the Spark side. */
  def sqlFuzzyJoin(leftSql: String, rightSql: String,
                   leftId: String, rightId: String,
                   maxDist: Int = 1): String = {
    require(maxDist == 1)
    def keyed(src: String, idOut: String, nameOut: String) =
      s"""SELECT $idOut, $nameOut, CASE WHEN i = 0 THEN $nameOut
            ELSE substr($nameOut, 1, i - 1) ||
                 substr($nameOut, i + 1, length($nameOut)) END AS key
          FROM (SELECT id AS $idOut, name AS $nameOut,
                  unnest(range(0, length(name) + 1)) AS i
                FROM ($src))"""
    s"""
    WITH lk AS (${keyed(leftSql, leftId, "left_name")}),
    rk AS (${keyed(rightSql, rightId, "right_name")}),
    cand AS (
      SELECT DISTINCT $leftId, $rightId, left_name, right_name
      FROM lk JOIN rk USING (key))
    SELECT $leftId, $rightId, left_name, right_name,
      CAST(levenshtein(left_name, right_name) AS BIGINT) AS dist
    FROM cand
    WHERE abs(length(left_name) - length(right_name)) <= $maxDist
      AND levenshtein(left_name, right_name) <= $maxDist"""
  }
}
