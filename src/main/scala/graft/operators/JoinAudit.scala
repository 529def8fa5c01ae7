package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** JOIN-EXPLOSION AUDIT — predict an equi-join's output cardinality
  * and skew WITHOUT running the join: |A ⋈ B| = Σ_key cntA·cntB, so
  * two per-key count aggregates and a key-axis-sized join of the
  * count tables answer "is this join safe to run, and which keys
  * would own it". At 100 TB this is the difference between a planner
  * conversation and an OOM'd 10¹³-row shuffle discovered at 3am — the
  * join-shaped sibling of the key-skew profile (D61), which audits
  * one table where this audits the INTERACTION.
  *
  * Scale/determinism: each side collapses to its key axis with ONE
  * partial-agg'd groupBy (map-side combined — the scan never
  * shuffles raw rows, only (key, count) pairs); the count-table join
  * is key-axis-sized; totals are exact BIGINT sums; the top-k ranks
  * on (pairs DESC, keys) via sort+limit. share is one double division
  * off exact integers, 6 dp. Everything is plain aggregation → the
  * whole audit sits under the bit-exact oracle. */
object JoinAudit {

  /** Top-`k` keys by predicted pair contribution for `left ⋈ right`
    * on `keys`. Output: `(keys…, n_left, n_right, pairs, total_pairs,
    * share (6 dp), rank)` — `total_pairs` (the predicted join output
    * size over ALL keys) repeats on every row for context. */
  def joinCardinality(left: DataFrame, right: DataFrame,
                      keys: Seq[String], k: Int = 10): DataFrame = {
    require(keys.nonEmpty && k >= 1)
    val kc = keys.map(col)
    val lc = left.groupBy(kc: _*).agg(count(lit(1)).as("n_left"))
    val rc = right.groupBy(kc: _*).agg(count(lit(1)).as("n_right"))
    val perKey = lc.join(rc, keys)
      .withColumn("pairs", col("n_left") * col("n_right"))
    val total = perKey.agg(
      coalesce(sum(col("pairs")), lit(0L)).as("total_pairs"))
    import org.apache.spark.sql.expressions.Window
    val order = col("pairs").desc +: kc
    val w = Window.orderBy(order: _*)
    perKey
      .orderBy(order: _*).limit(k)
      .crossJoin(broadcast(total))
      .withColumn("share", round(col("pairs").cast("double") /
        col("total_pairs").cast("double"), 6))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .select((kc ++ Seq(col("n_left"), col("n_right"), col("pairs"),
        col("total_pairs"), col("share"), col("rank"))): _*)
  }

  /** DuckDB twin of [[joinCardinality]]: `leftSql` / `rightSql` must
    * each select the key columns (named as in `keys`). */
  def sqlJoinCardinality(leftSql: String, rightSql: String,
                         keys: Seq[String], k: Int = 10): String = {
    val ks = keys.mkString(", ")
    s"""
    WITH lc AS (
      SELECT $ks, CAST(count(*) AS BIGINT) AS n_left
      FROM ($leftSql) GROUP BY $ks
    ), rc AS (
      SELECT $ks, CAST(count(*) AS BIGINT) AS n_right
      FROM ($rightSql) GROUP BY $ks
    ), pk AS (
      SELECT $ks, n_left, n_right, n_left * n_right AS pairs
      FROM lc JOIN rc USING ($ks)
    ), tot AS (
      SELECT CAST(coalesce(sum(pairs), 0) AS BIGINT) AS total_pairs
      FROM pk
    ), ranked AS (
      SELECT $ks, n_left, n_right, pairs, total_pairs,
        round(CAST(pairs AS DOUBLE) / CAST(total_pairs AS DOUBLE), 6)
          AS share,
        CAST(row_number() OVER (ORDER BY pairs DESC, $ks) AS BIGINT)
          AS rank
      FROM pk, tot)
    SELECT * FROM ranked WHERE rank <= $k"""
  }
}
