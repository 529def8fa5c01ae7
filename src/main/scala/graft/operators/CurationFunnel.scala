package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CURATION FUNNEL REPORT — the accounting layer every multi-gate
  * cleaning pipeline owes its operators: given the ordered gates a
  * corpus passes through (length floor → quality score → lang filter →
  * dedup…), report per gate how many rows reached it, how many it
  * dropped, and how many survived — the "where did my 40% go" question
  * answered in one scan instead of N filtered counts.
  *
  * Semantics: gates apply SEQUENTIALLY — a row is charged to the FIRST
  * gate it fails (later gates never see it), which is exactly how the
  * composed `.filter` chain behaves. A null predicate counts as a
  * failure (SQL three-valued logic would silently drop the row from
  * both sides of the report otherwise).
  *
  * Determinism & scale: one projection computes the first-failing
  * gate index per row (a literal CASE ladder), one hash agg builds the
  * gate histogram (map-side partials, ≤ nGates+1 rows after the
  * shuffle), and the survivor arithmetic is a running sum over the
  * BOUNDED gate axis. Exact integers everywhere → bit-exact oracle.
  * Output one row per gate, in order: `stage_idx, stage, n_in,
  * n_dropped, n_out, drop_rate (6dp)`.
  */
object CurationFunnel {

  def report(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "need at least one gate")
    // first-failing gate: nulls fail (coalesce(p, false))
    val firstFail = stages.zipWithIndex.foldRight(
      lit(stages.size.toLong)) { case (((_, p), i), rest) =>
        when(!coalesce(p, lit(false)), lit(i.toLong)).otherwise(rest)
    }
    // NOTE: hist is referenced twice below (joined to the spine AND
    // folded into the total), so the input subtree executes more than
    // once in the final plan. Deliberately NOT cut here: for cheap
    // inputs (c7_curation_funnel's one-scan gates) an eager
    // materialization costs more than the recompute (measured 0.65 →
    // 2.66 s), and expensive callers can — and do — localCheckpoint
    // their OWN flags frame before calling (c7_curation_v4_funnel).
    val hist = df.select(firstFail.as("__g"))
      .groupBy(col("__g")).agg(count(lit(1)).as("__n"))
    val total = hist.agg(sum(col("__n")).as("__total"))
    // dense gate spine: a gate that drops nothing still gets its row
    val spine = df.sparkSession.createDataFrame(
      stages.zipWithIndex.map { case ((name, _), i) =>
        (i.toLong, name) }).toDF("stage_idx", "stage")
    val wPrev = Window.orderBy(col("stage_idx"))
      .rowsBetween(Window.unboundedPreceding, -1)
    spine.join(hist, col("stage_idx") === col("__g"), "left_outer")
      .withColumn("n_dropped", coalesce(col("__n"), lit(0L)))
      .crossJoin(broadcast(total))
      .withColumn("n_in",
        col("__total") - coalesce(sum(col("n_dropped")).over(wPrev), lit(0L)))
      .withColumn("n_out", col("n_in") - col("n_dropped"))
      .withColumn("drop_rate",
        when(col("n_in") > 0, round(col("n_dropped").cast("double")
          / col("n_in").cast("double"), 6)).otherwise(lit(0.0)))
      .select("stage_idx", "stage", "n_in", "n_dropped", "n_out", "drop_rate")
  }

  /** DuckDB twin of [[report]]: `stages` as (name, SQL boolean expr)
    * over `table`'s columns — identical first-fail ladder, histogram
    * and running-sum survivor arithmetic. */
  def sqlReport(table: String, stages: Seq[(String, String)]): String = {
    val ladder = stages.zipWithIndex
      .map { case ((_, p), i) => s"WHEN NOT coalesce($p, false) THEN $i" }
      .mkString(" ")
    val spine = stages.zipWithIndex
      .map { case ((n, _), i) =>
        s"SELECT CAST($i AS BIGINT) AS stage_idx, '$n' AS stage" }
      .mkString(" UNION ALL ")
    s"""
    WITH g AS (
      SELECT (CASE $ladder ELSE ${stages.size} END) AS gate FROM $table
    ), hist AS (
      SELECT gate, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1
    ), t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM hist
    ), spine AS ($spine
    ), j AS (
      SELECT s.stage_idx, s.stage,
        CAST(coalesce(h.n, 0) AS BIGINT) AS n_dropped
      FROM spine s LEFT JOIN hist h ON h.gate = s.stage_idx
    ), r AS (
      SELECT stage_idx, stage, n_dropped,
        CAST(t.total - coalesce(sum(n_dropped) OVER (ORDER BY stage_idx
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS n_in
      FROM j CROSS JOIN t
    )
    SELECT stage_idx, stage, n_in, n_dropped,
      CAST(n_in - n_dropped AS BIGINT) AS n_out,
      CASE WHEN n_in > 0
        THEN round(CAST(n_dropped AS DOUBLE) / CAST(n_in AS DOUBLE), 6)
        ELSE 0.0e0 END AS drop_rate
    FROM r"""
  }
}
