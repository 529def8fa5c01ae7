package graft.impute

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** QUANTILE DISCRETIZATION — equal-frequency binning of a numeric
  * column (the feature-prep twin of Robust's fences): compute the
  * per-group interior quantile fences, then assign each row the count
  * of fences strictly below its value. Standard prep for tree models,
  * calibration buckets, and stratified reporting; MLlib's
  * QuantileDiscretizer does this approximately — this one is exact and
  * oracle-portable.
  *
  * Determinism (SURVEY §5.3): fences are exact interpolated (type-7)
  * quantiles — identical in Spark (`percentile`) and DuckDB
  * (`quantile_cont`) — rounded to the 4-dp grid; the bin is then a sum
  * of integer indicators `value > fence_i` over identical doubles, so
  * every bin id is bit-portable.
  *
  * Scale shape: one grouped sort-based percentile aggregate (the only
  * pass over the big table; the stats frame is #groups-sized),
  * broadcast back, then a codegen'd projection of nBins−1 comparisons —
  * the same stats-attach shape as Robust/MeanImpute, no second shuffle
  * of the corpus. Rows with NULL value get a NULL bin (SQL comparison
  * semantics), matching the oracle.
  */
object Discretize {

  /** Append `<valueCol>_bin` ∈ {0..nBins−1}: equal-frequency bin of
    * `valueCol` within its `groupCols` population. */
  def quantileBins(df: DataFrame, valueCol: String, groupCols: Seq[String],
                   nBins: Int, exact: Boolean = true): DataFrame = {
    require(nBins >= 2, "need at least 2 bins")
    val ps = interiorPs(nBins)
    // exact = false: approx_percentile's GK sketch (O(accuracy) state,
    // mergeable) replaces the per-group value buffer — the 100-TB mode;
    // see Robust's scale-hazard note. Fence deltas pinned by
    // RobustModeSpec.
    val fences = ps.zipWithIndex.map { case (p, i) =>
      val q = if (exact) expr(s"percentile($valueCol, $p)")
        else expr(s"approx_percentile($valueCol, $p, ${Robust.ApproxAccuracy})")
      round(q.cast("double"), 4).as(s"__f$i")
    }
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(fences.head, fences.tail: _*)
    // boolean→int cast (NOT when/otherwise): a NULL value must yield a
    // NULL bin, matching the oracle's CAST(v > f AS INT) + … null
    // propagation — when().otherwise(0) would silently bin NULLs at 0
    val bin = ps.indices
      .map(i => (col(valueCol).cast("double") > col(s"__f$i")).cast("int"))
      .reduce(_ + _)
    df.join(broadcast(stats), groupCols)
      .withColumn(s"${valueCol}_bin", bin)
      .drop(ps.indices.map(i => s"__f$i"): _*)
  }

  /** DuckDB twin: same fences via `quantile_cont`, same indicator sum.
    * Emits `WITH __dstats AS (...) SELECT <outCols>, <bin> AS
    * <valueCol>_bin FROM <table> JOIN __dstats USING (<groupCols>)`. */
  def sqlQuantileBins(table: String, valueCol: String,
                      groupCols: Seq[String], nBins: Int,
                      outCols: Seq[String]): String = {
    val ps = interiorPs(nBins)
    val g = groupCols.mkString(", ")
    val fenceSql = ps.zipWithIndex.map { case (p, i) =>
      s"round(quantile_cont($valueCol, " +
        s"${graft.functions.Noise.sqlDouble(p)}), 4) AS __f$i"
    }.mkString(", ")
    val bin = ps.indices
      .map(i => s"CAST($valueCol > __f$i AS INT)").mkString(" + ")
    s"""WITH __dstats AS (
          SELECT $g, $fenceSql FROM $table GROUP BY $g)
        SELECT ${outCols.mkString(", ")}, $bin AS ${valueCol}_bin
        FROM $table JOIN __dstats USING ($g)"""
  }

  /** Interior cut points i/nBins, written as exact decimal strings so
    * Spark and DuckDB parse the identical double. */
  private def interiorPs(nBins: Int): Seq[Double] =
    (1 until nBins).map(i => i.toDouble / nBins)
}
