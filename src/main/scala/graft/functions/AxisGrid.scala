package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** VALUE-AXIS QUANTIZER — the shared `exact = false` move of the
  * value-axis statistics family (ECDF, Gini, Mann–Whitney): those
  * operators fold over the DISTINCT-value axis (groupBy value +
  * ordered running sums — the scale-safe alternative to corpus-sized
  * rank windows), which is bounded for grid data (money, counts) but
  * corpus-sized for a continuous double metric. Mapping each value to
  * one of `levels` per-group min–max grid representatives bounds the
  * axis ABSOLUTELY — at any corpus size the fold touches ≤ `levels`
  * rows per group — at the cost of a drift bounded by the largest
  * probability mass inside one grid cell (RobustModeSpec pins the
  * deltas on this data: ECDF sup-norm ≤ 1%, Gini ≤ 0.001, M–W z
  * ≤ 0.01).
  *
  * Deterministic AND oracle-able: min/max are order-insensitive exact
  * double aggregates, and the level arithmetic is one fixed IEEE
  * sequence (exactly mirrored in the SQL twins), so the quantized
  * forms stay under the bit-exact oracle — unlike a sketch-based
  * fence, nothing here depends on merge order.
  */
object AxisGrid {

  /** Grid representative of `v` on the `levels`-level [mn, mx] grid:
    * the LOWER EDGE of v's cell, `mn + floor((v−mn)/span·L)·span/L`,
    * rounded to the 6-dp grid (tidy, portable keys). v = mx lands in
    * the top cell (the floor is capped at L−1); degenerate groups
    * (span 0) collapse to mn; null v stays null. The mapping is
    * monotone, so quantized ranks never invert true ranks. */
  def rep(v: Column, mn: Column, mx: Column, levels: Int): Column = {
    require(levels >= 2, s"levels must be >= 2: $levels")
    val l = lit(levels.toDouble)
    val span = mx - mn
    val lvl = least(floor((v - mn) / span * l), l - lit(1.0))
    when(v.isNull, lit(null).cast("double"))
      .when(span === 0, mn)
      .otherwise(round(mn + lvl * span / l, 6))
  }
}
