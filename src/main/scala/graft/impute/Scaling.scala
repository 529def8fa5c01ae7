package graft.impute

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Min-max scaling to [0,1] and its inverse — reference pipeline stages
  * A4/A5/A13 (SURVEY.md §2). Expressed as a single null-skipping
  * aggregate plus broadcast-joined projections so Catalyst keeps the
  * whole path in one codegen stage: no collect(), no driver round-trip,
  * and the stats frame (one row) broadcasts for free at any data scale.
  */
object Scaling {

  /** (x − min) / (max − min); constant columns map to 0 (reference A5). */
  def scale(x: Column, mn: Column, mx: Column): Column =
    when(mx === mn, lit(0.0)).otherwise((x - mn) / (mx - mn))

  /** x·(max − min) + min — inverse of [[scale]] (reference A13). */
  def unscale(x: Column, mn: Column, mx: Column): Column =
    x * (mx - mn) + mn
}
