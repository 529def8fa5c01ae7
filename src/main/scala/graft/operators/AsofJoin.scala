package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the most recent right row
  * with `right.ts <= left.ts` (backward direction, inclusive) per join
  * key — the time-series point-in-time lookup Spark has no built-in
  * operator for (pandas `merge_asof`, DuckDB `ASOF JOIN`).
  *
  * Execution shape (the 100 TB argument): both sides are tagged and
  * unioned, then a single window pass per key carries the latest right
  * payload forward — ONE shuffle on the join key and one sort within
  * partitions, identical to what a sort-merge join would pay, with no
  * range cross-join and no per-key candidate explosion. Skewed keys
  * behave exactly like a skewed sort (AQE handles them); memory per
  * task is O(1) beyond the sort, because `last(_, ignoreNulls)` over a
  * running frame keeps only the current carried value.
  *
  * Semantics notes:
  *  - left rows with no prior right row keep a NULL payload (left-outer).
  *  - at equal timestamps the right row is visible to the left row
  *    (inclusive match), implemented by sorting right rows before left
  *    rows at ties.
  *  - if multiple right rows share (key, ts), the one carried is the
  *    last in the sort — callers wanting determinism should ensure
  *    uniqueness per (key, ts) or pass `rightTieBreak`.
  *  - `toleranceUs` (optional): matches older than the tolerance are
  *    nulled out, pandas-merge_asof-style.
  */
object AsofJoin {

  private val SideCol = "__asof_side"
  private val RightTsCol = "__asof_right_ts"
  private val PayloadCol = "__asof_payload"
  private val CarriedCol = "__asof_carried"

  /** @param left       probe side; all its columns are preserved
    * @param right      build side; its ts and non-key columns arrive
    *                   under their own names, suffixed `_right` when
    *                   the name collides with a left column
    * @param keys       equi-join key column names (same names both sides)
    * @param leftTs     event-time column of `left`
    * @param rightTs    event-time column of `right`
    * @param toleranceUs max allowed distance between the matched
    *                   timestamps in microseconds (`left − right`
    *                   backward, `right − left` forward); None = unbounded
    * @param rightTieBreak extra right-side sort columns breaking
    *                   (key, ts) ties deterministically (the
    *                   traversal-last row wins: largest tie value
    *                   backward, smallest forward)
    * @param direction  "backward" (default): most recent right row with
    *                   `right.ts <= left.ts`; "forward": nearest
    *                   following right row with `right.ts >= left.ts`
    *                   (DuckDB `ASOF ... ON l.ts <= r.ts`); "nearest":
    *                   the closer of the two by |Δts|, distance ties →
    *                   backward (pandas merge_asof semantics). Same
    *                   single-shuffle union plan in every mode —
    *                   backward/forward run one window traversal,
    *                   nearest runs BOTH over the one exchange (two
    *                   sorts, no second shuffle) and picks per row. */
  def asofJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               leftTs: String, rightTs: String,
               toleranceUs: Option[Long] = None,
               rightTieBreak: Seq[String] = Nil,
               direction: String = "backward"): DataFrame = {
    require(keys.nonEmpty, "asofJoin needs at least one equi-join key")
    require(Set("backward", "forward", "nearest").contains(direction),
      s"direction must be backward, forward, or nearest, got $direction")
    val backward = direction == "backward"
    val rightPayloadCols =
      right.columns.toSeq.filterNot(c => keys.contains(c) || c == rightTs)
    val payload = struct(
      (col(rightTs).as(RightTsCol) +:
        rightPayloadCols.map(col)) ++
        rightTieBreak.map(c => col(c).as(s"__tie_$c")): _*)

    val taggedRight = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).as("__asof_ts"),
        payload.as(PayloadCol),
        lit(0).as(SideCol)): _*)
    val rightPayloadType = taggedRight.schema(PayloadCol).dataType
    val taggedLeft = left.select(
      col("*"),
      col(leftTs).as("__asof_ts"),
      lit(null).cast(rightPayloadType).as(PayloadCol),
      lit(1).as(SideCol))
    // align left schema to (keys, ts, payload, side, leftCols...) so the
    // union by name works with the right side padded with null leftCols
    val leftOnlyCols = left.columns.toSeq
    val paddedRight = leftOnlyCols.filterNot(keys.contains)
      .foldLeft(taggedRight) { (df, c) =>
        df.withColumn(c, lit(null).cast(left.schema(c).dataType))
      }

    // right rows sort before left rows at equal ts (side 0 < 1) so an
    // equal-timestamp right row is visible to the left row; extra
    // right-side tie-break columns order duplicates within (key, ts).
    // Forward direction reverses the TIME traversal only — sides still
    // order right-before-left within a tie, keeping equal-ts inclusive.
    def carriedOver(bwd: Boolean): Column = {
      def ord(c: Column): Column = if (bwd) c.asc else c.desc
      val sortCols = ord(col("__asof_ts")) +: col(SideCol).asc +:
        rightTieBreak.map(c => ord(col(PayloadCol)(s"__tie_$c")))
      val w = Window.partitionBy(keys.map(col): _*)
        .orderBy(sortCols: _*)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      last(col(PayloadCol), ignoreNulls = true).over(w)
    }
    def dist(carried: Column, bwd: Boolean): Column =
      if (bwd) unix_micros(col("__asof_ts")) -
        unix_micros(carried(RightTsCol))
      else unix_micros(carried(RightTsCol)) -
        unix_micros(col("__asof_ts"))
    def withinTol(carried: Column, bwd: Boolean): Column =
      toleranceUs match {
        case Some(tol) => carried.isNotNull && dist(carried, bwd) <= tol
        case None => carried.isNotNull
      }
    val unioned = taggedLeft.unionByName(paddedRight)
    val out =
      if (direction != "nearest") {
        val carried = unioned
          .withColumn(CarriedCol, carriedOver(backward))
        val matched = toleranceUs match {
          case Some(tol) =>
            when(dist(col(CarriedCol), backward) <= tol, col(CarriedCol))
          case None => col(CarriedCol)
        }
        carried.filter(col(SideCol) === 1)
          .withColumn(CarriedCol, matched)
      } else {
        // nearest: both traversals over the SAME key exchange (two
        // window sorts, one shuffle), then pick the closer match per
        // row; equal distances go backward (pandas semantics)
        val two = unioned
          .withColumn("__asof_b", carriedOver(true))
          .withColumn("__asof_f", carriedOver(false))
        val bOk = withinTol(col("__asof_b"), bwd = true)
        val fOk = withinTol(col("__asof_f"), bwd = false)
        val pick = when(bOk && (!fOk ||
            dist(col("__asof_b"), bwd = true) <=
              dist(col("__asof_f"), bwd = false)), col("__asof_b"))
          .when(fOk, col("__asof_f"))
          .otherwise(lit(null).cast(rightPayloadType))
        two.filter(col(SideCol) === 1)
          .withColumn(CarriedCol, pick)
          .drop("__asof_b", "__asof_f")
      }
    // pandas-merge_asof-style disambiguation: a carried right column
    // whose name collides with a left column (e.g. both sides call
    // their event time "ts") comes back suffixed — a duplicate name
    // would make every downstream reference AMBIGUOUS_REFERENCE. If
    // the suffixed name collides too, fail loudly (pandas raises on
    // post-suffix overlap for the same reason).
    def outName(c: String): String =
      if (leftOnlyCols.contains(c)) {
        val suffixed = c + "_right"
        require(!leftOnlyCols.contains(suffixed),
          s"asofJoin cannot disambiguate right column '$c': left already " +
            s"has both '$c' and '$suffixed' — rename one of them")
        suffixed
      } else c
    val rightOut = col(CarriedCol)(RightTsCol).as(outName(rightTs)) +:
      rightPayloadCols.map(c => col(CarriedCol)(c).as(outName(c)))
    out.select(leftOnlyCols.map(col) ++ rightOut: _*)
  }
}
