package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** INCREMENTAL AGGREGATE MAINTENANCE — the materialized-view refresh
  * pattern: a 100 TB corpus's daily rollup must absorb today's shard
  * WITHOUT rescanning history. The trick is to persist the aggregate
  * as a MERGEABLE STATE (count, exact decimal sum, min, max per
  * group) instead of finished values: state ⊕ state is a plain
  * groupBy over the union, associative and commutative, so
  *
  *   state(history ∪ delta) = merge(state(history), state(delta))
  *
  * holds EXACTLY — not approximately — because every component is
  * order-insensitive (longs, decimals, min/max). Finished metrics
  * (avg) are derived at read time by [[finish]], one division on
  * exact operands. The identity is the oracle: the driver checks
  * merge-of-halves against a full recompute bit-for-bit.
  *
  * Scale shape: the delta scan is the only big-data pass; the merge
  * touches |groups| rows on both sides (one hash agg over their
  * union, partial map-side). Persist the state bucketed on the group
  * key (TableSink.writeBucketed) and the merge co-locates with zero
  * extra shuffle. Avg/stddev-style metrics must NEVER be stored
  * finished — a stored average of averages is the classic silent-skew
  * bug this operator exists to prevent.
  */
object IncrementalAgg {

  /** Mergeable aggregate state of `valueCol` per `groupCols`:
    * `(groupCols..., n, sum_v [decimal-exact], min_v, max_v)`. */
  def state(df: DataFrame, groupCols: Seq[String],
            valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(col(valueCol)).as("n"),
        sum(col(valueCol).cast("decimal(32,6)")).as("sum_v"),
        min(col(valueCol).cast("double")).as("min_v"),
        max(col(valueCol).cast("double")).as("max_v"))

  /** state ⊕ state — same schema in, same schema out; groups present
    * on either side survive. */
  def merge(a: DataFrame, b: DataFrame, groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).as("n"),
        sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v"))

  /** Finished view over a state: adds `avg_v` (exact sum ÷ count; null
    * for all-null groups) and casts the sum to double for consumers. */
  def finish(state: DataFrame): DataFrame =
    state
      .withColumn("avg_v",
        when(col("n") > 0,
          col("sum_v").cast("double") / col("n").cast("double")))
      .withColumn("sum_v", col("sum_v").cast("double"))

  // ---- retractable state + change-feed maintenance ----------------
  // The mergeable (n, sum, min, max) state absorbs APPENDS; a CDC
  // table also REMOVES rows, and min/max cannot be subtracted. The
  // retractable subset (count + exact decimal sum — every algebraic,
  // invertible component) supports both directions:
  //   state(v2) = state(v1) ⊖ state(removed rows) ⊕ state(added rows)
  // and the manifest change feed supplies exactly those row sets
  // (VersionedTable.changedFiles: copy-on-write carries untouched
  // files by reference), so a 100 TB rollup follows its table paying
  // only for the CHANGED files per refresh — never a history rescan.

  /** Retractable aggregate state: `(groupCols..., n, sum_v)` — the
    * invertible components only. Types pinned (bigint /
    * decimal(32,6)) so repeated maintenance keeps one schema. */
  def retractableState(df: DataFrame, groupCols: Seq[String],
                       valueCol: String): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).cast("bigint").as("n"),
        coalesce(sum(col(valueCol).cast("decimal(32,6)")),
          lit(0).cast("decimal(32,6)"))
          .cast("decimal(32,6)").as("sum_v"))

  /** state ⊖ minus ⊕ plus: one hash agg over the three states with
    * `minus` negated; groups whose count reaches zero DROP (matching
    * a recompute, where the group is simply absent). Exact — longs
    * and decimals negate losslessly. */
  def retract(state: DataFrame, minus: DataFrame, plus: DataFrame,
              groupCols: Seq[String]): DataFrame = {
    val neg = minus
      .withColumn("n", -col("n"))
      .withColumn("sum_v", (-col("sum_v")).cast("decimal(32,6)"))
    state.unionByName(neg).unionByName(plus)
      .groupBy(groupCols.map(col): _*)
      .agg(sum(col("n")).cast("bigint").as("n"),
        sum(col("sum_v")).cast("decimal(32,6)").as("sum_v"))
      .filter(col("n") > 0)
  }

  /** Maintain a retractable state across two committed versions of a
    * [[graft.sources.VersionedTable]] via the manifest change feed:
    * reads ONLY the files that changed between `vOld` and `vNew`
    * (removed files retract, added files accumulate). `oldState` must
    * be `retractableState(readAsOf(vOld))` (or a prior maintenance of
    * it). Result ≡ recomputing the state over the full `vNew` — cost
    * ∝ the change. */
  def maintainOverVersions(spark: org.apache.spark.sql.SparkSession,
                           dir: String, vOld: Long, vNew: Long,
                           oldState: DataFrame, groupCols: Seq[String],
                           valueCol: String): DataFrame = {
    import graft.sources.VersionedTable
    val (added, removed) = VersionedTable.changedFiles(spark, dir,
      vOld, vNew)
    retract(oldState,
      retractableState(
        VersionedTable.readFileSubset(spark, dir, vOld, removed),
        groupCols, valueCol),
      retractableState(
        VersionedTable.readFileSubset(spark, dir, vNew, added),
        groupCols, valueCol),
      groupCols)
  }

  // ---- mergeable DISTINCT counts ----------------------------------
  // COUNT(DISTINCT key) is the one common rollup metric the exact
  // state above cannot carry: distinctness is not decomposable into a
  // scalar. The mergeable form is the Datasketches HLL sketch (binary
  // register state; update and union are both register-wise max, so
  // they are order- and partitioning-insensitive):
  //   sketch(history ∪ delta) = union(sketch(history), sketch(delta))
  // The estimate is approximate (~1.6% rel. std. error at lgK=12), so
  // this family is rows+spec, not oracle — IncrementalAggSpec pins
  // merge ≡ recompute on the ESTIMATE and a ≤5% error floor vs exact.
  // At 100 TB this replaces the two-phase exact distinct (a full
  // re-shuffle of history per refresh) with |groups| × ~kB of state.

  /** Mergeable distinct-count state: `(groupCols..., nd_sketch)`.
    * `lgK` trades state size (2^lgK bytes-ish) for error. */
  def distinctState(df: DataFrame, groupCols: Seq[String],
                    keyCol: String, lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_agg(col(keyCol), lit(lgK)).as("nd_sketch"))

  /** Distinct state ⊕ state — groups on either side survive. */
  def distinctMerge(a: DataFrame, b: DataFrame,
                    groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col): _*)
      .agg(hll_union_agg(col("nd_sketch")).as("nd_sketch"))

  /** Finished view: adds the cardinality estimate. */
  def distinctFinish(state: DataFrame): DataFrame =
    state.withColumn("approx_distinct",
      hll_sketch_estimate(col("nd_sketch")))

  // ---- mergeable EXACT quantiles ----------------------------------
  // Monitored percentiles (latency SLOs — the most common production
  // monitor) are the one family the count/sum/min/max state can't
  // derive, and the usual answer (a GK/KLL sketch) trades away the
  // exact oracle. The repo's bounded-grid convention sidesteps the
  // trade: on a decimal-grid metric the mergeable state is the EXACT
  // per-value counter table (one row per (group, grid value)), merge
  // is a counter sum — associative, commutative, so
  //   qstate(history ∪ delta) = quantileMerge(qstate(h), qstate(d))
  // holds bit-for-bit — and finish walks the bounded axis with
  // Spark Percentile's own type-7 interpolation (the same double
  // sequence `StreamingQuantiles.interpolate` pins for the streaming
  // twin). State per group is O(distinct grid values) longs — the
  // ecdf axis bound; continuous metrics must be quantized first
  // (functions.AxisGrid), exactly as the batch contract requires.

  /** Quantile-axis column name for `p`, in per-mille: 0.5 → `q500`. */
  def qname(p: Double): String = "q" + math.round(p * 1000)

  /** Mergeable exact-quantile state of `valueCol` per `groupCols`:
    * `(groupCols..., v [decimal(18,scale) grid value], cnt)`. Nulls
    * are dropped (Spark `percentile` semantics). */
  def quantileState(df: DataFrame, groupCols: Seq[String],
                    valueCol: String, scale: Int = 2): DataFrame =
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col) :+
        col(valueCol).cast(s"decimal(18,$scale)").as("v"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Quantile state ⊕ state — counter sum per (group, grid value). */
  def quantileMerge(a: DataFrame, b: DataFrame,
                    groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(groupCols.map(col) :+ col("v"): _*)
      .agg(sum(col("cnt")).as("cnt"))

  /** Finished view: one row per group with `n` and one double column
    * per requested percentile (type-7, Spark `percentile`'s exact
    * interpolation: position = p·(n−1), result = v⌊pos⌋·(⌈pos⌉−pos) +
    * v⌈pos⌉·(pos−⌊pos⌋)). The walk is a window sort over the BOUNDED
    * value axis — |groups|·|grid| rows, never the corpus. */
  def quantileFinish(state: DataFrame, groupCols: Seq[String],
                     ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1),
      s"percentiles must be in [0,1]: $ps")
    val gc = groupCols.map(col)
    val w = Window.partitionBy(gc: _*).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(gc: _*)
    var cur = state
      .withColumn("__cum", sum(col("cnt")).over(w))
      .withColumn("__n", sum(col("cnt")).over(wAll))
    ps.zipWithIndex.foreach { case (p, i) =>
      cur = cur
        .withColumn(s"__pos_$i",
          lit(p) * (col("__n").cast("double") - lit(1.0)))
        .withColumn(s"__lo_$i", floor(col(s"__pos_$i")))
        .withColumn(s"__hi_$i", ceil(col(s"__pos_$i")))
    }
    def vAtLeast(rank0: Column): Column =
      min(when(col("__cum") >= rank0 + lit(1L), col("v").cast("double")))
    val aggCols: Seq[Column] = max(col("__n")).as("n") +: ps.indices.flatMap {
      i => Seq(
        vAtLeast(col(s"__lo_$i")).as(s"__vlo_$i"),
        vAtLeast(col(s"__hi_$i")).as(s"__vhi_$i"),
        max(col(s"__pos_$i")).as(s"__p_$i"),
        max(col(s"__lo_$i")).cast("double").as(s"__flo_$i"),
        max(col(s"__hi_$i")).cast("double").as(s"__fhi_$i"))
    }
    val agged = cur.groupBy(gc: _*).agg(aggCols.head, aggCols.tail: _*)
    val qs = ps.zipWithIndex.map { case (p, i) =>
      when(col(s"__fhi_$i") === col(s"__flo_$i"), col(s"__vlo_$i"))
        .otherwise(
          col(s"__vlo_$i") * (col(s"__fhi_$i") - col(s"__p_$i"))
            + col(s"__vhi_$i") * (col(s"__p_$i") - col(s"__flo_$i")))
        .as(qname(p))
    }
    agged.select(gc ++ (col("n") +: qs): _*)
  }

  /** DuckDB twin of state → finish, recomputed from the FULL table —
    * the oracle that pins merge(state(shardA), state(shardB)) ≡
    * recompute bit-for-bit. Same cum-walk + type-7 interpolation
    * double sequence as [[quantileFinish]] (NOT `quantile_cont`, whose
    * internal arithmetic DuckDB doesn't contract to this sequence). */
  def sqlQuantileRecompute(tableSql: String, groupCols: Seq[String],
                           valueCol: String, ps: Seq[Double],
                           scale: Int = 2): String = {
    val g = groupCols.mkString(", ")
    val posCols = ps.zipWithIndex.map { case (p, i) =>
      s"""${p}e0 * (CAST(n AS DOUBLE) - 1.0e0) AS pos_$i,
         |        floor(${p}e0 * (CAST(n AS DOUBLE) - 1.0e0)) AS lo_$i,
         |        ceil(${p}e0 * (CAST(n AS DOUBLE) - 1.0e0)) AS hi_$i""".stripMargin
    }.mkString(",\n        ")
    val aggCols = ps.indices.map { i =>
      s"""min(CASE WHEN cum >= lo_$i + 1 THEN CAST(v AS DOUBLE) END) AS vlo_$i,
         |        min(CASE WHEN cum >= hi_$i + 1 THEN CAST(v AS DOUBLE) END) AS vhi_$i,
         |        max(pos_$i) AS p_$i,
         |        CAST(max(lo_$i) AS DOUBLE) AS flo_$i,
         |        CAST(max(hi_$i) AS DOUBLE) AS fhi_$i""".stripMargin
    }.mkString(",\n        ")
    val qCols = ps.zipWithIndex.map { case (p, i) =>
      s"""CASE WHEN fhi_$i = flo_$i THEN vlo_$i
         |        ELSE vlo_$i * (fhi_$i - p_$i) + vhi_$i * (p_$i - flo_$i)
         |        END AS ${qname(p)}""".stripMargin
    }.mkString(",\n      ")
    s"""
    WITH state AS (
      SELECT $g, CAST($valueCol AS DECIMAL(18,$scale)) AS v,
        CAST(count(*) AS BIGINT) AS cnt
      FROM ($tableSql) WHERE $valueCol IS NOT NULL
      GROUP BY $g, CAST($valueCol AS DECIMAL(18,$scale))
    ), cum AS (
      SELECT *, sum(cnt) OVER (PARTITION BY $g ORDER BY v
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
        sum(cnt) OVER (PARTITION BY $g) AS n
      FROM state
    ), pos AS (
      SELECT *,
        $posCols
      FROM cum
    ), agged AS (
      SELECT $g, CAST(max(n) AS BIGINT) AS n,
        $aggCols
      FROM pos GROUP BY $g)
    SELECT $g, n,
      $qCols
    FROM agged"""
  }
}
