package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MERGEABLE QUANTILE SKETCH FOR UNBOUNDED AXES — the member of the
  * incremental-agg family [[IncrementalAgg]]'s exact grid state can't
  * cover: that state is exact but requires a bounded decimal grid (the
  * ecdf contract), so a monitored metric with an unbounded axis
  * (latencies, token counts) had no mergeable quantile state at all —
  * only the non-mergeable `approx_percentile` twin. This is a
  * DETERMINISTIC Munro–Paterson-style compactor hierarchy (the KLL
  * shape, Karnin–Lang–Liberty 2016, with the random compaction offset
  * replaced by a level-parity rule — KLL randomizes to make the
  * estimate unbiased; the deterministic rule keeps the same WORST-CASE
  * rank error and buys reproducibility, the repo's standing trade):
  *
  *  - level i holds ≤ k values, each representing 2^i inputs;
  *  - a full level sorts, keeps one value per adjacent pair (offset
  *    alternating with level parity), and promotes them up — so state
  *    is O(k·log(n/k)) doubles regardless of n or value range;
  *  - merge = concatenate levels pairwise, re-compact. Both build and
  *    merge keep the deterministic worst-case rank error
  *    ε ≈ O(log²(n/k)/k); at the default k = 2048 the measured error
  *    stays ≤ 1% of n through 8-way merges (QuantileSketchSpec pins
  *    it — the SketchAccuracySpec pattern).
  *
  * CONTRACT: rows+spec, NO oracle — the sketch's value set depends on
  * partition layout (which inputs co-compact), so merge ≡ one-shot
  * holds within the pinned rank-error ε, not bit-exactly; use
  * [[IncrementalAgg.quantileState]] when the axis is grid-bounded and
  * the exact oracle is wanted. Same partitioning → same result
  * (deterministic compaction, no RNG).
  *
  * Scale: build is one scan (treeAggregate — per-partition sketches,
  * log-depth merges, driver receives ONE sketch of O(k log n)
  * doubles); nothing corpus-sized moves. Query cost is the sketch
  * size. */
object QuantileSketch {

  /** Immutable sketch state. `levels(i)` is UNSORTED storage of
    * weight-2^i values (sorted lazily at compaction/query). */
  case class Sketch(k: Int, n: Long, levels: Vector[Vector[Double]])
      extends Serializable {
    def isEmpty: Boolean = n == 0L
  }

  def empty(k: Int = 2048): Sketch = {
    require(k >= 8 && k % 2 == 0, s"k must be even and >= 8: $k")
    Sketch(k, 0L, Vector(Vector.empty))
  }

  /** Compact every overfull level upward until all fit. Deterministic:
    * the kept element inside each sorted pair alternates with level
    * parity (low at even levels, high at odd), halving systematic
    * rank bias without randomness. */
  private def compact(sk: Sketch): Sketch = {
    var levels = sk.levels
    var i = 0
    while (i < levels.length) {
      if (levels(i).length >= sk.k) {
        val sorted = levels(i).sorted
        val keepOdd = i % 2 == 1
        val nPairs = sorted.length / 2
        val promoted = Vector.tabulate(nPairs)(j =>
          sorted(2 * j + (if (keepOdd) 1 else 0)))
        val leftover =
          if (sorted.length % 2 == 1) Vector(sorted.last) else Vector.empty
        if (i + 1 >= levels.length) levels = levels :+ Vector.empty
        levels = levels
          .updated(i, leftover)
          .updated(i + 1, levels(i + 1) ++ promoted)
      }
      i += 1
    }
    sk.copy(levels = levels)
  }

  def insert(sk: Sketch, x: Double): Sketch =
    compact(sk.copy(n = sk.n + 1L,
      levels = sk.levels.updated(0, sk.levels(0) :+ x)))

  /** merge = level-wise concatenation + re-compaction; associative up
    * to the pinned rank error, commutative for equal-height inputs. */
  def merge(a: Sketch, b: Sketch): Sketch = {
    require(a.k == b.k, s"cannot merge sketches with k=${a.k} vs ${b.k}")
    val h = math.max(a.levels.length, b.levels.length)
    val levels = Vector.tabulate(h) { i =>
      (if (i < a.levels.length) a.levels(i) else Vector.empty) ++
        (if (i < b.levels.length) b.levels(i) else Vector.empty)
    }
    compact(Sketch(a.k, a.n + b.n, levels))
  }

  /** Quantile at `p`: smallest value whose cumulative weight reaches
    * ceil(p·n) (lower-rank semantics; p = 0 → min). */
  def query(sk: Sketch, p: Double): Double = {
    require(p >= 0 && p <= 1, s"p must be in [0,1]: $p")
    require(!sk.isEmpty, "query on an empty sketch")
    val weighted = sk.levels.zipWithIndex.flatMap { case (vs, i) =>
      vs.map(v => (v, 1L << i))
    }.sortBy(_._1)
    val target = math.max(1L, math.ceil(p * sk.n).toLong)
    var cum = 0L
    var i = 0
    while (i < weighted.length) {
      cum += weighted(i)._2
      if (cum >= target) return weighted(i)._1
      i += 1
    }
    weighted.last._1
  }

  /** Distributed build: one scan, per-partition sketches, log-depth
    * combine (`treeAggregate`) — the genuine per-partition imperative
    * case the RDD escape hatch exists for. */
  def build(df: DataFrame, valueCol: String, k: Int = 2048): Sketch =
    df.select(col(valueCol).cast("double")).na.drop()
      .rdd.map(_.getDouble(0))
      .treeAggregate(empty(k))(insert, merge)

  /** Driver-contract surface: one row per requested p with the
    * sketch's estimate — `(p, q, n)`. Rows+spec (no oracle, see the
    * class contract). */
  def quantiles(df: DataFrame, valueCol: String, ps: Seq[Double],
                k: Int = 2048): DataFrame = {
    require(ps.nonEmpty)
    val sk = build(df, valueCol, k)
    val spark = df.sparkSession
    val rows = ps.map(p => Row(p, query(sk, p), sk.n))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(StructField("p", DoubleType, nullable = false),
        StructField("q", DoubleType, nullable = false),
        StructField("n", LongType, nullable = false))))
  }

  /** Exact rank of `v` in `df` (audit helper for the spec's error
    * measurements): # values ≤ v. */
  def exactRank(df: DataFrame, valueCol: String, v: Double): Long =
    df.filter(col(valueCol).cast("double") <= v).count()

  // ---- grouped + persistable state ---------------------------------
  // The materialized-view half of the sketch (the IncrementalAgg
  // convention): per-GROUP sketches held as plain DataFrame rows
  // `(g, k, n, levels array<array<double>>)`, so the state writes to
  // parquet like any table, reads back, and merges with a fresh
  // shard's state — monitored per-segment percentiles refresh by
  // folding today's shard into yesterday's state, never rescanning
  // history. All within the pinned ≤1% rank-error contract; same
  // rows+spec (no oracle) status as the ungrouped build.

  /** Per-group sketch state of `valueCol` keyed on `groupCol` (read
    * as string): one row per group, `(g, k, n, levels)`. Built with
    * one `aggregateByKey` scan — per-partition sub-sketches, shuffle
    * of O(groups × k log n) state, never raw values. */
  def groupedState(df: DataFrame, groupCol: String, valueCol: String,
                   k: Int = 2048): DataFrame = {
    val spark = df.sparkSession
    val pairs = df.select(col(groupCol).cast("string"),
        col(valueCol).cast("double")).na.drop()
      .rdd.map(r => (r.getString(0), r.getDouble(1)))
    val states = pairs.aggregateByKey(empty(k))(insert, merge)
      .map { case (g, sk) =>
        Row(g, sk.k, sk.n, sk.levels.map(_.toSeq).toSeq) }
    spark.createDataFrame(states, StateSchema)
  }

  private val StateSchema = StructType(Seq(
    StructField("g", StringType, nullable = false),
    StructField("k", IntegerType, nullable = false),
    StructField("n", LongType, nullable = false),
    StructField("levels",
      ArrayType(ArrayType(DoubleType, containsNull = false),
        containsNull = false), nullable = false)))

  private def sketchOfRow(r: Row): Sketch =
    Sketch(r.getInt(1), r.getLong(2),
      r.getSeq[scala.collection.Seq[Double]](3)
        .map(_.toVector).toVector)

  /** State ⊕ state — groups on either side survive; shared groups'
    * sketches merge level-wise. Same schema in and out, so persisted
    * state folds with a fresh shard's state indefinitely. */
  def mergeStates(a: DataFrame, b: DataFrame): DataFrame = {
    val spark = a.sparkSession
    val merged = a.unionByName(b).rdd
      .map(r => (r.getString(0), sketchOfRow(r)))
      .reduceByKey(merge)
      .map { case (g, sk) =>
        Row(g, sk.k, sk.n, sk.levels.map(_.toSeq).toSeq) }
    spark.createDataFrame(merged, StateSchema)
  }

  /** Finished view over a state: one row per (group, p) with the
    * estimate — `(g, p, q, n)`. Per-row local walk over the bounded
    * sketch, no shuffle. */
  def finishState(state: DataFrame, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1))
    val spark = state.sparkSession
    val rows = state.rdd.flatMap { r =>
      val sk = sketchOfRow(r)
      ps.map(p => Row(r.getString(0), p, query(sk, p), sk.n))
    }
    spark.createDataFrame(rows, StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("p", DoubleType, nullable = false),
      StructField("q", DoubleType, nullable = false),
      StructField("n", LongType, nullable = false))))
  }
}
