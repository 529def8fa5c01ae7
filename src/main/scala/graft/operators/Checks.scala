package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DECLARATIVE CONSTRAINT CHECKS — the data-contract gate a pipeline
  * runs on every table drop before anything downstream consumes it
  * (the Deequ/Great-Expectations pattern re-expressed as one Spark
  * plan). Callers declare WHAT must hold; the operator compiles the
  * declarations into the fewest possible passes and returns one
  * long-format row per constraint: violation count + pass/fail.
  *
  * Scale shape, by constraint class:
  *  - Row-level predicates (`notNull`, `inRange`, `accepted`,
  *    `matches`, `satisfies`): ALL of them compile into a SINGLE
  *    aggregate over ONE scan — each is a `sum(violation ? 1 : 0)`
  *    and partial aggregation makes the reduce input one row per
  *    task. Adding a tenth row-level check costs zero extra I/O.
  *  - `unique`: needs the key's distinct count → one hash aggregate,
  *    shuffled on the key (map-side partials first). Runs as its own
  *    job so the row-level scan stays Expand-free.
  *  - `refIntegrity`: orphaned-foreign-key count via a LEFT ANTI join
  *    against the dimension's key projection — broadcast when the dim
  *    is small (the usual case), shuffle join otherwise; either way
  *    only the two key columns move.
  *
  * Null semantics follow SQL constraints: `inRange`/`accepted`/
  * `matches` do NOT count nulls as violations (declare `notNull`
  * separately — exactly how CHECK constraints treat unknown), and a
  * null foreign key is not an orphan.
  */
object Checks {

  sealed trait Constraint { def name: String; def target: String }
  /** Column must have no nulls. */
  final case class NotNull(column: String) extends Constraint {
    def name = "not_null"; def target: String = column
  }
  /** Non-null values must sit in [lo, hi] (inclusive). */
  final case class InRange(column: String, lo: Double, hi: Double)
      extends Constraint {
    def name = "in_range"; def target: String = column
  }
  /** Non-null values must be one of `values`. */
  final case class Accepted(column: String, values: Seq[String])
      extends Constraint {
    def name = "accepted_values"; def target: String = column
  }
  /** Non-null values must match `regex` (Java regex, RLIKE semantics —
    * unanchored; anchor explicitly with ^...$ when needed). */
  final case class Matches(column: String, regex: String) extends Constraint {
    def name = "matches_regex"; def target: String = column
  }
  /** Arbitrary row predicate that must hold on every row (nulls in the
    * predicate evaluate to unknown = not a violation, as in SQL CHECK). */
  final case class Satisfies(label: String, predicate: Column)
      extends Constraint {
    def name = "satisfies"; def target: String = label
  }
  /** The column tuple must be unique across rows. Violations = rows
    * with a fully-non-null key − count(DISTINCT cols); rows with any
    * null key column are ignored (SQL DISTINCT skips them) — declare
    * `notNull` on the key alongside this when nulls are possible. */
  final case class Unique(columns: Seq[String]) extends Constraint {
    def name = "unique"; def target: String = columns.mkString(",")
  }
  /** Every non-null value of `column` must exist in `dimColumn` of
    * `dim` (foreign-key containment). */
  final case class RefIntegrity(column: String, dim: DataFrame,
                                dimColumn: String) extends Constraint {
    def name = "ref_integrity"; def target: String = column
  }

  /** Run `constraints` against `df`. Output columns:
    * `check, target, n_rows, violations, passed`. Row order is the
    * declaration order (stable for reporting; re-sort as needed).
    */
  def run(df: DataFrame, constraints: Seq[Constraint]): DataFrame = {
    require(constraints.nonEmpty, "no constraints declared")
    val spark = df.sparkSession
    import spark.implicits._

    // one violation-indicator aggregate per row-level constraint, all
    // fused into a single scan; unique counts ride the same pass as
    // extra count_distinct aggregates only if declared (they Expand
    // the stream, so they get their own job instead — see scale note)
    val rowLevel: Seq[(Constraint, Column)] = constraints.collect {
      case c @ NotNull(col0) =>
        c -> col(col0).isNull
      case c @ InRange(col0, lo, hi) =>
        c -> (col(col0).isNotNull &&
          (col(col0).cast("double") < lo || col(col0).cast("double") > hi))
      case c @ Accepted(col0, vs) =>
        c -> (col(col0).isNotNull && !col(col0).isin(vs: _*))
      case c @ Matches(col0, re) =>
        c -> (col(col0).isNotNull && !col(col0).rlike(re))
      case c @ Satisfies(_, p) =>
        c -> !coalesce(p, lit(true))
    }
    val rowLevelDf: Option[DataFrame] =
      if (rowLevel.isEmpty) None
      else {
        val aggs = count(lit(1)).cast("long").as("__nr") +:
          rowLevel.zipWithIndex.map { case ((_, viol), i) =>
            sum(when(viol, 1L).otherwise(0L)).cast("long").as(s"__v_$i")
          }
        val one = df.agg(aggs.head, aggs.tail: _*)
        val structs = rowLevel.zipWithIndex.map { case ((c, _), i) =>
          struct(lit(c.name).as("check"), lit(c.target).as("target"),
            col("__nr").as("n_rows"),
            coalesce(col(s"__v_$i"), lit(0L)).as("violations"))
        }
        Some(one.select(explode(array(structs: _*)).as("__c"))
          .select(col("__c.*")))
      }

    val uniqueDfs: Seq[DataFrame] = constraints.collect {
      case c @ Unique(cols0) =>
        // null-neutral: rows with a null key column are not counted
        // against uniqueness (count(DISTINCT …) skips them per SQL, so
        // the minuend must too); declare notNull on the key separately
        val keyPresent = cols0.map(col(_).isNotNull).reduce(_ && _)
        df.agg(count(lit(1)).cast("long").as("n_rows"),
            count(when(keyPresent, 1)).cast("long").as("__nk"),
            count_distinct(col(cols0.head), cols0.tail.map(col): _*)
              .cast("long").as("__nd"))
          .select(lit(c.name).as("check"), lit(c.target).as("target"),
            col("n_rows"), (col("__nk") - col("__nd")).as("violations"))
    }

    val refDfs: Seq[DataFrame] = constraints.collect {
      case c @ RefIntegrity(col0, dim, dimCol) =>
        val orphans = df.select(col(col0).as("__fk")).where(col("__fk").isNotNull)
          .join(dim.select(col(dimCol).as("__pk")).distinct(),
            col("__fk") === col("__pk"), "left_anti")
          .agg(count(lit(1)).cast("long").as("violations"))
        val totals = df.agg(count(lit(1)).cast("long").as("n_rows"))
        totals.crossJoin(orphans)
          .select(lit(c.name).as("check"), lit(c.target).as("target"),
            col("n_rows"), col("violations"))
    }

    // preserve declaration order: tag each produced frame with its
    // constraint index, union, sort by the tag, drop it
    val ordered = constraints.zipWithIndex
    def idxOf(c: Constraint): Int = ordered.collectFirst {
      case (x, i) if x eq c => i
    }.get
    val tagged =
      rowLevelDf.toSeq.flatMap { d =>
        Seq(d.withColumn("__ord",
          // row-level frame holds several constraints; re-derive each
          // row's index from (check, target) against the declaration
          rowLevel.foldLeft(lit(-1)) { case (acc, (c, _)) =>
            when(col("check") === c.name && col("target") === c.target,
              lit(idxOf(c))).otherwise(acc)
          }))
      } ++
        (constraints.collect { case c: Unique => c } zip uniqueDfs).map {
          case (c, d) => d.withColumn("__ord", lit(idxOf(c)))
        } ++
        (constraints.collect { case c: RefIntegrity => c } zip refDfs).map {
          case (c, d) => d.withColumn("__ord", lit(idxOf(c)))
        }
    tagged.reduce(_ unionByName _)
      .orderBy(col("__ord"))
      .select(col("check"), col("target"), col("n_rows"),
        col("violations"), (col("violations") === 0L).as("passed"))
  }

  /** WRITE-AUDIT-PUBLISH: the constraint-gated promotion of a staged
    * [[graft.sources.VersionedTable]] cut — run the declared contract
    * on EXACTLY the staged file set, and only a fully passing report
    * promotes it to the readable latest (one atomic commit; readers
    * concurrent with the promote see old-or-new, never staged). A
    * violation throws IllegalStateException naming the failed checks
    * and leaves the staged cut INTACT for inspection
    * (`VersionedTable.discardStaged` releases it). Returns the
    * committed version. This is how a production corpus release
    * avoids shipping a bad cut: stage → this gate → serve. */
  def auditAndPromote(spark: org.apache.spark.sql.SparkSession,
                      dir: String, stagedId: String,
                      constraints: Seq[Constraint]): Long = {
    val staged = graft.sources.VersionedTable.readStaged(spark, dir,
      stagedId)
    val failed = run(staged, constraints).collect()
      .filter(r => r.getLong(r.fieldIndex("violations")) > 0L)
    if (failed.nonEmpty)
      throw new IllegalStateException(
        s"staged publish '$stagedId' at $dir failed " +
          s"${failed.length} constraint(s): " +
          failed.map(r => s"${r.getString(0)}(${r.getString(1)})=" +
            s"${r.getLong(r.fieldIndex("violations"))}")
            .mkString(", ") +
          " — promotion blocked, staged cut left for inspection")
    graft.sources.VersionedTable.promote(spark, dir, stagedId)
  }
}
