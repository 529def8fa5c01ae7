package graft.operators

import graft.sources.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DP PRIVACY-BUDGET LEDGER — the accounting the per-release
  * mechanisms ([[Anonymity.noisedCounts]]/[[Anonymity.noisedSums]]/
  * histogram/quantiles/[[Anonymity.noisedCountsGaussian]]) leave to
  * the caller: a pipeline publishing weekly statistics must be able
  * to answer "what is this corpus's TOTAL (ε, δ) so far?" and must
  * refuse a release that would blow the budget. This ledger is the
  * basic SEQUENTIAL-COMPOSITION account (ε's and δ's add across
  * releases — the safe upper bound every other accountant refines),
  * kept as a tiny [[VersionedTable]]:
  *
  *  - `init` commits version 1 holding the budget row;
  *  - `record` appends one release row per publish — the release
  *    name is the publish batchId, so replaying a release is a
  *    version-level no-op (the at-least-once pipeline contract) —
  *    and FAILS LOUDLY (no version committed) when the running
  *    (ε, δ) total would exceed the budget;
  *  - `summary` emits the ledger with running totals and headroom.
  *
  * Determinism: ε lives on a 1e-6 integer grid, δ on a 1e-12 grid —
  * the totals are exact BIGINT sums, so the summary sits under the
  * bit-exact oracle. Scale: the ledger is release-axis sized (rows =
  * releases, not data); every operation is one small read + one
  * manifest commit. CONCURRENT-SAFE since round 13: appends go
  * through the optimistic read-modify-write commit
  * ([[VersionedTable.publishIfUnchanged]]), so racing recorders
  * serialize — the loser re-reads the grown ledger and re-checks the
  * budget before retrying (DpLedgerSpec races 8 recorders and the
  * final ledger holds all 8 rows with a correct total). */
object DpLedger {

  private val BudgetRelease = "__budget"

  // eps capped at 1e6 (eps_micro <= 1e12): any larger epsilon is
  // privacy-meaningless, and the cap keeps every BIGINT total in
  // record/summary orders of magnitude away from Long overflow (the
  // additions below still use addExact as a belt-and-braces guard —
  // a wrapped-negative total would silently PASS the budget check,
  // defeating the fails-loudly contract)
  private def grid(eps: Double, delta: Double): (Long, Long) = {
    require(eps >= 0 && !eps.isNaN && eps <= 1e6, s"bad epsilon $eps")
    require(delta >= 0 && !delta.isNaN && delta < 1, s"bad delta $delta")
    (math.round(eps * 1e6), math.round(delta * 1e12))
  }

  /** Create the ledger with its total budget (version 1). */
  def init(spark: SparkSession, dir: String, epsBudget: Double,
           deltaBudget: Double): Unit = {
    val (em, dp) = grid(epsBudget, deltaBudget)
    require(em > 0, "epsilon budget must be positive")
    import spark.implicits._
    VersionedTable.publish(
      Seq((0L, BudgetRelease, "budget", em, dp))
        .toDF("ord", "release", "mechanism", "eps_micro", "delta_pico"),
      dir, "ledger-init")
    ()
  }

  private def entries(spark: SparkSession, dir: String): DataFrame =
    VersionedTable.readLatest(spark, dir)

  /** Record one release. Idempotent per `release` name; throws
    * IllegalStateException (committing nothing) when the sequential
    * composition total would exceed the budget. CONCURRENT-SAFE: the
    * append is an optimistic read-modify-write
    * ([[VersionedTable.publishIfUnchanged]]) — a racing recorder's
    * commit aborts ours, we re-read the grown ledger, RE-CHECK the
    * budget against it and retry, so concurrent releases can never
    * overspend by each basing on the same stale total (the
    * lost-update race the round-12 version documented away). Returns
    * the committed ledger version. */
  def record(spark: SparkSession, dir: String, release: String,
             mechanism: String, epsilon: Double, delta: Double): Long = {
    require(release.nonEmpty && release != BudgetRelease &&
      !release.contains("\n"), s"bad release name '$release'")
    val (em, dp) = grid(epsilon, delta)
    // the shared OCC helper re-runs the whole read-check-append body
    // off the winner's commit, so concurrent releases can never
    // overspend by basing on the same stale total
    VersionedTable.withConflictRetry(maxAttempts = 20) {
      VersionedTable.committedVersionOf(spark, dir,
        s"release-$release") match {
        case Some(v) => v // replayed release: already accounted
        case None =>
          val base = VersionedTable.latestVersion(spark, dir).getOrElse(
            throw new NoSuchElementException(
              s"no committed version at $dir — init() first"))
          val cur = entries(spark, dir).collect() // release-axis sized
          val budget = cur.find(_.getString(1) == BudgetRelease).getOrElse(
            throw new IllegalStateException(
              s"no budget row at $dir — init() first"))
          if (cur.exists(_.getString(1) == release)) base // renamed replay
          else {
            val spentE = cur.filter(_.getString(1) != BudgetRelease)
              .map(_.getLong(3)).foldLeft(0L)(Math.addExact)
            val spentD = cur.filter(_.getString(1) != BudgetRelease)
              .map(_.getLong(4)).foldLeft(0L)(Math.addExact)
            if (Math.addExact(spentE, em) > budget.getLong(3) ||
                Math.addExact(spentD, dp) > budget.getLong(4))
              throw new IllegalStateException(
                s"release '$release' (eps=$epsilon, delta=$delta) would " +
                  s"exceed the budget: spent eps_micro=$spentE/" +
                  s"${budget.getLong(3)}, delta_pico=$spentD/" +
                  s"${budget.getLong(4)}")
            val ord = cur.map(_.getLong(0)).max + 1L
            import spark.implicits._
            val next = entries(spark, dir).unionByName(
              Seq((ord, release, mechanism, em, dp))
                .toDF("ord", "release", "mechanism", "eps_micro",
                  "delta_pico"))
            VersionedTable.publishIfUnchanged(next, dir,
              s"release-$release", expectedBaseVersion = base)
          }
      }
    }
  }

  /** ADVANCED COMPOSITION (Dwork–Rothblum–Vadhan, heterogeneous
    * form): for releases (ε_i, δ_i) and slack δ′,
    *
    *   ε_total = sqrt(2 ln(1/δ′) Σε_i²) + Σ ε_i(e^{ε_i} − 1),
    *   δ_total = δ′ + Σδ_i
    *
    * — the √k-scaling bound that makes many small releases affordable
    * where the basic Σε account would blow the budget. REPORTING
    * ONLY: [[record]] enforces the basic (safe, always-valid) account
    * — a budget owner who adopts the advanced bound reads this
    * summary and sizes the basic budget accordingly. Determinism:
    * Σε_i² is the exact DECIMAL sum of squared micro-grid integers
    * (pico grid); each e^{ε_i} term quantizes to the 1e-12 grid
    * before the exact sum (order-free); the final sqrt/ln sequence is
    * one fixed IEEE chain, emitted on the 6-dp floor grid. One row:
    * `(k, eps_basic_micro, delta_basic_pico, delta_slack_pico,
    * eps_advanced, delta_advanced_pico)`. */
  def advancedSummary(spark: SparkSession, dir: String,
                      deltaSlack: Double): DataFrame = {
    require(deltaSlack > 0 && deltaSlack < 1,
      s"delta slack must be in (0,1): $deltaSlack")
    val slackPico = math.round(deltaSlack * 1e12)
    val rel = entries(spark, dir).filter(col("release") =!= BudgetRelease)
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val epsD = d(col("eps_micro")) / lit(1e6)
    val sums = rel.agg(
      count(lit(1)).as("k"),
      sum(col("eps_micro")).as("eps_basic_micro"),
      sum(col("delta_pico")).as("delta_basic_pico"),
      // cast each factor to decimal BEFORE the multiply so the square
      // is computed in decimal(38,0) arithmetic like the HUGEINT
      // oracle — a BIGINT multiply would wrap for eps_micro > ~3e9
      sum(col("eps_micro").cast("decimal(19,0)")
          * col("eps_micro").cast("decimal(19,0)"))
        .as("__s2_pico2"),
      sum(floor(epsD * (exp(epsD) - lit(1.0)) * lit(1e12) + lit(0.5))
        .cast("bigint")).as("__lin_pico"))
    sums.select(col("k"), col("eps_basic_micro"), col("delta_basic_pico"),
      lit(slackPico).as("delta_slack_pico"),
      (floor((sqrt(lit(2.0) * lit(math.log(1.0 / deltaSlack))
          * (d(col("__s2_pico2")) / lit(1e12)))
        + d(col("__lin_pico")) / lit(1e12)) * lit(1e6) + lit(0.5))
        / lit(1e6)).as("eps_advanced"),
      (col("delta_basic_pico") + lit(slackPico)).as("delta_advanced_pico"))
  }

  /** The ledger with running sequential-composition totals and
    * remaining headroom: one row per release (ord order) —
    * `(ord, release, mechanism, eps_micro, delta_pico,
    * eps_spent_micro, delta_spent_pico, eps_left_micro,
    * delta_left_pico)`. All exact BIGINT. */
  def summary(spark: SparkSession, dir: String): DataFrame = {
    val e = entries(spark, dir)
    val budget = e.filter(col("release") === BudgetRelease)
      .select(col("eps_micro").as("__be"), col("delta_pico").as("__bd"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("ord"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    e.filter(col("release") =!= BudgetRelease)
      .crossJoin(broadcast(budget))
      .withColumn("eps_spent_micro", sum(col("eps_micro")).over(w))
      .withColumn("delta_spent_pico", sum(col("delta_pico")).over(w))
      .select(col("ord"), col("release"), col("mechanism"),
        col("eps_micro"), col("delta_pico"),
        col("eps_spent_micro"), col("delta_spent_pico"),
        (col("__be") - col("eps_spent_micro")).as("eps_left_micro"),
        (col("__bd") - col("delta_spent_pico")).as("delta_left_pico"))
  }
}
