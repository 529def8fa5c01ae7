package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** KAPLAN–MEIER SURVIVAL — time-to-event with CENSORING handled
  * correctly: "how long until users convert", where users who have
  * not converted yet contribute exactly the time they were observed
  * (dropping them biases optimistic, counting them as never-converting
  * biases pessimistic — the KM estimator is the standard fix, and the
  * same machinery reads as churn/retention by flipping the event).
  *
  *   S(t) = Π_{tᵢ ≤ t} (1 − dᵢ / nᵢ)
  *
  * with dᵢ = events at time tᵢ and nᵢ = subjects still AT RISK
  * (duration ≥ tᵢ — ties resolve events-before-censorings, the
  * textbook convention).
  *
  * Determinism & scale, both from the same move: durations bucket to
  * a COARSE integer grid (`bucketUs`, e.g. hours — integer division,
  * exact on both engines), so the time axis is bounded by
  * observation-span / bucket, not by subject count. The risk set
  * comes from one running sum over that bounded axis; the survival
  * product is exp of a running sum of ln terms over the SAME total
  * order — both engines fold the identical sequence, and the 6-dp
  * round absorbs libm's last ulp. Per-subject reduction is one hash
  * agg; nothing subject-count-sized enters a window.
  */
object Survival {

  /** KM curve over per-subject `(durationCol [long], eventCol
    * [boolean-ish: 1 = event observed, 0 = censored])` rows. Output:
    * one row per duration bucket with ≥1 event — `t_bucket, d (events),
    * censored, at_risk, survival` (6-dp, non-increasing from 1). */
  def kaplanMeier(perSubject: DataFrame, durationCol: String,
                  eventCol: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0)
    val byBucket = perSubject
      .select((col(durationCol) / bucketUs).cast("long").as("t_bucket"),
        col(eventCol).cast("int").as("__e"))
      .groupBy(col("t_bucket"))
      .agg(count(lit(1)).as("__n"), sum(col("__e")).as("d"),
        (count(lit(1)) - sum(col("__e"))).as("censored"))
    val total = byBucket.agg(sum(col("__n")).as("__total"))
    val wPrev = Window.orderBy(col("t_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // a bucket where EVERY remaining subject has the event makes its
    // term 0 (S drops to exactly 0) — ln(0) must not enter the fold:
    // carry a sticky zero flag instead, and fold ln only over positive
    // terms (once S is 0 it stays 0; later terms are irrelevant)
    byBucket.crossJoin(broadcast(total))
      .withColumn("at_risk",
        col("__total") - coalesce(sum(col("__n")).over(wPrev), lit(0L)))
      .withColumn("__term",
        lit(1.0) - col("d").cast("double") / col("at_risk").cast("double"))
      .filter(col("d") > 0)
      .withColumn("__zero", max((col("__term") <= 0).cast("int")).over(wCum))
      .withColumn("__lnTerm",
        when(col("__term") > 0, log(col("__term"))).otherwise(lit(0.0)))
      .withColumn("survival",
        when(col("__zero") === 1, lit(0.0))
          .otherwise(round(exp(sum(col("__lnTerm")).over(wCum)), 6)))
      .select("t_bucket", "d", "censored", "at_risk", "survival")
  }

  /** NELSON–AALEN CUMULATIVE HAZARD — the additive twin of the KM
    * product: H(t) = Σ_{tᵢ ≤ t} dᵢ/nᵢ. Where S(t) answers "what
    * fraction survives", H(t) reads as accumulated instantaneous risk —
    * near-linear H means constant hazard, bends mean risk regimes
    * changing; it is also the numerically-stable route to S ≈ e^−H for
    * heavy-tailed data. Same bucketed prep, risk-set arithmetic and
    * bounded-axis ordered fold as [[kaplanMeier]] — the d/n terms sum
    * (not ln/exp), which both engines fold in the identical bucket
    * order. Output: `t_bucket, d, at_risk, cumhaz` (6-dp,
    * non-decreasing from 0). */
  def nelsonAalen(perSubject: DataFrame, durationCol: String,
                  eventCol: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0)
    val byBucket = perSubject
      .select((col(durationCol) / bucketUs).cast("long").as("t_bucket"),
        col(eventCol).cast("int").as("__e"))
      .groupBy(col("t_bucket"))
      .agg(count(lit(1)).as("__n"), sum(col("__e")).as("d"))
    val total = byBucket.agg(sum(col("__n")).as("__total"))
    val wPrev = Window.orderBy(col("t_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byBucket.crossJoin(broadcast(total))
      .withColumn("at_risk",
        col("__total") - coalesce(sum(col("__n")).over(wPrev), lit(0L)))
      .filter(col("d") > 0)
      .withColumn("__h",
        col("d").cast("double") / col("at_risk").cast("double"))
      .withColumn("cumhaz", round(sum(col("__h")).over(wCum), 6))
      .select("t_bucket", "d", "at_risk", "cumhaz")
  }

  /** DuckDB twin of [[nelsonAalen]]. */
  def sqlNelsonAalen(perSubjectSql: String, bucketUs: Long): String = s"""
    WITH ps AS ($perSubjectSql), b AS (
      SELECT CAST(duration // $bucketUs AS BIGINT) AS t_bucket,
        CAST(count(*) AS BIGINT) AS n, CAST(sum(event) AS BIGINT) AS d
      FROM ps GROUP BY 1
    ), t AS (SELECT sum(n) AS total FROM b), r AS (
      SELECT b.t_bucket, b.d,
        CAST(t.total - coalesce(sum(b.n) OVER (ORDER BY b.t_bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS at_risk
      FROM b CROSS JOIN t
    )
    SELECT t_bucket, d, at_risk,
      round(sum(CAST(d AS DOUBLE) / CAST(at_risk AS DOUBLE))
        OVER (ORDER BY t_bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cumhaz
    FROM r WHERE d > 0"""

  /** RESTRICTED MEAN SURVIVAL TIME — ∫₀^τ S(t) dt: "average event-free
    * buckets within the first τ", the single-number summary clinicians
    * and growth teams both reach for because it stays defined when the
    * median never falls below 0.5 and (unlike a hazard ratio) reads in
    * TIME units. Computed exactly from the KM step function: S = 1 on
    * [0, t₁), then each step S_i spans [t_i, min(t_{i+1}, τ)). Terms
    * are non-negative products of the 6-dp S grid and integer bucket
    * spans, folded in bucket order (ordered window, then one max —
    * the bounded-axis recipe). Output one row: `horizon, rmst` (bucket
    * units, 6-dp); an event-free corpus yields rmst = τ exactly. */
  def rmst(perSubject: DataFrame, durationCol: String, eventCol: String,
           bucketUs: Long, horizonBuckets: Long): DataFrame = {
    require(horizonBuckets > 0)
    val km = kaplanMeier(perSubject, durationCol, eventCol, bucketUs)
      .filter(col("t_bucket") < horizonBuckets)
    val wOrd = Window.orderBy(col("t_bucket"))
    val wCum = Window.orderBy(col("t_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    km
      .withColumn("__next",
        least(coalesce(lead(col("t_bucket"), 1).over(wOrd),
          lit(horizonBuckets)), lit(horizonBuckets)))
      .withColumn("__term",
        col("survival") * (col("__next") - col("t_bucket")).cast("double"))
      .withColumn("__cum", sum(col("__term")).over(wCum))
      .agg(
        round(coalesce(min(col("t_bucket")).cast("double") + max(col("__cum")),
          lit(horizonBuckets.toDouble)), 6).as("rmst"))
      .select(lit(horizonBuckets).as("horizon"), col("rmst"))
  }

  /** DuckDB twin of [[rmst]] — wraps the [[sqlKaplanMeier]] twin. */
  def sqlRmst(perSubjectSql: String, bucketUs: Long,
              horizonBuckets: Long): String = s"""
    WITH km AS (${sqlKaplanMeier(perSubjectSql, bucketUs)}),
    kmh AS (SELECT * FROM km WHERE t_bucket < $horizonBuckets),
    seg AS (
      SELECT t_bucket, survival,
        least(coalesce(lead(t_bucket, 1) OVER (ORDER BY t_bucket),
          $horizonBuckets), $horizonBuckets) AS nxt
      FROM kmh
    ), terms AS (
      SELECT t_bucket,
        survival * CAST(nxt - t_bucket AS DOUBLE) AS term
      FROM seg
    ), folded AS (
      SELECT t_bucket,
        sum(term) OVER (ORDER BY t_bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM terms
    )
    SELECT CAST($horizonBuckets AS BIGINT) AS horizon,
      round(coalesce(CAST(min(t_bucket) AS DOUBLE) + max(cum),
        ${horizonBuckets}.0e0), 6) AS rmst
    FROM folded"""

  /** Per-COHORT KM curves — the same estimator partitioned by a cohort
    * column (treatment arm, signup channel, plan tier): one curve per
    * cohort, each over its own bounded bucket axis. All the windows
    * that were ordered-only gain `partitionBy(cohort)`, so the per-
    * cohort state is exactly as bounded as the single-curve case and
    * cohorts fold independently — the 100-TB shape is unchanged (one
    * hash agg on (cohort, bucket), windows over the bounded axis).
    * Output: `cohort, t_bucket, d, censored, at_risk, survival`. */
  def kaplanMeierCohorts(perSubject: DataFrame, durationCol: String,
                         eventCol: String, cohortCol: String,
                         bucketUs: Long): DataFrame = {
    require(bucketUs > 0)
    val byBucket = perSubject
      .select(col(cohortCol).as("cohort"),
        (col(durationCol) / bucketUs).cast("long").as("t_bucket"),
        col(eventCol).cast("int").as("__e"))
      .groupBy(col("cohort"), col("t_bucket"))
      .agg(count(lit(1)).as("__n"), sum(col("__e")).as("d"),
        (count(lit(1)) - sum(col("__e"))).as("censored"))
    val totals = byBucket.groupBy(col("cohort"))
      .agg(sum(col("__n")).as("__total"))
    val wPrev = Window.partitionBy(col("cohort")).orderBy(col("t_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.partitionBy(col("cohort")).orderBy(col("t_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byBucket.join(broadcast(totals), "cohort")
      .withColumn("at_risk",
        col("__total") - coalesce(sum(col("__n")).over(wPrev), lit(0L)))
      .withColumn("__term",
        lit(1.0) - col("d").cast("double") / col("at_risk").cast("double"))
      .filter(col("d") > 0)
      .withColumn("__zero", max((col("__term") <= 0).cast("int")).over(wCum))
      .withColumn("__lnTerm",
        when(col("__term") > 0, log(col("__term"))).otherwise(lit(0.0)))
      .withColumn("survival",
        when(col("__zero") === 1, lit(0.0))
          .otherwise(round(exp(sum(col("__lnTerm")).over(wCum)), 6)))
      .select("cohort", "t_bucket", "d", "censored", "at_risk", "survival")
  }

  /** TWO-COHORT LOG-RANK TEST — "are these two survival curves the same
    * curve?", the hypothesis test that completes the experimentation
    * family (A/B Welch t, CUPED, MDE) for time-to-event outcomes. At
    * each event-time bucket the observed events in cohort 1 are
    * compared with the hypergeometric expectation given the pooled
    * risk set; the statistic is `(Σ(O₁−E₁))² / ΣV` ~ χ²(1) under H₀.
    *
    *   E₁(t) = d·n₁/n      V(t) = d·(n₁/n)·(n₂/n)·(n−d)/(n−1)
    *
    * Determinism: every n/d is an exact BIGINT; E₁ and V are fixed-
    * order double expressions on those integers; the three sums fold
    * over the SAME bounded bucket axis via ordered running-sum windows
    * (never a hash-agg double sum, whose order is engine-dependent).
    * Buckets with n = 1 contribute V = 0 (the (n−1) guard).
    *
    * Scale: one hash agg on (cohort, bucket), a bounded-axis grid fill
    * (axis × 2 rows), windows over that axis, one final row. Output:
    * `cohort_1, obs_1, exp_1, chi2` (cohort_1 = the lexicographically
    * first cohort; exact 2 cohorts required — checked structurally by
    * the pivot, extras are ignored in n₂ only if absent from data).
    */
  def logRank(perSubject: DataFrame, durationCol: String, eventCol: String,
              cohortCol: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0)
    val bc = perSubject
      .select(col(cohortCol).cast("string").as("cohort"),
        (col(durationCol) / bucketUs).cast("long").as("t_bucket"),
        col(eventCol).cast("int").as("__e"))
      .groupBy(col("cohort"), col("t_bucket"))
      .agg(count(lit(1)).as("__n"), sum(col("__e")).as("__d"))
    // full grid (bucket axis × cohorts) so censoring-only buckets still
    // decrement the risk set of BOTH cohorts
    val grid = bc.select(col("t_bucket")).distinct()
      .crossJoin(bc.select(col("cohort")).distinct())
    val filled = grid.join(bc, Seq("cohort", "t_bucket"), "left_outer")
      .select(col("cohort"), col("t_bucket"),
        coalesce(col("__n"), lit(0L)).as("__n"),
        coalesce(col("__d"), lit(0L)).as("__d"))
    val totals = filled.groupBy(col("cohort")).agg(sum(col("__n")).as("__total"))
    val wPrev = Window.partitionBy(col("cohort")).orderBy(col("t_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val atRisk = filled.join(broadcast(totals), "cohort")
      .withColumn("__nr",
        col("__total") - coalesce(sum(col("__n")).over(wPrev), lit(0L)))
    val c1 = perSubject.agg(min(col(cohortCol).cast("string")).as("__c1"))
    val perBucket = atRisk.crossJoin(broadcast(c1))
      .groupBy(col("t_bucket"))
      .agg(
        sum(when(col("cohort") === col("__c1"), col("__nr"))
          .otherwise(lit(0L))).as("n1"),
        sum(when(col("cohort") === col("__c1"), col("__d"))
          .otherwise(lit(0L))).as("d1"),
        sum(col("__nr")).as("n"), sum(col("__d")).as("d"))
      .filter(col("d") > 0 && col("n") > 0)
    val n1d = col("n1").cast("double"); val nd = col("n").cast("double")
    val dd = col("d").cast("double")
    val wCum = Window.orderBy(col("t_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perBucket
      .withColumn("__u", col("d1").cast("double") - dd * n1d / nd)
      .withColumn("__e1", dd * n1d / nd)
      .withColumn("__v",
        when(col("n") > 1,
          dd * (n1d / nd) * ((nd - n1d) / nd)
            * ((nd - dd) / (nd - lit(1.0))))
          .otherwise(lit(0.0)))
      .withColumn("__uSum", sum(col("__u")).over(wCum))
      .withColumn("__eSum", sum(col("__e1")).over(wCum))
      .withColumn("__vSum", sum(col("__v")).over(wCum))
      .withColumn("__oSum", sum(col("d1")).over(wCum))
      .orderBy(col("t_bucket").desc).limit(1)
      .crossJoin(broadcast(c1))
      .select(col("__c1").as("cohort_1"),
        col("__oSum").cast("bigint").as("obs_1"),
        round(col("__eSum"), 6).as("exp_1"),
        when(col("__vSum") > 0,
          round(col("__uSum") * col("__uSum") / col("__vSum"), 6))
          .otherwise(lit(0.0)).as("chi2"))
  }

  /** DuckDB twin of [[kaplanMeierCohorts]] — `perSubjectSql` must
    * select `(cohort, duration [BIGINT], event [0/1])`. */
  def sqlKaplanMeierCohorts(perSubjectSql: String, bucketUs: Long): String = s"""
    WITH ps AS ($perSubjectSql), b AS (
      SELECT cohort, CAST(duration // $bucketUs AS BIGINT) AS t_bucket,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(event) AS BIGINT) AS d,
        CAST(count(*) - sum(event) AS BIGINT) AS censored
      FROM ps GROUP BY 1, 2
    ), t AS (SELECT cohort, sum(n) AS total FROM b GROUP BY 1), r AS (
      SELECT b.cohort, b.t_bucket, b.d, b.censored,
        CAST(t.total - coalesce(sum(b.n) OVER (PARTITION BY b.cohort
          ORDER BY b.t_bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS at_risk
      FROM b JOIN t USING (cohort)
    ), f AS (
      SELECT cohort, t_bucket, d, censored, at_risk,
        1.0e0 - CAST(d AS DOUBLE) / CAST(at_risk AS DOUBLE) AS term
      FROM r WHERE d > 0
    )
    SELECT cohort, t_bucket, d, censored, at_risk,
      CASE WHEN max(CASE WHEN term <= 0 THEN 1 ELSE 0 END)
          OVER (PARTITION BY cohort ORDER BY t_bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
        THEN 0.0e0
        ELSE round(exp(sum(CASE WHEN term > 0 THEN ln(term) ELSE 0.0e0 END)
          OVER (PARTITION BY cohort ORDER BY t_bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
      END AS survival
    FROM f"""

  /** DuckDB twin of [[logRank]] — identical grid fill, hypergeometric
    * terms and running-sum fold order. `perSubjectSql` must select
    * `(cohort [VARCHAR], duration [BIGINT], event [0/1])`. */
  def sqlLogRank(perSubjectSql: String, bucketUs: Long): String = s"""
    WITH ps AS ($perSubjectSql), bc AS (
      SELECT CAST(cohort AS VARCHAR) AS cohort,
        CAST(duration // $bucketUs AS BIGINT) AS t_bucket,
        CAST(count(*) AS BIGINT) AS n, CAST(sum(event) AS BIGINT) AS d
      FROM ps GROUP BY 1, 2
    ), grid AS (
      SELECT t.t_bucket, c.cohort
      FROM (SELECT DISTINCT t_bucket FROM bc) t
      CROSS JOIN (SELECT DISTINCT cohort FROM bc) c
    ), filled AS (
      SELECT g.cohort, g.t_bucket,
        coalesce(bc.n, 0) AS n, coalesce(bc.d, 0) AS d
      FROM grid g LEFT JOIN bc USING (cohort, t_bucket)
    ), tot AS (SELECT cohort, sum(n) AS total FROM filled GROUP BY 1
    ), ar AS (
      SELECT f.cohort, f.t_bucket, f.d,
        CAST(t.total - coalesce(sum(f.n) OVER (PARTITION BY f.cohort
          ORDER BY f.t_bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS nr
      FROM filled f JOIN tot t USING (cohort)
    ), c1 AS (SELECT min(CAST(cohort AS VARCHAR)) AS c1 FROM ps
    ), pb AS (
      SELECT ar.t_bucket,
        CAST(sum(CASE WHEN ar.cohort = c1.c1 THEN ar.nr ELSE 0 END)
          AS BIGINT) AS n1,
        CAST(sum(CASE WHEN ar.cohort = c1.c1 THEN ar.d ELSE 0 END)
          AS BIGINT) AS d1,
        CAST(sum(ar.nr) AS BIGINT) AS n, CAST(sum(ar.d) AS BIGINT) AS d
      FROM ar CROSS JOIN c1 GROUP BY 1
    ), terms AS (
      SELECT t_bucket, d1,
        CAST(d1 AS DOUBLE) - CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE)
          / CAST(n AS DOUBLE) AS u,
        CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE) AS e1,
        CASE WHEN n > 1 THEN
          CAST(d AS DOUBLE) * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
            * ((CAST(n AS DOUBLE) - CAST(n1 AS DOUBLE)) / CAST(n AS DOUBLE))
            * ((CAST(n AS DOUBLE) - CAST(d AS DOUBLE))
               / (CAST(n AS DOUBLE) - 1.0e0))
          ELSE 0.0e0 END AS v
      FROM pb WHERE d > 0 AND n > 0
    ), folded AS (
      SELECT t_bucket,
        sum(u) OVER (ORDER BY t_bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS uSum,
        sum(e1) OVER (ORDER BY t_bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS eSum,
        sum(v) OVER (ORDER BY t_bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vSum,
        sum(d1) OVER (ORDER BY t_bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS oSum
      FROM terms
    )
    SELECT c1.c1 AS cohort_1, CAST(f.oSum AS BIGINT) AS obs_1,
      round(f.eSum, 6) AS exp_1,
      CASE WHEN f.vSum > 0 THEN round(f.uSum * f.uSum / f.vSum, 6)
        ELSE 0.0e0 END AS chi2
    FROM folded f CROSS JOIN c1
    ORDER BY f.t_bucket DESC LIMIT 1"""

  /** DuckDB twin — identical bucketing, risk-set arithmetic and ln/exp
    * fold order. `perSubjectSql` must select `(duration [BIGINT],
    * event [0/1])`. */
  def sqlKaplanMeier(perSubjectSql: String, bucketUs: Long): String = s"""
    WITH ps AS ($perSubjectSql), b AS (
      SELECT CAST(duration // $bucketUs AS BIGINT) AS t_bucket,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(event) AS BIGINT) AS d,
        CAST(count(*) - sum(event) AS BIGINT) AS censored
      FROM ps GROUP BY 1
    ), t AS (SELECT sum(n) AS total FROM b), r AS (
      SELECT b.t_bucket, b.d, b.censored,
        CAST(t.total - coalesce(sum(b.n) OVER (ORDER BY b.t_bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS at_risk,
        b.n
      FROM b CROSS JOIN t
    )
    , f AS (
      SELECT t_bucket, d, censored, at_risk,
        1.0e0 - CAST(d AS DOUBLE) / CAST(at_risk AS DOUBLE) AS term
      FROM r WHERE d > 0
    )
    SELECT t_bucket, d, censored, at_risk,
      CASE WHEN max(CASE WHEN term <= 0 THEN 1 ELSE 0 END)
          OVER (ORDER BY t_bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
        THEN 0.0e0
        ELSE round(exp(sum(CASE WHEN term > 0 THEN ln(term) ELSE 0.0e0 END)
          OVER (ORDER BY t_bucket
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6)
      END AS survival
    FROM f"""

  /** COMPETING RISKS — the Aalen–Johansen cumulative incidence the KM
    * family silently needs whenever MORE THAN ONE event can end a
    * subject's clock (churn-by-cancel vs churn-by-upgrade, convert vs
    * bounce): treating cause 2 as "censoring" when estimating cause 1
    * BIASES the KM complement upward (1 − KM overstates every cause —
    * the classic competing-risks error). Aalen–Johansen fixes it:
    *
    *   CIF_k(t) = Σ_{tᵢ ≤ t} S(tᵢ⁻) · d_{k,i} / n_i
    *
    * with S the ALL-CAUSE KM — each cause's incidence is weighted by
    * the probability of still being around to have it, and
    * CIF₁ + CIF₂ + S = 1 at every bucket (the sanity identity the
    * spec pins).
    *
    * Determinism/scale — the [[kaplanMeier]] recipe exactly: coarse
    * bucket axis bounds every window, risk set from one running sum,
    * S(t⁻) via the ln-fold with the sticky-zero guard over STRICTLY
    * EARLIER buckets, CIFs as ordered cumulative sums over the
    * bounded axis. `event` takes 0 = censored, 1 = cause one,
    * 2 = cause two. Output per all-cause-event bucket: `(t_bucket,
    * at_risk, d1, d2, surv_prev (6dp), cif_1 (6dp), cif_2 (6dp))`. */
  def competingRisks(perSubject: DataFrame, durationCol: String,
                     eventCol: String, bucketUs: Long): DataFrame = {
    require(bucketUs > 0)
    val byBucket = perSubject
      .select((col(durationCol) / bucketUs).cast("long").as("t_bucket"),
        col(eventCol).cast("int").as("__e"))
      .groupBy(col("t_bucket"))
      .agg(count(lit(1)).as("__n"),
        sum((col("__e") === 1).cast("long")).as("d1"),
        sum((col("__e") === 2).cast("long")).as("d2"))
    val total = byBucket.agg(sum(col("__n")).as("__total"))
    val wPrev = Window.orderBy(col("t_bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCum = Window.orderBy(col("t_bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    def d(c: Column) = c.cast("double")
    val withRisk = byBucket.crossJoin(broadcast(total))
      .withColumn("at_risk",
        col("__total") - coalesce(sum(col("__n")).over(wPrev), lit(0L)))
      .filter(col("d1") + col("d2") > 0)
      .withColumn("__term", lit(1.0) -
        d(col("d1") + col("d2")) / d(col("at_risk")))
      .withColumn("__zeroPrev",
        coalesce(max((col("__term") <= 0).cast("int")).over(wPrev),
          lit(0)))
      .withColumn("__survPrev",
        when(col("__zeroPrev") === 1, lit(0.0))
          .otherwise(exp(coalesce(
            sum(when(col("__term") > 0, log(col("__term")))
              .otherwise(lit(0.0))).over(wPrev), lit(0.0)))))
    withRisk
      .withColumn("cif_1", round(sum(
        col("__survPrev") * d(col("d1")) / d(col("at_risk"))).over(wCum),
        6))
      .withColumn("cif_2", round(sum(
        col("__survPrev") * d(col("d2")) / d(col("at_risk"))).over(wCum),
        6))
      .select(col("t_bucket"), col("at_risk"), col("d1"), col("d2"),
        round(col("__survPrev"), 6).as("surv_prev"),
        col("cif_1"), col("cif_2"))
  }

  /** DuckDB twin of [[competingRisks]]: `perSubjectSql` must select
    * `(duration [BIGINT], event [0/1/2])`. */
  def sqlCompetingRisks(perSubjectSql: String, bucketUs: Long): String = s"""
    WITH ps AS ($perSubjectSql), b AS (
      SELECT CAST(duration // $bucketUs AS BIGINT) AS t_bucket,
        CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CASE WHEN event = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        CAST(sum(CASE WHEN event = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2
      FROM ps GROUP BY 1
    ), t AS (SELECT sum(n) AS total FROM b), r AS (
      SELECT b.t_bucket, b.d1, b.d2,
        CAST(t.total - coalesce(sum(b.n) OVER (ORDER BY b.t_bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
          AS BIGINT) AS at_risk
      FROM b, t
    ), f AS (
      SELECT t_bucket, d1, d2, at_risk,
        1.0e0 - CAST(d1 + d2 AS DOUBLE) / CAST(at_risk AS DOUBLE) AS term
      FROM r WHERE d1 + d2 > 0
    ), s AS (
      SELECT t_bucket, d1, d2, at_risk,
        CASE WHEN coalesce(max(CASE WHEN term <= 0 THEN 1 ELSE 0 END)
            OVER (ORDER BY t_bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) = 1
          THEN 0.0e0
          ELSE exp(coalesce(
            sum(CASE WHEN term > 0 THEN ln(term) ELSE 0.0e0 END)
            OVER (ORDER BY t_bucket
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0e0))
        END AS surv_prev
      FROM f
    )
    SELECT t_bucket, at_risk, d1, d2, round(surv_prev, 6) AS surv_prev,
      round(sum(surv_prev * CAST(d1 AS DOUBLE) / CAST(at_risk AS DOUBLE))
        OVER (ORDER BY t_bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cif_1,
      round(sum(surv_prev * CAST(d2 AS DOUBLE) / CAST(at_risk AS DOUBLE))
        OVER (ORDER BY t_bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS cif_2
    FROM s"""
}
