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

  /** DuckDB twin — identical bucketing, risk-set arithmetic and ln/exp
    * fold order. `perSubjectSql` must select `(duration [BIGINT],
    * event [0/1])`. */
  def sqlKaplanMeier(perSubjectSql: String, bucketUs: Long): String = s"""
    WITH ps AS ($perSubjectSql), b AS (
      SELECT CAST(duration // $bucketUs AS BIGINT) AS t_bucket,
        count(*) AS n, sum(event) AS d, count(*) - sum(event) AS censored
      FROM ps GROUP BY 1
    ), t AS (SELECT sum(n) AS total FROM b), r AS (
      SELECT b.t_bucket, b.d, b.censored,
        t.total - coalesce(sum(b.n) OVER (ORDER BY b.t_bucket
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS at_risk,
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
}
