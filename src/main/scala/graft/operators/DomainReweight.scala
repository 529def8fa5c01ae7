package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DOMAIN REWEIGHTING, DoReMi-style (Xie et al. 2023) — the mixture
  * half the curation stack chooses weights WITH instead of by hand:
  * DoReMi trains a proxy model under Group DRO and reads the domain
  * weights off the exponentiated-gradient ascent on per-domain excess
  * loss. This operator is the deterministic surrogate of that outer
  * loop: given per-domain PROXY LOSSES (any upstream signal — KN
  * cross-entropy, 1 − quality, a held-out proxy-model loss), iterate
  *
  *   w ← smooth · uniform + (1 − smooth) ·
  *         normalize(w · exp(η · excess_d)),
  *   excess_d = loss_d − Σ w·loss / Σ w
  *
  * for a FIXED round count. Domains losing more than the current
  * mixture average gain weight — the DRO direction — while the
  * uniform smoothing keeps every domain sampled (DoReMi's ε-mixing).
  *
  * Determinism (§5.3): losses enter as 1e-6 integer grid values;
  * weights live on a 1e-9 integer grid. Per round the only float step
  * is the exp factor (one fixed IEEE sequence per domain, quantized
  * straight back to the integer grid); every sum/normalization is
  * exact BIGINT with truncating DIV — so the fixed rounds unroll
  * bit-exactly into the DuckDB oracle. The exponent is shifted by the
  * MAX loss rather than the mixture mean — additive shifts cancel in
  * the normalization, and max-shifting pins every factor ≤ 1, so the
  * integer grid can never overflow regardless of η or the loss gap
  * (the mean-shifted form blows up as w·e^{η·gap}).
  *
  * Scale: the loss table is DOMAIN-sized (tens to hundreds of rows);
  * every round is two 1-row aggregates and a projection over it —
  * cost is independent of the corpus that produced the losses. */
object DomainReweight {

  /** Iterate `rounds` exponentiated-gradient updates over
    * `losses(domainCol, lossMicroCol)` (loss on the 1e-6 integer
    * grid, BIGINT). Returns `(domainCol, weight_nano, weight)` —
    * nano-grid BIGINT and its 6-dp double view. */
  def reweight(losses: DataFrame, domainCol: String, lossMicroCol: String,
               rounds: Int, eta: Double = 1.0,
               smooth: Double = 0.1): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    require(eta > 0, s"eta must be positive: $eta")
    require(smooth >= 0 && smooth < 1, s"smooth must be in [0,1): $smooth")
    val base = losses.select(col(domainCol),
      col(lossMicroCol).cast("bigint").as("__loss")).localCheckpoint()
    val k = base.count()
    require(k > 0, "reweight over an empty domain table")
    val sNano = math.round(smooth * 1e9)
    // max-shift computed once (the loss table is static per call)
    val maxLoss = base.agg(max(col("__loss"))).collect()(0).getLong(0)
    var w = base.withColumn("__w", lit(1000000000L / k))
    for (_ <- 0 until rounds) {
      // the ONE float step: exp of the max-shifted excess (≤ 0, so
      // the factor is ≤ 1 and the grid cannot overflow), quantized
      // straight back to the integer grid
      val mixed = w
        .withColumn("__raw", floor(col("__w").cast("double") *
          exp(lit(eta) * (col("__loss") - lit(maxLoss)).cast("double")
            / lit(1e6)) + lit(0.5)).cast("bigint"))
      val norm = mixed.crossJoin(broadcast(
          mixed.agg(sum(col("__raw")).as("__rs"))))
        .withColumn("__w",
          expr(s"((1000000000 - $sNano) * (__raw * 1000000000 DIV __rs)) " +
            s"DIV 1000000000 + $sNano DIV $k"))
        .select(col(domainCol), col("__loss"), col("__w"))
      w = norm.localCheckpoint()
    }
    w.select(col(domainCol), col("__w").as("weight_nano"),
      (col("__w").cast("double") / lit(1e9)).as("weight"))
  }

  /** DuckDB twin of [[reweight]] — the fixed rounds unrolled,
    * identical grid arithmetic. `lossesSql` must select
    * `(g, loss BIGINT micro-grid)`; the domain count k is derived
    * from the SAME input via a count CTE (the engine side counts the
    * losses frame too), so both sides share one definition and a
    * changed domain axis can never silently diverge the oracle. */
  def sqlReweight(lossesSql: String, rounds: Int,
                  eta: Double = 1.0, smooth: Double = 0.1): String = {
    require(rounds >= 1)
    val sNano = math.round(smooth * 1e9)
    val etaS = graft.functions.Noise.sqlDouble(eta)
    val head = s"""
      WITH base AS MATERIALIZED (SELECT g, CAST(loss AS BIGINT) AS loss
        FROM ($lossesSql)),
      kk AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS k FROM base),
      mx AS MATERIALIZED (SELECT CAST(max(loss) AS BIGINT) AS ml FROM base),
      w0 AS MATERIALIZED (SELECT g, loss,
        CAST(1000000000 // kk.k AS BIGINT) AS w FROM base CROSS JOIN kk)"""
    val iters = (1 to rounds).map { j =>
      val i = j - 1
      s"""
      m$j AS MATERIALIZED (SELECT w$i.g, w$i.loss,
        CAST(floor(CAST(w$i.w AS DOUBLE) *
          exp($etaS * CAST(w$i.loss - mx.ml AS DOUBLE)
            / 1e6) + 0.5e0) AS BIGINT) AS raw
        FROM w$i CROSS JOIN mx),
      r$j AS MATERIALIZED (SELECT CAST(sum(raw) AS BIGINT) AS rs FROM m$j),
      w$j AS MATERIALIZED (SELECT m$j.g, m$j.loss,
        CAST(((1000000000 - $sNano) * (m$j.raw * 1000000000 // r$j.rs))
          // 1000000000 + $sNano // kk.k AS BIGINT) AS w
        FROM m$j CROSS JOIN r$j CROSS JOIN kk)"""
    }.mkString(",")
    s"""$head,$iters
    SELECT g, w AS weight_nano,
      CAST(w AS DOUBLE) / 1e9 AS weight
    FROM w$rounds"""
  }
}
