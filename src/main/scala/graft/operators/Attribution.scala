package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MARKOV-CHAIN ATTRIBUTION — data-driven multi-touch credit via
  * REMOVAL EFFECTS (Anderl et al. 2014, the model behind every
  * "Markov attribution" marketing product): model user journeys as a
  * first-order chain over touchpoint states with absorbing CONV/NULL,
  * ask per channel "how much conversion probability disappears if
  * this channel's state is deleted", and split credit by those
  * removal effects. Last-touch (the attribution join, D68) gives the
  * closer all the credit; removal effects give assist channels their
  * causal share — a different answer by construction.
  *
  * Two-tier shape (the [[graft.text.Bpe]] decomposition):
  *  1. CORPUS-SIZED, distributed: journeys → transition counts. One
  *     per-user lag window (cut at first conversion, tail absorbed to
  *     NULL), one hash agg → a (states+2)² table, states = the
  *     bounded event-type axis (`require`d ≤ 64).
  *  2. BOUNDED, driver-side: absorption probabilities by `k`-step
  *     integer mass propagation (scale 10¹² grid, per-edge flow
  *     `mass·n DIV out` — [[graft.graph.PageRank]]'s BIGINT
  *     convention), once for the full chain and once per removed
  *     channel (mass bound for a removed state is diverted to NULL).
  *     Pure 64-bit integer arithmetic, so the DuckDB twin — the same
  *     iteration unrolled as a WITH chain over the same counts —
  *     reproduces every mass bit-for-bit and the whole operator sits
  *     under the exact oracle. Truncating division loses ≤ 1 mass
  *     unit per edge-step IDENTICALLY in both engines (a definition,
  *     not an approximation).
  *
  * Overflow: mass ≤ scale = 10¹², transition counts n ≤ out ≤
  * 9.2e18/10¹² ≈ 9.2e6 per state; hotter graphs down-scale counts
  * (only proportions matter). */
object Attribution {

  private val Start = "__start"
  private val Conv = "__conv"
  private val Null = "__null"

  /** Journey transition counts `(src, dst, n)` over per-`idCol`
    * event sequences ordered by (`tsCol`, `evIdCol`): START → first
    * touch, touch → touch, touch → CONV at the first `convValue` of
    * `stateCol` (journey ends there), last touch → NULL when no
    * conversion. */
  def transitions(events: DataFrame, idCol: String, tsCol: String,
                  evIdCol: String, stateCol: String,
                  convValue: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(tsCol), col(evIdCol))
    val staged = events
      .select(col(idCol), col(tsCol), col(evIdCol),
        when(col(stateCol) === convValue, Conv)
          .otherwise(col(stateCol)).as("__st"))
      .withColumn("__cpos",
        min(when(col("__st") === Conv,
          struct(col(tsCol), col(evIdCol)))).over(
          Window.partitionBy(col(idCol))))
      // keep everything up to and including the first conversion
      .filter(col("__cpos").isNull ||
        struct(col(tsCol), col(evIdCol)) <= col("__cpos"))
    val withPrev = staged
      .withColumn("__prev", lag(col("__st"), 1, Start).over(w))
      .withColumn("__next", lead(col("__st"), 1).over(w))
    val steps = withPrev.select(col("__prev").as("src"),
      col("__st").as("dst"))
    val tails = withPrev
      .filter(col("__next").isNull && col("__st") =!= Conv)
      .select(col("__st").as("src"), lit(Null).as("dst"))
    steps.union(tails)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
  }

  /** The `k`-step integer absorption mass at CONV for one variant:
    * `removed = None` is the full chain; `Some(c)` diverts all mass
    * bound for state `c` to NULL. Pure Long arithmetic — the exact
    * mirror of the SQL twin's unrolled chain. */
  private[operators] def convMass(
      edges: Seq[(String, String, Long)], k: Int, scale: Long,
      removed: Option[String]): Long = {
    val remapped = edges.map { case (s, d, n) =>
      (s, if (removed.contains(d)) Null else d, n) }
    val out = remapped.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var mass = Map(Start -> scale)
    for (_ <- 1 to k) {
      val next = scala.collection.mutable.Map.empty[String, Long]
      // states with no out-edges retain their mass (CONV/NULL are
      // never sources by construction — this is the absorbing rule,
      // and the exact mirror of the SQL twin's LEFT JOIN step)
      mass.foreach { case (st, m) =>
        if (!out.contains(st)) next(st) = next.getOrElse(st, 0L) + m
        else remapped.foreach { case (s, d, n) =>
          if (s == st) next(d) = next.getOrElse(d, 0L) + m * n / out(st)
        }
      }
      mass = next.toMap
    }
    mass.getOrElse(Conv, 0L)
  }

  /** Removal-effect attribution over journey events. Output: one row
    * per non-absorbing channel, `(channel, p_conv, p_conv_removed,
    * removal_effect, share)` (6 dp), ordered facts — p_conv repeats
    * the full-chain absorption for context. */
  def removalEffects(events: DataFrame, idCol: String, tsCol: String,
                     evIdCol: String, stateCol: String, convValue: String,
                     k: Int = 12, scale: Long = 1000000000000L,
                     maxStates: Int = 64): DataFrame = {
    val spark = events.sparkSession
    val t = transitions(events, idCol, tsCol, evIdCol, stateCol, convValue)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .toSeq
    val channels = (t.map(_._1) ++ t.map(_._2)).distinct
      .filterNot(Set(Start, Conv, Null)).sorted
    require(channels.length <= maxStates,
      s"state axis ${channels.length} exceeds maxStates=$maxStates")
    val base = convMass(t, k, scale, None)
    require(base > 0, "no conversions reach CONV within k steps")
    // effects on the 1e-6 integer grid BEFORE the share division, so
    // the share denominator is an exact BIGINT sum (order-free) in
    // both engines
    val effects = channels.map { c =>
      val pc = convMass(t, k, scale, Some(c))
      val effMicro = math.max(0L, math.floor(
        (1.0 - pc.toDouble / base.toDouble) * 1e6 + 0.5).toLong)
      (c, effMicro, pc)
    }
    val totalMicro = effects.map(_._2).sum
    import spark.implicits._
    effects.map { case (c, effMicro, pc) =>
      (c, math.floor(base.toDouble / scale * 1e6 + 0.5) / 1e6,
        math.floor(pc.toDouble / scale * 1e6 + 0.5) / 1e6,
        effMicro.toDouble / 1e6,
        if (totalMicro == 0L) 0.0
        else math.floor(effMicro.toDouble / totalMicro.toDouble * 1e6
          + 0.5) / 1e6)
    }.toDF("channel", "p_conv", "p_conv_removed", "removal_effect",
      "share")
  }

  /** DuckDB twin of [[removalEffects]]: `eventsSql` must select
    * `(id, ts, eid, st)`; `channels` must list the non-absorbing
    * states present in the data (sorted — the Spark side derives the
    * same list from the bounded state axis). */
  def sqlRemovalEffects(eventsSql: String, convValue: String,
                        channels: Seq[String], k: Int = 12,
                        scale: Long = 1000000000000L): String = {
    val variants = None +: channels.map(Some(_))
    def tag(v: Option[String]) = v.map(c => s"r${channels.indexOf(c)}")
      .getOrElse("base")
    val head = s"""
    WITH ev AS (
      SELECT id, ts, eid,
        CASE WHEN st = '$convValue' THEN '$Conv' ELSE st END AS st
      FROM ($eventsSql)
    ), cut AS (
      SELECT id, ts, eid, st FROM (
        SELECT id, ts, eid, st,
          min(CASE WHEN st = '$Conv' THEN struct_pack(t := ts, e := eid)
            END) OVER (PARTITION BY id) AS cpos
        FROM ev)
      WHERE cpos IS NULL OR struct_pack(t := ts, e := eid) <= cpos
    ), seq AS (
      SELECT id, st,
        coalesce(lag(st) OVER (PARTITION BY id ORDER BY ts, eid),
          '$Start') AS prev,
        lead(st) OVER (PARTITION BY id ORDER BY ts, eid) AS nxt
      FROM cut
    ), tr AS MATERIALIZED (
      SELECT src, dst, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT prev AS src, st AS dst FROM seq
        UNION ALL
        SELECT st AS src, '$Null' AS dst FROM seq
        WHERE nxt IS NULL AND st <> '$Conv')
      GROUP BY src, dst)"""
    val chains = variants.map { v =>
      val vt = tag(v)
      val remap = v.map(c =>
        s"CASE WHEN dst = '$c' THEN '$Null' ELSE dst END").getOrElse("dst")
      val edges = s"""
      e_$vt AS MATERIALIZED (
        SELECT src, $remap AS dst, n,
          CAST(sum(n) OVER (PARTITION BY src) AS BIGINT) AS out
        FROM tr),
      m${vt}_0 AS (SELECT '$Start' AS st, CAST($scale AS BIGINT) AS m)"""
      // single reference to the previous step (double references
      // inline EXPONENTIALLY in DuckDB): a LEFT JOIN keeps the mass
      // of out-edge-less states in place — the absorbing rule, since
      // CONV/NULL are never sources by construction
      val steps = (1 to k).map { i =>
        s"""
      m${vt}_$i AS (
        SELECT st, CAST(sum(m) AS BIGINT) AS m FROM (
          SELECT coalesce(e.dst, p.st) AS st,
            CASE WHEN e.src IS NULL THEN p.m
              ELSE (p.m * e.n) // e.out END AS m
          FROM m${vt}_${i - 1} p LEFT JOIN e_$vt e ON p.st = e.src)
        GROUP BY st)"""
      }.mkString(",")
      val fin = s"""
      c_$vt AS (SELECT coalesce(
        (SELECT m FROM m${vt}_$k WHERE st = '$Conv'), 0) AS m)"""
      s"$edges,$steps,$fin"
    }.mkString(",")
    val rows = channels.map { c =>
      val vt = tag(Some(c))
      s"""
      SELECT '$c' AS channel,
        floor(CAST(b.m AS DOUBLE) / ${scale}e0 * 1e6 + 0.5e0) / 1e6
          AS p_conv,
        floor(CAST(r.m AS DOUBLE) / ${scale}e0 * 1e6 + 0.5e0) / 1e6
          AS p_conv_removed,
        greatest(0, CAST(floor((1e0 - CAST(r.m AS DOUBLE)
          / CAST(b.m AS DOUBLE)) * 1e6 + 0.5e0) AS BIGINT)) AS eff_micro
      FROM c_base b, c_$vt r"""
    }.mkString(" UNION ALL ")
    s"""$head,$chains, allrows AS ($rows),
    tot AS (SELECT CAST(sum(eff_micro) AS BIGINT) AS te FROM allrows)
    SELECT channel, p_conv, p_conv_removed,
      CAST(eff_micro AS DOUBLE) / 1e6 AS removal_effect,
      CASE WHEN te = 0 THEN 0e0
        ELSE floor(CAST(eff_micro AS DOUBLE) / CAST(te AS DOUBLE)
          * 1e6 + 0.5e0) / 1e6 END AS share
    FROM allrows, tot"""
  }
}
