package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ASSOCIATION RULES (pairwise market basket) — support, confidence
  * and LIFT for item pairs that share a basket:
  *
  *   support(a→b) = P(a, b),  confidence(a→b) = P(b | a),
  *   lift(a→b) = P(a, b) / (P(a)·P(b))
  *
  * Confidence alone crowns whatever co-occurs with popular items
  * (everything "implies" the bestseller); lift divides that base rate
  * away, which is why every rule miner ranks on it. Pairwise rules
  * are the workhorse tier — the classic Apriori generalization to
  * longer itemsets multiplies cost for sharply diminishing retail
  * value, and the pair tier is what recommendation backfills consume.
  *
  * Scale shape: one DISTINCT (basket, item) projection, a per-basket
  * pair join bounded by basket size (C(items-per-basket, 2) — the
  * [[graft.graph.Triangles.coOccurrenceEdges]] argument; cap wide
  * baskets upstream), vocabulary-sized item-count joins, a 1-row
  * basket total broadcast. `minPairs` prunes the rule tail BEFORE the
  * joins. No windows over the corpus; the final top-k ranks the
  * RULE axis.
  *
  * Determinism: counts exact BIGINT; support/confidence/lift one
  * fixed IEEE sequence each, 6-dp rounded; rank on (lift 6dp DESC,
  * antecedent, consequent) — the robust_z rounding convention. Both
  * rule directions are emitted (same lift, different confidence).
  * Output: `(antecedent, consequent, n_pair, support, confidence,
  * lift, rank)`. */
object MarketBasket {

  def rules(df: DataFrame, basketCol: String, itemCol: String,
            minPairs: Long = 2, k: Int = 50): DataFrame = {
    require(minPairs >= 1 && k >= 1)
    val items = df.select(col(basketCol).as("__b"), col(itemCol).as("__i"))
      .distinct()
    val nBaskets = items.select(col("__b")).distinct().count()
    require(nBaskets > 0, "no baskets")
    val itemCnt = items.groupBy(col("__i")).agg(count(lit(1)).as("__ci"))
    val l = items.select(col("__b"), col("__i").as("__ia"))
    val r = items.select(col("__b").as("__b2"), col("__i").as("__ib"))
    val pairs = l.join(r, col("__b") === col("__b2") &&
        col("__ia") < col("__ib"))
      .groupBy(col("__ia"), col("__ib"))
      .agg(count(lit(1)).as("__cp"))
      .filter(col("__cp") >= minPairs)
    // both directions: a→b and b→a (same pair count and lift,
    // different antecedent base — so different confidence)
    val directed = pairs
      .select(col("__ia").as("antecedent"), col("__ib").as("consequent"),
        col("__cp"))
      .union(pairs.select(col("__ib").as("antecedent"),
        col("__ia").as("consequent"), col("__cp")))
      .join(itemCnt.select(col("__i").as("antecedent"),
        col("__ci").as("__ca")), "antecedent")
      .join(itemCnt.select(col("__i").as("consequent"),
        col("__ci").as("__cb")), "consequent")
    def d(c: String) = col(c).cast("double")
    val n = lit(nBaskets.toDouble)
    val lift = round(d("__cp") * n / (d("__ca") * d("__cb")), 6)
    val w = Window.orderBy(col("lift").desc, col("antecedent"),
      col("consequent"))
    directed
      .withColumn("support", round(d("__cp") / n, 6))
      .withColumn("confidence", round(d("__cp") / d("__ca"), 6))
      .withColumn("lift", lift)
      .orderBy(col("lift").desc, col("antecedent"), col("consequent"))
      .limit(k)
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .select(col("antecedent"), col("consequent"),
        col("__cp").as("n_pair"), col("support"), col("confidence"),
        col("lift"), col("rank"))
  }

  /** DuckDB twin of [[rules]]: `basketsSql` must select `(b, i)` one
    * row per basket-item incidence (duplicates tolerated). */
  def sqlRules(basketsSql: String, minPairs: Long = 2, k: Int = 50):
      String = {
    def d(c: String) = s"CAST($c AS DOUBLE)"
    s"""
    WITH it AS (SELECT DISTINCT b, i FROM ($basketsSql)),
    nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS n FROM it),
    ic AS (SELECT i, CAST(count(*) AS BIGINT) AS ci FROM it GROUP BY i),
    pr AS (
      SELECT x.i AS ia, y.i AS ib, CAST(count(*) AS BIGINT) AS cp
      FROM it x JOIN it y ON x.b = y.b AND x.i < y.i
      GROUP BY x.i, y.i
      HAVING count(*) >= $minPairs
    ), dir AS (
      SELECT ia AS antecedent, ib AS consequent, cp FROM pr
      UNION ALL
      SELECT ib AS antecedent, ia AS consequent, cp FROM pr
    ), scored AS (
      SELECT dir.antecedent, dir.consequent, cp,
        round(${d("cp")} / ${d("n")}, 6) AS support,
        round(${d("cp")} / ${d("ca.ci")}, 6) AS confidence,
        round(${d("cp")} * ${d("n")} / (${d("ca.ci")} * ${d("cb.ci")}), 6)
          AS lift
      FROM dir
      JOIN ic ca ON dir.antecedent = ca.i
      JOIN ic cb ON dir.consequent = cb.i
      CROSS JOIN nb
    ), ranked AS (
      SELECT antecedent, consequent, cp AS n_pair, support, confidence,
        lift,
        CAST(row_number() OVER (ORDER BY lift DESC, antecedent,
          consequent) AS BIGINT) AS rank
      FROM scored)
    SELECT * FROM ranked WHERE rank <= $k"""
  }

  /** RECOMMENDER BACKTEST — the [[rules]] miner evaluated the only
    * honest way: rules are trained on baskets AT OR BEFORE a cutoff,
    * then each POST-cutoff basket item asks its top-lift rule for one
    * recommendation and scores a HIT when the recommended item really
    * sits in the same future basket. Training on the test period (or
    * evaluating on the training one) inflates hit rates exactly the
    * way leaked features inflate AUCs — the temporal split is the
    * operator, like [[Labels.churnLabels]] on the label side.
    *
    * Determinism/scale: the rule side is [[rules]]' bounded pair
    * machinery on the train slice; rec(a) = first by (lift 6dp DESC,
    * consequent) per antecedent — a total order; the eval is two
    * vocabulary-keyed joins against the distinct test incidence. One
    * summary row: `(n_rules, n_test_baskets, n_recs, n_hits,
    * hit_rate (6 dp))`. */
  def backtest(df: DataFrame, basketCol: String, itemCol: String,
               tsCol: String, cutoffTs: String,
               minPairs: Long = 2): DataFrame = {
    val cut = to_timestamp(lit(cutoffTs))
    val train = df.filter(col(tsCol) <= cut)
    val test = df.filter(col(tsCol) > cut)
      .select(col(basketCol).as("__tb"), col(itemCol).as("__ti"))
      .distinct()
    val ruleSet = rules(train, basketCol, itemCol, minPairs,
      k = Int.MaxValue)
    val w = Window.partitionBy(col("antecedent"))
      .orderBy(col("lift").desc, col("consequent"))
    val recs = ruleSet
      .withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1)
      .select(col("antecedent"), col("consequent").as("__rec"))
    val nRules = ruleSet.count()
    val nTestBaskets = test.select(col("__tb")).distinct().count()
    val scoredRecs = test
      .join(recs, col("__ti") === col("antecedent"))
      .join(test.select(col("__tb").as("__tb2"), col("__ti").as("__hit")),
        col("__tb") === col("__tb2") && col("__rec") === col("__hit"),
        "left")
      .agg(count(lit(1)).as("n_recs"),
        sum(col("__hit").isNotNull.cast("long")).as("n_hits"))
    def d(c: Column) = c.cast("double")
    scoredRecs.select(lit(nRules).as("n_rules"),
      lit(nTestBaskets).as("n_test_baskets"),
      col("n_recs"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
      round(coalesce(d(col("n_hits")), lit(0.0)) /
        greatest(d(col("n_recs")), lit(1.0)), 6).as("hit_rate"))
  }

  /** DuckDB twin of [[backtest]]: `basketsSql` must select
    * `(b, i, ts)` one row per incidence. */
  def sqlBacktest(basketsSql: String, cutoffTs: String,
                  minPairs: Long = 2): String = {
    val rulesSql = sqlRules(
      s"SELECT b, i FROM ($basketsSql) WHERE ts <= TIMESTAMP '$cutoffTs'",
      minPairs, k = Int.MaxValue)
    s"""
    WITH ruleset AS ($rulesSql),
    recs AS (
      SELECT antecedent, consequent AS rec FROM (
        SELECT antecedent, consequent,
          row_number() OVER (PARTITION BY antecedent
            ORDER BY lift DESC, consequent) AS r
        FROM ruleset)
      WHERE r = 1
    ), test AS (
      SELECT DISTINCT b, i FROM ($basketsSql)
      WHERE ts > TIMESTAMP '$cutoffTs'
    ), scored AS (
      SELECT t.b, t.i, recs.rec,
        CASE WHEN h.i IS NOT NULL THEN 1 ELSE 0 END AS hit
      FROM test t
      JOIN recs ON t.i = recs.antecedent
      LEFT JOIN test h ON h.b = t.b AND h.i = recs.rec)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM ruleset) AS n_rules,
      (SELECT CAST(count(DISTINCT b) AS BIGINT) FROM test)
        AS n_test_baskets,
      CAST(count(*) AS BIGINT) AS n_recs,
      CAST(coalesce(sum(hit), 0) AS BIGINT) AS n_hits,
      round(coalesce(CAST(sum(hit) AS DOUBLE), 0e0)
        / greatest(CAST(count(*) AS DOUBLE), 1e0), 6) AS hit_rate
    FROM scored"""
  }
}
