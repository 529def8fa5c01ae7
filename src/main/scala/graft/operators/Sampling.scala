package graft.operators

import graft.functions.Noise
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling — the training-data mixing
  * primitive (upsample rare languages, downsample boilerplate sources).
  * Unlike `DataFrameStatFunctions.sampleBy` (seeded `rand`, whose
  * stream depends on partitioning and engine), the keep decision is
  * `hashNoise(key, salt) < fraction(stratum)`: a pure projection +
  * filter over the row's own key, so it is
  *
  *  - reproducible: same key ⇒ same decision on any cluster layout,
  *    any engine — the property that makes a 100 TB sample re-runnable
  *    incrementally (appending new data never re-rolls old rows);
  *  - nested: the salt-`s` sample at 10% is a superset of the
  *    salt-`s` sample at 5% (threshold on the same noise), so sweeps
  *    over sampling rates reuse work;
  *  - oracle-able: the noise formula is engine-portable arithmetic
  *    (see graft.functions.Noise), so DuckDB can verify the exact
  *    sampled row set.
  *
  * No shuffle, no state: scales with the scan.
  */
object Sampling {

  /** Keep each row with probability `fractions(stratum)` (or
    * `defaultFraction` for unlisted strata), decided by keyed noise.
    * @param keyCol numeric row key driving the decision */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
                 fractions: Map[String, Double],
                 defaultFraction: Double = 0.0,
                 salt: Int = 7): DataFrame = {
    require((fractions.values ++ Seq(defaultFraction)).forall(f =>
      f >= 0.0 && f <= 1.0), "fractions must be in [0, 1]")
    // one FLAT CaseWhen, not a fold of nested when/otherwise — a
    // per-source fractions map can carry thousands of strata, and a
    // thousands-deep expression tree hits Catalyst's deep-tree
    // analysis/codegen pathologies
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val frac: Column =
      if (fractions.isEmpty) lit(defaultFraction)
      else column(org.apache.spark.sql.catalyst.expressions.CaseWhen(
        fractions.toSeq.map { case (k, f) =>
          expression(col(strataCol) === k) -> expression(lit(f))
        },
        Some(expression(lit(defaultFraction)))))
    df.filter(Noise.hashNoise(col(keyCol), salt) < frac)
  }

  /** Weighted DOMAIN-MIXTURE sampling — hit a target source mixture
    * (e.g. 40% web / 30% books / 30% code) with the largest corpus the
    * observed counts allow. Rates are DATA-DEPENDENT, unlike
    * [[stratified]]'s fixed fractions:
    *
    *   budget  = min over strata of count(s) / weight(s)
    *             (the largest total where every stratum can fill its
    *              share without upsampling)
    *   rate(s) = min(1, budget * weight(s) / count(s))
    *
    * so the binding stratum samples at 1.0 and the rest downsample to
    * match. Strata absent from `weights` are dropped. The keep decision
    * is the same keyed hash-noise as [[stratified]] — reproducible,
    * nested, engine-portable — and the rate arithmetic is plain IEEE
    * double division/multiplication in a FIXED order, so DuckDB
    * reproduces the exact sampled row set (see [[sqlMixture]]).
    *
    * Scale shape: one tiny groupBy over the strata column (hundreds of
    * rows at any corpus size), a scalar min, and a broadcast join of
    * the per-stratum rates — the corpus itself is only scanned and
    * filtered, never shuffled. */
  def mixture(df: DataFrame, keyCol: String, strataCol: String,
              weights: Map[String, Double], salt: Int = 11): DataFrame = {
    require(weights.nonEmpty, "weights must be non-empty")
    require(weights.values.forall(_ > 0.0), "weights must be positive")
    // per-stratum counts collect to the driver — bounded by |weights|
    // rows at any corpus size (the corpus itself is never collected).
    // Driver-side rate arithmetic uses the same IEEE ops in the same
    // order as sqlMixture's SQL, so the oracle still matches bit-exactly.
    val counts = df.filter(col(strataCol).isin(weights.keys.toSeq: _*))
      .groupBy(col(strataCol)).agg(count(lit(1)).as("__cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    // a weighted stratum with zero rows makes the target mixture
    // unsatisfiable (its share can never be filled) — fail loudly
    // rather than silently skewing the output toward present strata
    val missing = weights.keySet -- counts.keySet
    require(missing.isEmpty,
      s"mixture: weighted strata absent from data: ${missing.toSeq.sorted
        .mkString(", ")} — the target mixture cannot be satisfied")
    val budget = weights.map { case (k, w) => counts(k) / w }.min
    val rates = weights.map { case (k, w) =>
      (k, math.min(1.0, budget * w / counts(k)))
    }.toSeq
    import df.sparkSession.implicits._
    val ratesDf = rates.toDF(strataCol, "__rate")
    df.join(broadcast(ratesDf), strataCol)
      .filter(Noise.hashNoise(col(keyCol), salt) < col("__rate"))
      .withColumn("rate", round(col("__rate"), 6))
      .drop("__rate")
  }

  /** TEMPERATURE-SCALED mixture — the multilingual-pretraining
    * standard (mBERT/XLM-R/T5): sample sources proportional to
    * p_i^α with α = 1/2, upsampling low-resource sources relative to
    * their raw share without letting any single giant source dominate.
    * Equivalent to [[mixture]] with weights = √count_i (the mixture
    * only uses RELATIVE weights, so the p_i^α normalizer cancels).
    *
    * α is FIXED at 1/2 deliberately: √x is required by IEEE 754 to be
    * correctly rounded, so JVM `Math.sqrt` and DuckDB `sqrt` produce
    * identical bits and the rate boundary (`hashNoise < rate`) can
    * never disagree cross-engine — `pow(x, α)` for general α is only
    * 1-ulp-faithful, which is a structural hazard at a threshold.
    * Strata are taken from the data itself (every present stratum
    * participates). */
  def temperatureMixture(df: DataFrame, keyCol: String, strataCol: String,
                         salt: Int = 11): DataFrame = {
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol)).agg(count(lit(1)).as("__cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    require(counts.nonEmpty, "temperatureMixture: no strata present")
    val budget = counts.map { case (_, c) => c / math.sqrt(c) }.min
    val rates = counts.map { case (k, c) =>
      (k, math.min(1.0, budget * math.sqrt(c) / c))
    }.toSeq
    import df.sparkSession.implicits._
    val ratesDf = rates.toDF(strataCol, "__rate")
    df.join(broadcast(ratesDf), strataCol)
      .filter(Noise.hashNoise(col(keyCol), salt) < col("__rate"))
      .withColumn("rate", round(col("__rate"), 6))
      .drop("__rate")
  }

  /** DuckDB twin of [[temperatureMixture]] — identical √count weight,
    * budget and rate sequences computed in SQL. */
  def sqlTemperatureMixture(table: String, keyExpr: String,
                            strataExpr: String, extraCols: Seq[String],
                            salt: Int = 11): String = {
    val cols = (Seq(keyExpr, strataExpr) ++ extraCols).mkString(", ")
    s"""
      WITH __c AS (
        SELECT $strataExpr, CAST(count(*) AS DOUBLE) AS __cnt
        FROM $table WHERE $strataExpr IS NOT NULL GROUP BY $strataExpr
      ), __b AS (
        SELECT min(__cnt / sqrt(__cnt)) AS __budget FROM __c
      ), __r AS (
        SELECT $strataExpr,
          least(1.0e0, __budget * sqrt(__cnt) / __cnt) AS __rate
        FROM __c, __b)
      SELECT $cols, round(__rate, 6) AS rate
      FROM $table JOIN __r USING ($strataExpr)
      WHERE ${Noise.sqlNoise(keyExpr, salt)} < __rate"""
  }

  /** Deterministic EXACT-size uniform sample: the `k` rows with the
    * smallest keyed integer rank (ties broken by the key), so unlike
    * the fraction-based ops this returns exactly min(k, n) rows — the
    * "give me 10M held-out docs" shape. Re-runnable (same keys ⇒ same
    * sample on any layout) and oracle-able like the rest of the family.
    * The rank is [[Noise.intRank]] — pure BIGINT arithmetic, NOT the
    * sin()-based hashNoise the threshold samplers use: a top-k cut
    * makes the k-th rank a structural boundary, and JVM Math.sin vs a
    * host libm can disagree by 1 ulp there, whereas integer mod
    * arithmetic is bit-identical on every engine by construction. The
    * plan is TakeOrderedAndProject — per-partition top-k merged on the
    * driver side of the exchange, NEVER a global sort (asserted in
    * PlanQualitySpec). */
  def fixedSize(df: DataFrame, keyCol: String, k: Int,
                salt: Int = 13): DataFrame = {
    require(k >= 1)
    df.orderBy(Noise.intRank(col(keyCol), salt).asc, col(keyCol).asc)
      .limit(k)
  }

  /** DuckDB twin of [[fixedSize]]'s ORDER BY ... LIMIT clause. */
  def sqlFixedSize(keyExpr: String, k: Int, salt: Int = 13): String =
    s"ORDER BY ${Noise.sqlIntRank(keyExpr, salt)}, $keyExpr LIMIT $k"

  /** DuckDB twin of [[mixture]] as a full SELECT over `table`,
    * mirroring the rate arithmetic term-for-term (same division and
    * multiplication order — IEEE doubles are deterministic but not
    * associative). `extraCols` lists the passthrough columns. */
  def sqlMixture(table: String, keyExpr: String, strataExpr: String,
                 weights: Map[String, Double], extraCols: Seq[String],
                 salt: Int = 11): String = {
    val inList = weights.keys.toSeq.sorted
      .map(k => s"'${k.replace("'", "''")}'").mkString(", ")
    val wCase = weights.toSeq.sortBy(_._1).map { case (k, w) =>
      s"WHEN $strataExpr = '${k.replace("'", "''")}' THEN ${Noise.sqlDouble(w)}"
    }.mkString("CASE ", " ", " END")
    val cols = (Seq(keyExpr, strataExpr) ++ extraCols).mkString(", ")
    s"""
      WITH __c AS (
        SELECT $strataExpr, CAST(count(*) AS DOUBLE) AS __cnt, $wCase AS __w
        FROM $table WHERE $strataExpr IN ($inList) GROUP BY $strataExpr
      ), __b AS (SELECT min(__cnt / __w) AS __budget FROM __c),
      __r AS (
        SELECT $strataExpr, least(1.0e0, __budget * __w / __cnt) AS __rate
        FROM __c, __b)
      SELECT $cols, round(__rate, 6) AS rate
      FROM $table JOIN __r USING ($strataExpr)
      WHERE ${Noise.sqlNoise(keyExpr, salt)} < __rate"""
  }

  /** Split-name → exclusive integer upper bound on the bucket value,
    * shared by [[splitExpr]] and [[sqlSplitExpr]] so Spark and DuckDB
    * can never disagree on a boundary. Bounds come from cumulative
    * weights rounded onto the integer bucket grid; the LAST bound is
    * forced to `resolution` so the mapping is exhaustive even when the
    * float cumsum rounds to resolution - 1. */
  private def splitThresholds(splits: Seq[(String, Double)],
                              resolution: Int): Seq[(String, Long)] = {
    require(splits.nonEmpty, "splits must be non-empty")
    require(splits.map(_._1).distinct.size == splits.size,
      "split names must be distinct")
    require(splits.forall(_._2 > 0.0), "split weights must be positive")
    require(resolution >= splits.size,
      s"resolution $resolution cannot host ${splits.size} splits")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9,
      s"split weights must sum to 1, got $total")
    // intRank's modulus: buckets past it can never occur, and the mod
    // bias is ~resolution/modulus (negligible at the 1e4 default)
    require(resolution <= 1000000007,
      s"resolution $resolution exceeds the rank modulus 1e9+7")
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => math.round(c * resolution))
    val th = splits.map(_._1).zip(bounds.init :+ resolution.toLong)
    // a weight below the bucket grid rounds two bounds together and
    // would SILENTLY produce an empty split — fail loudly instead
    (0L +: th.map(_._2)).sliding(2).zip(th.iterator).foreach {
      case (Seq(lo, hi), (name, _)) => require(hi > lo,
        s"split '$name' (weight ${splits.find(_._1 == name).get._2}) " +
          s"rounds to zero buckets at resolution $resolution — raise " +
          "the resolution")
      case _ => ()
    }
    th
  }

  /** Deterministic TRAIN/VAL/TEST SPLIT assignment: maps the row's own
    * key to a named split via `intRank(key, salt) % resolution` against
    * cumulative integer thresholds. Pure BIGINT arithmetic end-to-end
    * (no libm, no RNG stream), which buys the three properties a
    * 100 TB corpus split needs:
    *
    *  - exhaustive + disjoint by construction — every row gets exactly
    *    one split, on any engine, bit-identically (oracle-able);
    *  - append-stable — the assignment is a function of the key alone,
    *    so growing the corpus never re-rolls an old row's split (a
    *    model trained on yesterday's `train` never sees tomorrow's
    *    re-shuffled `test`);
    *  - leakage-aware — key on a GROUP id (e.g.
    *    `graft_horner_hash(domain)`) and every row of the group lands
    *    in the same split, so near-duplicates within a crawl domain
    *    cannot straddle train/test.
    *
    * A NULL key yields a NULL split (never a silent pile-up in the
    * last split — the caller decides what a keyless row means); both
    * engines agree because the SQL twin carries the same guard.
    *
    * No shuffle, no state: a projection over the scan. Built as ONE
    * flat CaseWhen, not a nested when/otherwise fold — same
    * deep-tree rationale as [[stratified]]. */
  def splitExpr(key: Column, splits: Seq[(String, Double)],
                salt: Int = 17, resolution: Int = 10000): Column = {
    import org.apache.spark.sql.GraftColumnBridge.{column, expression}
    val th = splitThresholds(splits, resolution)
    val bucket = Noise.intRank(key, salt) % lit(resolution.toLong)
    val last: Column = when(key.isNotNull, lit(th.last._1))
    if (th.size == 1) last
    else column(org.apache.spark.sql.catalyst.expressions.CaseWhen(
      th.init.map { case (name, bound) =>
        expression(bucket < lit(bound)) -> expression(lit(name))
      },
      Some(expression(last))))
  }

  /** [[splitExpr]] as a DataFrame op: adds a `split` column. */
  def assignSplits(df: DataFrame, keyCol: String,
                   splits: Seq[(String, Double)],
                   salt: Int = 17, resolution: Int = 10000): DataFrame =
    df.withColumn("split", splitExpr(col(keyCol), splits, salt, resolution))

  /** LEAKAGE-SAFE split assignment — the composition the
    * [[splitExpr]] contract's "key on a GROUP id" clause prescribes,
    * done for the most common leak: EXACT-DUPLICATE documents
    * (identical normalized token streams) straddling train/test. Each
    * duplicate cluster elects a representative (min id over identical
    * normalized text — one hash aggregate, the skew-safe
    * first-occurrence shape) and every member inherits the REP's
    * split, so two copies of one document can never land on opposite
    * sides of the boundary (the classic eval-inflation leak). Output:
    * input columns + `cluster_rep` + `split`. Near-dup clusters:
    * pre-resolve with the MinHash family and key [[splitExpr]] on the
    * resolved cluster id instead — this operator owns the exact tier
    * because only it is oracle-able.
    *
    * Scale: one corpus hash agg on the normalized text + one equi-join
    * back on it (both partial/map-side-combinable); the split itself
    * stays a projection. Append-stable like splitExpr: new copies of
    * an old doc join the OLD cluster (smaller id wins) only if re-run
    * over the union — for incremental corpora persist cluster_rep and
    * reuse it. */
  def assignSplitsLeakageSafe(docs: DataFrame, idCol: String,
                              textCol: String,
                              splits: Seq[(String, Double)],
                              salt: Int = 17,
                              resolution: Int = 10000): DataFrame = {
    val norm = array_join(
      graft.text.TextFunctions.tokens(col(textCol)), " ")
    val reps = docs
      .select(col(idCol).as("__id"), norm.as("__norm"))
      .groupBy(col("__norm")).agg(min(col("__id")).as("cluster_rep"))
    docs.withColumn("__norm", norm)
      .join(reps, "__norm")
      .withColumn("split",
        splitExpr(col("cluster_rep"), splits, salt, resolution))
      .drop("__norm")
  }

  /** DuckDB twin of [[assignSplitsLeakageSafe]]: `docsSql` must
    * select `(id, text, ...)` with `id` the split key; emits
    * `id, cluster_rep, split`. */
  def sqlSplitLeakageSafe(docsSql: String, idCol: String,
                          splits: Seq[(String, Double)],
                          salt: Int = 17,
                          resolution: Int = 10000): String = s"""
    WITH d AS (
      SELECT $idCol AS id,
        array_to_string(list_filter(
          string_split_regex(lower(text), '\\s+'), x -> len(x) > 0),
          ' ') AS norm
      FROM ($docsSql)
    ), reps AS (
      SELECT norm, min(id) AS cluster_rep FROM d GROUP BY norm)
    SELECT d.id AS $idCol, reps.cluster_rep,
      ${sqlSplitExpr("reps.cluster_rep", splits, salt, resolution)}
        AS split
    FROM d JOIN reps ON d.norm = reps.norm"""

  /** DuckDB twin of [[splitExpr]] — same thresholds, same BIGINT
    * bucket arithmetic, term-for-term. */
  def sqlSplitExpr(keyExpr: String, splits: Seq[(String, Double)],
                   salt: Int = 17, resolution: Int = 10000): String = {
    val th = splitThresholds(splits, resolution)
    def q(s: String) = s"'${s.replace("'", "''")}'"
    // null-key guard mirrors splitExpr: NULL key → NULL split (a bare
    // CASE with no ELSE yields NULL in both engines)
    val last = s"(CASE WHEN $keyExpr IS NOT NULL THEN ${q(th.last._1)} END)"
    if (th.size == 1) last
    else {
      val bucket = s"(${Noise.sqlIntRank(keyExpr, salt)} % $resolution)"
      val whens = th.init.map { case (name, bound) =>
        s"WHEN $bucket < $bound THEN ${q(name)}"
      }.mkString(" ")
      s"(CASE $whens ELSE $last END)"
    }
  }

  /** DuckDB twin of [[stratified]]'s predicate, for oracle SQL.
    * Stratum keys are SQL-escaped; an empty map degenerates to the
    * bare default literal (CASE with zero WHENs is invalid SQL). */
  def sqlPredicate(keyExpr: String, strataExpr: String,
                   fractions: Map[String, Double],
                   defaultFraction: Double = 0.0, salt: Int = 7): String = {
    val fracSql =
      if (fractions.isEmpty) Noise.sqlDouble(defaultFraction)
      else {
        val cases = fractions.toSeq.sortBy(_._1).map { case (k, f) =>
          s"WHEN $strataExpr = '${k.replace("'", "''")}' THEN ${Noise.sqlDouble(f)}"
        }.mkString(" ")
        s"(CASE $cases ELSE ${Noise.sqlDouble(defaultFraction)} END)"
      }
    s"(${Noise.sqlNoise(keyExpr, salt)} < $fracSql)"
  }

  /** WEIGHTED sampling: probability-proportional-to-size SYSTEMATIC
    * sampling (the survey-statistics PPS design) in pure BIGINT
    * arithmetic — the weighted counterpart of [[fixedSize]]. Rows are
    * laid on a deterministic pseudo-random circle (ordered by
    * [[Noise.intRank]] — portable integer hashing, no libm at the
    * structural boundary), each occupying an arc of its integer
    * weight; k equally-spaced grid points pick the sample. Inclusion
    * expectation is EXACTLY k·w/W for w ≤ W/k, heavier rows can be
    * picked multiple times (`n_picks` — use it as a repetition count
    * or cap weights upstream), and Σ n_picks = k always.
    *
    * Why not Efraimidis–Spirakis (u^(1/w) top-k): its boundary is a
    * pow()/sin() float comparison — exactly the 1-ulp engine
    * divergence [[fixedSize]]'s doc rules out at a structural top-k
    * cut. Here EVERY quantity (rank, prefix sum, grid test) is exact
    * BIGINT, so the sampled set is bit-portable by construction.
    *
    * Scale shape: the corpus-wide prefix sum uses the same two-level
    * scheme as EpochShuffle — bounded per-bucket windows + an
    * nBuckets-row offset window broadcast back; no global sort, no
    * single-partition window. k·W must fit in 64 bits (document counts
    * × byte weights at 100 TB can overflow — pre-divide weights or
    * lift the two multiplications to DECIMAL(38,0) then).
    *
    * @param weightCol positive integer-valued weight (clamped to ≥ 1)
    */
  def ppsSystematic(df: DataFrame, keyCol: String, weightCol: String,
                    k: Int, salt: Int = 19,
                    nBuckets: Int = 1024): DataFrame = {
    require(k >= 1)
    import org.apache.spark.sql.expressions.Window
    val w = greatest(col(weightCol).cast("long"), lit(1L))
    val ranked = df
      .withColumn("__w", w)
      .withColumn("__rank", Noise.intRank(col(keyCol), salt))
      .withColumn("__bkt", pmod(col("__rank"), lit(nBuckets.toLong)))
    val intraW = Window.partitionBy(col("__bkt"))
      .orderBy(col("__rank"), col(keyCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offW = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val buckets = ranked.groupBy(col("__bkt"))
      .agg(sum(col("__w")).as("__bw"))
    val offsets = buckets
      .withColumn("__off", coalesce(sum(col("__bw")).over(offW), lit(0L)))
      .select(col("__bkt"), col("__off"))
    val total = buckets.agg(sum(col("__bw")).as("__tw"))
    // inclusive global prefix in (bucket, rank, key) order
    val withCum = ranked
      .withColumn("__intra", sum(col("__w")).over(intraW))
      .join(broadcast(offsets), "__bkt")
      .crossJoin(broadcast(total))
      .withColumn("__cum", col("__off") + col("__intra"))
    // grid points j·W/k, j ∈ [0, k): row holds those j with
    // k·(cum−w) ≤ j·W < k·cum  ⇒  picks = ceil(k·cum/W) − ceil(k·(cum−w)/W).
    // ceil(a/b) = (a + b − 1) div b — `div` is Spark's INTEGER division
    // on longs (the `/` operator would go through double and lose
    // exactness past 2⁵³).
    val kL = lit(k.toLong)
    withCum
      .withColumn("__n1", kL * col("__cum") + col("__tw") - lit(1L))
      .withColumn("__n0",
        kL * (col("__cum") - col("__w")) + col("__tw") - lit(1L))
      .withColumn("n_picks", expr("(__n1 div __tw) - (__n0 div __tw)"))
      .where(col("n_picks") >= 1)
      .drop("__w", "__rank", "__bkt", "__intra", "__off", "__tw",
        "__cum", "__n1", "__n0")
  }

  /** DuckDB twin of [[ppsSystematic]]: naive single-window prefix (fine
    * at oracle scale), identical BIGINT grid arithmetic. `cols` are the
    * passthrough output columns. */
  def sqlPps(table: String, keyExpr: String, weightExpr: String, k: Int,
             cols: Seq[String], salt: Int = 19,
             nBuckets: Int = 1024): String = {
    val r = Noise.sqlIntRank(keyExpr, salt)
    val colList = cols.mkString(", ")
    s"""
      WITH pre AS (
        SELECT $colList,
          greatest(CAST($weightExpr AS BIGINT), 1) AS w,
          CAST(sum(greatest(CAST($weightExpr AS BIGINT), 1)) OVER (
            ORDER BY ($r) % $nBuckets, $r, $keyExpr
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS cum
        FROM $table
      ), tot AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM pre)
      SELECT $colList,
        CAST(((($k * cum) + tw - 1) // tw)
           - ((($k * (cum - w)) + tw - 1) // tw) AS BIGINT) AS n_picks
      FROM pre, tot
      WHERE ((($k * cum) + tw - 1) // tw)
          - ((($k * (cum - w)) + tw - 1) // tw) >= 1"""
  }

  /** WEIGHT DIAGNOSTICS — the numbers read BEFORE trusting any
    * weighted selection above ([[ppsSystematic]], [[mixture]], DSIR
    * importance weights): effective sample size ESS = (Σw)²/Σw², its
    * ratio to n (1 = uniform weights, → 0 = a few rows dominate), and
    * the largest single-row weight share. An importance-weighted
    * corpus with ESS/n = 0.01 is a 100× smaller dataset wearing a big
    * one's row count — the classic silent failure of importance
    * sampling, caught here with one grouped pass.
    *
    * Determinism: weights fold on the exact DECIMAL(18,2) grid (Σw,
    * Σw² and max are order-insensitive exact aggregates); the three
    * ratios are final fixed double sequences. Negative/null weights
    * are excluded (a weight is a nonnegative multiplier by
    * definition; documented, not silent — `n_dropped` reports them).
    * Output per group: `(groupCols…, n, n_dropped, ess (6dp),
    * ess_ratio (6dp), max_share (6dp))`. */
  def weightDiagnostics(df: DataFrame, weightCol: String,
                        groupCols: Seq[String]): DataFrame = {
    require(groupCols.nonEmpty)
    val g = groupCols.map(col)
    val w = col(weightCol).cast("decimal(18,2)")
    val valid = w.isNotNull && (w >= 0)
    def d(c: Column) = c.cast("double")
    val agg = df.groupBy(g: _*)
      .agg(count(when(valid, lit(1))).as("n"),
        count(when(!valid, lit(1))).as("n_dropped"),
        sum(when(valid, w)).cast("decimal(38,2)").as("__sw"),
        sum(when(valid, w * w)).cast("decimal(38,4)").as("__sq"),
        max(when(valid, w)).as("__mx"))
    agg.select(g ++ Seq(col("n"), col("n_dropped"),
      when(col("__sq") === 0, lit(0.0))
        .otherwise(round(d(col("__sw")) * d(col("__sw")) / d(col("__sq")), 6))
        .as("ess"),
      when(col("__sq") === 0 || col("n") === 0, lit(0.0))
        .otherwise(round(d(col("__sw")) * d(col("__sw")) / d(col("__sq"))
          / d(col("n")), 6)).as("ess_ratio"),
      when(col("__sw") === 0, lit(0.0))
        .otherwise(round(d(col("__mx")) / d(col("__sw")), 6))
        .as("max_share")): _*)
  }

  /** DuckDB twin of [[weightDiagnostics]] — identical decimal folds
    * and double sequences. `rowsSql` must select `(grp…, w)`. */
  def sqlWeightDiagnostics(rowsSql: String,
                           groupCols: Seq[String]): String = {
    val gl = groupCols.mkString(", ")
    def d(c: String) = s"CAST($c AS DOUBLE)"
    s"""
    WITH r AS (
      SELECT $gl, CAST(w AS DECIMAL(18,2)) AS w FROM ($rowsSql)
    ), a AS (
      SELECT $gl,
        CAST(count(CASE WHEN w IS NOT NULL AND w >= 0 THEN 1 END)
          AS BIGINT) AS n,
        CAST(count(CASE WHEN w IS NULL OR w < 0 THEN 1 END)
          AS BIGINT) AS n_dropped,
        CAST(sum(CASE WHEN w >= 0 THEN w END) AS DECIMAL(38,2)) AS sw,
        CAST(sum(CASE WHEN w >= 0 THEN w * w END) AS DECIMAL(38,4)) AS sq,
        max(CASE WHEN w >= 0 THEN w END) AS mx
      FROM r GROUP BY $gl)
    SELECT $gl, n, n_dropped,
      CASE WHEN sq = 0 THEN 0.0e0
        ELSE round(${d("sw")} * ${d("sw")} / ${d("sq")}, 6) END AS ess,
      CASE WHEN sq = 0 OR n = 0 THEN 0.0e0
        ELSE round(${d("sw")} * ${d("sw")} / ${d("sq")} / ${d("n")}, 6)
        END AS ess_ratio,
      CASE WHEN sw = 0 THEN 0.0e0
        ELSE round(${d("mx")} / ${d("sw")}, 6) END AS max_share
    FROM a"""
  }

  /** WATERFILLING BUDGET ALLOCATION — the training-mix planning step
    * upstream of [[temperatureMixture]]/domain caps: given each
    * domain's AVAILABLE mass and a total token budget B, the fair
    * allocation is min(avail_d, λ) with the water level λ chosen so
    * the allocations sum to B — small domains are taken whole, large
    * domains are capped at one common level (the max-min-fair /
    * reservoir-filling solution). The closed form lives on the
    * SORTED DOMAIN AXIS: the largest rank i with
    * prefix_i + (D−i)·avail_i ≤ B is fully funded, and
    * λ = (B − prefix_{i*}) / (D − i*).
    *
    * Determinism/scale: one hash agg to per-domain masses (the only
    * corpus pass), then row_number + prefix sums over the BOUNDED
    * domain axis with (avail, domain) total-order ties; λ is one
    * fixed double sequence from exact BIGINTs. If Σ avail ≤ B every
    * domain is taken whole. Output per domain:
    * `(domain, avail, alloc (6dp), fully_funded)`. */
  def waterfill(domains: DataFrame, domainCol: String, availCol: String,
                budget: Long): DataFrame = {
    require(budget > 0)
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("avail"), col("domain"))
    val wCum = w.rowsBetween(Window.unboundedPreceding, 0)
    val ranked = domains
      .select(col(domainCol).cast("string").as("domain"),
        col(availCol).cast("bigint").as("avail"))
      .withColumn("__i", row_number().over(w).cast("bigint"))
      .withColumn("__prefix", sum(col("avail")).over(wCum))
    def d(c: Column) = c.cast("double")
    val marked = ranked
      .withColumn("__D", count(lit(1)).over(
        Window.partitionBy().rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("__funded", col("__prefix")
        + (col("__D") - col("__i")) * col("avail") <= budget)
    val lam = marked.agg(
      max(col("__D")).as("__DL"), sum(col("avail")).as("__tot"),
      max(when(col("__funded"), col("__i"))).as("__istar"),
      max(when(col("__funded"), col("__prefix"))).as("__pstar"))
    val level = when(d(col("__tot")) <= lit(budget.toDouble),
        d(col("__tot")))
      .otherwise((lit(budget.toDouble) - d(coalesce(col("__pstar"),
        lit(0L)))) / (d(col("__DL")) - d(coalesce(col("__istar"),
        lit(0L)))))
    marked.crossJoin(broadcast(lam))
      .select(col("domain"), col("avail"),
        round(when(d(col("__tot")) <= lit(budget.toDouble),
            d(col("avail")))
          .otherwise(least(d(col("avail")), level)), 6).as("alloc"),
        (col("__funded") || d(col("__tot")) <= lit(budget.toDouble))
          .cast("int").as("fully_funded"))
  }

  /** DuckDB twin of [[waterfill]]: `domainsSql` must select
    * `(domain, avail)`. */
  def sqlWaterfill(domainsSql: String, budget: Long): String = {
    def d(c: String) = s"CAST($c AS DOUBLE)"
    val b = s"${budget.toDouble}e0"
    val level = s"""(CASE WHEN ${d("tot")} <= $b THEN ${d("tot")}
      ELSE ($b - ${d("coalesce(pstar, 0)")})
        / (${d("ddl")} - ${d("coalesce(istar, 0)")}) END)"""
    s"""
    WITH r0 AS (
      SELECT CAST(domain AS VARCHAR) AS domain,
        CAST(avail AS BIGINT) AS avail
      FROM ($domainsSql)
    ), ranked AS (
      SELECT domain, avail,
        CAST(row_number() OVER (ORDER BY avail, domain) AS BIGINT) AS i,
        CAST(sum(avail) OVER (ORDER BY avail, domain
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
          AS prefix,
        CAST(count(*) OVER () AS BIGINT) AS dd
      FROM r0
    ), marked AS (
      SELECT *, (prefix + (dd - i) * avail <= $budget) AS funded
      FROM ranked
    ), lam AS (
      SELECT max(dd) AS ddl, CAST(sum(avail) AS BIGINT) AS tot,
        max(CASE WHEN funded THEN i END) AS istar,
        max(CASE WHEN funded THEN prefix END) AS pstar
      FROM marked)
    SELECT domain, avail,
      round(CASE WHEN ${d("tot")} <= $b THEN ${d("avail")}
        ELSE least(${d("avail")}, $level) END, 6) AS alloc,
      CAST(funded OR ${d("tot")} <= $b AS INT) AS fully_funded
    FROM marked CROSS JOIN lam"""
  }
}
