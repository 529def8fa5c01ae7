package graft.queries

import graft.Tables
import graft.functions.Noise
import graft.impute.{MeanImpute, RbmFixture}
import graft.ml.RbmImputer
import org.apache.spark.sql.functions.{col, expr, lit, pmod}

/** Driver-contract queries for the imputation pipeline (SURVEY §2-A).
  * M1: deterministic mean-impute slice (full `clean()` dataflow shape
  * with the model stage swapped for the known-cell mean). M2 adds the
  * RBM: `impute_customer_rbm_fixture` puts the deterministic transform
  * tail (A5–A15) under the DuckDB oracle via fixture weights (SURVEY
  * §5.4); `impute_customer_rbm` is the full self-trained Estimator/
  * Model pipeline (stochastic → rows-only check + ScalaTest invariants).
  */
object ImputeQueries extends Registry {

  private val customerCols =
    Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
  private val supplierCols =
    Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
  private val lineitemCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
    "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    "l_returnflag", "l_linestatus", "l_shipdate")
  private val ordersCols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
    "o_totalprice", "o_orderdate", "o_orderpriority")
  // composite per-row key (l_orderkey is not unique per lineitem row)
  private val lineitemKey = "(l_orderkey * 8 + l_linenumber)"
  // the UNIQUE lineitem row id: (orderkey, linenumber, partkey, suppkey)
  // is the minimal unique tuple in this data generation (verified:
  // every shorter prefix collides); strides sized for sf0.1 bounds
  private val lineitemUniqueKey =
    "(((l_orderkey * 8 + l_linenumber) * 32768 + l_partkey) * 1024 + l_suppkey)"

  /** The reference `clean()` equivalent: inject missingness into one
    * numeric + one categorical column, fit the RBM, impute. */
  def rbmClean: Q = (s, d) => {
    val base = Tables.customer(s, d)
    val withMissing = Noise.injectMissing(
      Noise.injectMissing(base, "c_acctbal", "c_custkey", salt = 21, frac = 0.10),
      "c_mktsegment", "c_custkey", salt = 22, frac = 0.10)
    val imputer = new RbmImputer()
      .setNumericCols(Seq("c_acctbal"))
      .setCategoricalCols(Seq("c_mktsegment"))
      .setKeyCol("c_custkey")
      .setNHidden(8).setMaxEpochs(15).setBatchSize(32).setLearnRate(0.2)
    imputer.fit(withMissing).transform(withMissing)
  }

  val queries: Map[String, Q] = Map(
    "impute_customer_acctbal" -> ((s, d) =>
      MeanImpute.imputeNumeric(Tables.customer(s, d), "c_acctbal", "c_custkey", salt = 1)),
    "impute_supplier_acctbal" -> ((s, d) =>
      MeanImpute.imputeNumeric(Tables.supplier(s, d), "s_acctbal", "s_suppkey", salt = 2)),
    // fact-table scale: 600k rows at sf0.1, composite row key.
    "impute_lineitem_quantity" -> ((s, d) =>
      MeanImpute.imputeNumeric(Tables.lineitem(s, d), "l_quantity",
        lineitemKey, salt = 41)),
    // KNN imputation (the assumption-free imputer next to the RBM):
    // missing l_extendedprice filled from the 5 nearest complete rows
    // in (quantity, discount, tax) space — fully deterministic, so the
    // whole MODEL-BASED imputer sits under the exact oracle (the RBM
    // needed the §5.4 fixture trick for this).
    "impute_lineitem_knn" -> ((s, d) => {
      // two keys on purpose: the SMALL (l_orderkey, l_linenumber) key
      // drives the sin-based missingness mask (large arguments degrade
      // cross-engine sin agreement), while identity/tie-break uses the
      // UNIQUE 4-column composite — (orderkey, linenumber) alone
      // collides in this data generation (11785 duplicate groups), and
      // KNN needs a real row id for self-exclusion and rank ties
      // 1-in-100 order slice: the EXACT audit join is O(missing ×
      // donors) by design (~5.8k rows → ~3.1M scored pairs at sf0.1,
      // window-ranked per recipient) — the shape you run on a segment
      // or a sample; the corpus path swaps in ANN candidates (scaladoc)
      val li = Tables.lineitem(s, d)
        .filter(pmod(col("l_orderkey"), lit(100L)) === 0)
        .withColumn("__mkey", expr(lineitemKey))
        .withColumn("__key", expr(lineitemUniqueKey))
      val withMissing = Noise.injectMissing(li, "l_extendedprice",
        "__mkey", salt = 43, frac = 0.10)
      // the final filter is semantic (drop rows the imputer could not
      // fill — none on this table, features are complete) AND makes
      // the output depend on the imputed VALUE: without it, a bare
      // count() lets Catalyst eliminate the left-outer merge join
      // (unique build side) and the bench would time an empty plan
      graft.impute.KnnImpute.impute(withMissing, "__key",
          "l_extendedprice", Seq("l_quantity", "l_discount", "l_tax"), k = 5)
        .filter(col("l_extendedprice").isNotNull)
        .select(col("__key").as("row_key"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice").as("imputed_price"))
    }),
    // the CORPUS-SCALE form of the same imputer: candidates from
    // IVF-blocked donors (deterministic KMeansLloyd cells over the
    // scaled feature space, nProbe nearest cells per recipient)
    // instead of the full recipients × donors join. 1-in-10 slice —
    // 10× the exact query's reach — because the point IS the scale
    // path: pairs drop from |R|·|D| to |R|·nProbe·√|D|. Deterministic
    // end to end but the iterative fit has no single-SQL twin →
    // rows+spec (KnnImputeSpec pins ≥95% of imputed cells bit-equal
    // to the exact form at this exact shape).
    "impute_lineitem_knn_ann" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(pmod(col("l_orderkey"), lit(10L)) === 0)
        .withColumn("__mkey", expr(lineitemKey))
        .withColumn("__key", expr(lineitemUniqueKey))
      val withMissing = Noise.injectMissing(li, "l_extendedprice",
        "__mkey", salt = 43, frac = 0.10)
      graft.impute.KnnImpute.imputeAnn(withMissing, "__key",
          "l_extendedprice", Seq("l_quantity", "l_discount", "l_tax"), k = 5)
        .filter(col("l_extendedprice").isNotNull)
        .select(col("__key").as("row_key"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice").as("imputed_price"))
    }),
    // the SERVING shape of ANN-KNN imputation: build the persisted
    // donor index (stats + centroids + bucketed donor table), then
    // impute the batch against it — no re-fit, zero Exchange on the
    // donor side. Build cost deliberately inside the timed query
    // (the c3_ivf_serve convention). Rows-only: served ≡ imputeAnn
    // is KnnImputeSpec-pinned.
    "impute_knn_serve" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(pmod(col("l_orderkey"), lit(10L)) === 0)
        .withColumn("__mkey", expr(lineitemKey))
        .withColumn("__key", expr(lineitemUniqueKey))
      val withMissing = Noise.injectMissing(li, "l_extendedprice",
        "__mkey", salt = 43, frac = 0.10)
      val (tbl, tmp) = indexScratch(d, "graft_knn_donors")
      graft.impute.KnnImpute.writeDonorIndex(withMissing, "__key",
        "l_extendedprice", Seq("l_quantity", "l_discount", "l_tax"),
        table = tbl, path = tmp)
      graft.impute.KnnImpute.imputeServe(s, tbl, tmp, withMissing,
          "__key", "l_extendedprice",
          Seq("l_quantity", "l_discount", "l_tax"), k = 5)
        .filter(col("l_extendedprice").isNotNull)
        .select(col("__key").as("row_key"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice").as("imputed_price"))
    }),
    // the SERVE-ONLY twin: identical output, but the donor index is
    // built at most ONCE per (host, sf) — an ensure-built guard, not a
    // timed rebuild — so this bench row carries the SERVING claim on
    // its own number (impute_knn_serve deliberately times build+serve;
    // its 10× probe was dominated by the 10× index WRITE, which says
    // nothing about serve latency). Bench takes min-of-2 reps, so even
    // the rep that pays the one-time build never masks the serve cost.
    "impute_knn_serve_only" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(pmod(col("l_orderkey"), lit(10L)) === 0)
        .withColumn("__mkey", expr(lineitemKey))
        .withColumn("__key", expr(lineitemUniqueKey))
      val withMissing = Noise.injectMissing(li, "l_extendedprice",
        "__mkey", salt = 43, frac = 0.10)
      val (tbl, tmp) = indexScratch(d, "graft_knn_donors_so")
      if (!s.catalog.tableExists(tbl) ||
          !new java.io.File(s"$tmp/stats").exists())
        graft.impute.KnnImpute.writeDonorIndex(withMissing, "__key",
          "l_extendedprice", Seq("l_quantity", "l_discount", "l_tax"),
          table = tbl, path = tmp)
      graft.impute.KnnImpute.imputeServe(s, tbl, tmp, withMissing,
          "__key", "l_extendedprice",
          Seq("l_quantity", "l_discount", "l_tax"), k = 5)
        .filter(col("l_extendedprice").isNotNull)
        .select(col("__key").as("row_key"), col("l_orderkey"),
          col("l_linenumber"), col("l_extendedprice").as("imputed_price"))
    }),
    // C8: ECDF rank transform — nonparametric quantile-uniformization
    // per group on the bounded value axis (the Mann–Whitney/KM
    // recipe: never a corpus-sized rank window).
    "c8_ecdf" -> ((s, d) =>
      graft.impute.Robust.ecdf(
        Tables.lineitem(s, d).select(col("l_returnflag"),
          col("l_extendedprice")),
        "l_extendedprice", Seq("l_returnflag"))),
    // C8: the SCALE MODE of the same transform — the value axis first
    // quantizes to 10k per-group min-max grid levels (AxisGrid), so
    // the fold is bounded at ANY corpus size where the exact axis
    // grows with the distinct-value count (4.6x at 10x, BASELINE.md).
    // Unlike a sketch mode this is STILL bit-exact under the oracle:
    // min/max are order-insensitive exact aggregates and the level
    // arithmetic is a fixed double sequence.
    "c8_ecdf_scale" -> ((s, d) =>
      graft.impute.Robust.ecdf(
        Tables.lineitem(s, d).select(col("l_returnflag"),
          col("l_extendedprice")),
        "l_extendedprice", Seq("l_returnflag"), exact = false)),
    // deterministic categorical fill: global mode with stable ties.
    "impute_orders_priority_mode" -> ((s, d) =>
      MeanImpute.imputeMode(Tables.orders(s, d), "o_orderpriority",
        "o_orderkey", salt = 42)),
    // CATEGORICAL KNN: the LOCAL estimator for the same column the
    // mode query fills globally — missing o_orderpriority takes the
    // majority label of the 5 nearest complete orders in totalprice
    // space (ties: earliest donor in (d², id) order — a total order,
    // so the vote is oracle-exact). 1-in-20 slice: the exact audit
    // join is O(missing × donors) by design, same contract as
    // impute_lineitem_knn.
    "impute_orders_priority_knn" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .filter(pmod(col("o_orderkey"), lit(20L)) === 0)
      val withMissing = Noise.injectMissing(o, "o_orderpriority",
        "o_orderkey", salt = 45, frac = 0.10)
      graft.impute.KnnImpute.imputeCategorical(withMissing, "o_orderkey",
          "o_orderpriority", Seq("o_totalprice"), k = 5)
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderpriority").as("imputed_priority"))
    }),
    "impute_customer_rbm_fixture" -> ((s, d) => RbmFixture.query(s, d)),
    "impute_customer_rbm" -> rbmClean,
    // tune_rbm=True path (A16/A17): tiny grid, shared training sample.
    "impute_customer_rbm_tuned" -> ((s, d) => {
      val base = Tables.customer(s, d)
      val withMissing = Noise.injectMissing(
        Noise.injectMissing(base, "c_acctbal", "c_custkey", salt = 21, frac = 0.10),
        "c_mktsegment", "c_custkey", salt = 22, frac = 0.10)
      val imputer = new graft.ml.RbmImputer()
        .setNumericCols(Seq("c_acctbal"))
        .setCategoricalCols(Seq("c_mktsegment"))
        .setKeyCol("c_custkey").setMaxEpochs(10).setBatchSize(32)
      val grid = Seq(
        graft.ml.RbmTuner.Candidate(8, 0.1, 32, 0.0),
        graft.ml.RbmTuner.Candidate(8, 0.3, 32, 0.5),
        graft.ml.RbmTuner.Candidate(16, 0.2, 32, 0.25))
      graft.ml.RbmTuner.fitTuned(imputer, withMissing, grid, tuneEpochs = 3)
        .model.transform(withMissing)
    }),
    // C8: per-segment orchestration — one model per mktsegment.
    "c8_segment_mean_impute" -> ((s, d) =>
      graft.impute.SegmentedImpute.meanBySegment(
        Tables.customer(s, d), "c_acctbal", "c_mktsegment", "c_custkey", salt = 31)),
    "c8_segment_rbm_impute" -> ((s, d) => {
      val withMissing = Noise.injectMissing(
        Tables.customer(s, d), "c_acctbal", "c_custkey", salt = 31, frac = 0.10)
      graft.impute.SegmentedImpute.rbmBySegment(
        withMissing, "c_acctbal", "c_mktsegment", "c_custkey",
        graft.ml.RbmCore.Config(nHidden = 4, maxEpochs = 5))
    }),
    // Reference API parity: the one-call clean() facade.
    "clean_api" -> ((s, d) => {
      val withMissing = Noise.injectMissing(
        Noise.injectMissing(Tables.customer(s, d), "c_acctbal", "c_custkey",
          salt = 21, frac = 0.10),
        "c_mktsegment", "c_custkey", salt = 22, frac = 0.10)
      graft.Clean.clean(withMissing, Seq("c_acctbal"), Seq("c_mktsegment"),
        keyCol = "c_custkey", maxEpochs = 10)
    }),
    // 100 TB training path: treeAggregate data-parallel gradients.
    "impute_customer_rbm_distributed" -> ((s, d) => {
      val base = Tables.customer(s, d)
      val withMissing = Noise.injectMissing(
        Noise.injectMissing(base, "c_acctbal", "c_custkey", salt = 21, frac = 0.10),
        "c_mktsegment", "c_custkey", salt = 22, frac = 0.10)
      new graft.ml.RbmImputer()
        .setNumericCols(Seq("c_acctbal"))
        .setCategoricalCols(Seq("c_mktsegment"))
        .setKeyCol("c_custkey").setBackend("distributed")
        .setMaxEpochs(8).setLearnRate(0.5)
        .fit(withMissing).transform(withMissing)
    }),
    // C8b: robust prep (graft.impute.Robust) — winsorization clips at
    // per-group percentile fences, robust scaling centers on median /
    // IQR; both use exact type-7 quantiles on the 4-dp grid, so the
    // whole transform sits under the oracle.
    "c8_winsorize" -> ((s, d) =>
      graft.impute.Robust.winsorize(
          Tables.lineitem(s, d).select("l_orderkey", "l_returnflag",
            "l_extendedprice"),
          "l_extendedprice", Seq("l_returnflag"))),
    "c8_robust_scale" -> ((s, d) =>
      graft.impute.Robust.robustScale(
          Tables.customer(s, d).select("c_custkey", "c_mktsegment",
            "c_acctbal"),
          "c_acctbal", Seq("c_mktsegment"))),
    // D59: quantile discretization (graft.impute.Discretize) — exact
    // equal-frequency binning at per-segment type-7 quartile fences;
    // one percentile agg + broadcast attach, bins are indicator sums
    // over identical doubles so the whole op is oracle-exact.
    "d25_quantile_bins" -> ((s, d) =>
      graft.impute.Discretize.quantileBins(
        Tables.customer(s, d).select("c_custkey", "c_mktsegment",
          "c_acctbal"),
        "c_acctbal", Seq("c_mktsegment"), nBins = 4)),
  )

  val oracle: Map[String, String] = Map(
    "impute_customer_acctbal" ->
      MeanImpute.oracleSql("customer", customerCols, "c_acctbal", "c_custkey", salt = 1),
    "impute_supplier_acctbal" ->
      MeanImpute.oracleSql("supplier", supplierCols, "s_acctbal", "s_suppkey", salt = 2),
    "impute_lineitem_quantity" ->
      MeanImpute.oracleSql("lineitem", lineitemCols, "l_quantity",
        lineitemKey, salt = 41),
    "impute_lineitem_knn" -> {
      def sc(x: String, f: String) =
        s"""(CASE WHEN mx_$f = mn_$f THEN 0.0e0
             ELSE (CAST($x AS DOUBLE) - mn_$f) / (mx_$f - mn_$f) END)"""
      s"""
      WITH base AS (
        SELECT $lineitemUniqueKey AS key, l_orderkey, l_linenumber,
          l_quantity, l_discount, l_tax,
          CASE WHEN ${Noise.sqlMissing(lineitemKey, 43, 0.10)}
            THEN NULL ELSE l_extendedprice END AS tgt
        FROM lineitem WHERE l_orderkey % 100 = 0
      ), stats AS (
        SELECT
          min(CAST(l_quantity AS DOUBLE)) AS mn_q, max(CAST(l_quantity AS DOUBLE)) AS mx_q,
          min(CAST(l_discount AS DOUBLE)) AS mn_d, max(CAST(l_discount AS DOUBLE)) AS mx_d,
          min(CAST(l_tax AS DOUBLE)) AS mn_t, max(CAST(l_tax AS DOUBLE)) AS mx_t
        FROM base WHERE tgt IS NOT NULL
      ), pairs AS (
        SELECT r.key AS rid, d.key AS did,
          CAST(d.tgt AS DECIMAL(18,2)) AS dv,
          (((${sc("r.l_quantity", "q")} - ${sc("d.l_quantity", "q")})
            * (${sc("r.l_quantity", "q")} - ${sc("d.l_quantity", "q")})
          + (${sc("r.l_discount", "d")} - ${sc("d.l_discount", "d")})
            * (${sc("r.l_discount", "d")} - ${sc("d.l_discount", "d")}))
          + (${sc("r.l_tax", "t")} - ${sc("d.l_tax", "t")})
            * (${sc("r.l_tax", "t")} - ${sc("d.l_tax", "t")})) AS d2
        FROM base r CROSS JOIN base d CROSS JOIN stats
        WHERE r.tgt IS NULL AND d.tgt IS NOT NULL AND r.key != d.key
      ), ranked AS (
        SELECT rid, dv, row_number() OVER (
          PARTITION BY rid ORDER BY d2 ASC, did ASC) AS rn
        FROM pairs
      ), imp AS (
        SELECT rid, CAST(sum(dv) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS v
        FROM ranked WHERE rn <= 5 GROUP BY rid)
      SELECT b.key AS row_key, b.l_orderkey, b.l_linenumber,
        coalesce(b.tgt, i.v) AS imputed_price
      FROM base b LEFT JOIN imp i ON i.rid = b.key
      WHERE coalesce(b.tgt, i.v) IS NOT NULL"""
    },
    "impute_orders_priority_mode" ->
      MeanImpute.modeOracleSql("orders", ordersCols, "o_orderpriority",
        "o_orderkey", salt = 42),
    "impute_orders_priority_knn" -> {
      val sc = (x: String) =>
        s"""(CASE WHEN mx = mn THEN 0.0e0
             ELSE (CAST($x AS DOUBLE) - mn) / (mx - mn) END)"""
      s"""
      WITH base AS (
        SELECT o_orderkey, o_custkey, o_totalprice,
          CASE WHEN ${Noise.sqlMissing("o_orderkey", 45, 0.10)}
            THEN NULL ELSE o_orderpriority END AS tgt
        FROM orders WHERE o_orderkey % 20 = 0
      ), stats AS (
        SELECT min(CAST(o_totalprice AS DOUBLE)) AS mn,
               max(CAST(o_totalprice AS DOUBLE)) AS mx
        FROM base WHERE tgt IS NOT NULL
      ), pairs AS (
        SELECT r.o_orderkey AS rid, d.o_orderkey AS did, d.tgt AS dv,
          ((${sc("r.o_totalprice")} - ${sc("d.o_totalprice")})
           * (${sc("r.o_totalprice")} - ${sc("d.o_totalprice")})) AS d2
        FROM base r CROSS JOIN base d CROSS JOIN stats
        WHERE r.tgt IS NULL AND d.tgt IS NOT NULL
          AND r.o_orderkey != d.o_orderkey
      ), ranked AS (
        SELECT rid, dv, row_number() OVER (
          PARTITION BY rid ORDER BY d2 ASC, did ASC) AS rn
        FROM pairs
      ), votes AS (
        SELECT rid, dv, count(*) AS votes, min(rn) AS best
        FROM ranked WHERE rn <= 5 GROUP BY rid, dv
      ), picked AS (
        SELECT rid, dv, row_number() OVER (
          PARTITION BY rid ORDER BY votes DESC, best ASC) AS pk
        FROM votes)
      SELECT b.o_orderkey, b.o_custkey,
        coalesce(b.tgt, i.dv) AS imputed_priority
      FROM base b LEFT JOIN (SELECT rid, dv FROM picked WHERE pk = 1) i
        ON i.rid = b.o_orderkey"""
    },
    "impute_customer_rbm_fixture" -> RbmFixture.oracleSql,
    "c8_segment_mean_impute" -> graft.impute.SegmentedImpute.meanBySegmentSql(
      "customer", customerCols, "c_acctbal", "c_mktsegment", "c_custkey", salt = 31),
    // impute_customer_rbm / _tuned / _distributed / c8_segment_rbm /
    // clean_api: stochastic training — no SQL oracle by design
    "c8_ecdf" -> graft.impute.Robust.sqlEcdf(
      "lineitem", "l_extendedprice", Seq("l_returnflag"),
      Seq("l_returnflag", "l_extendedprice")),
    "c8_ecdf_scale" -> graft.impute.Robust.sqlEcdfScale(
      "lineitem", "l_extendedprice", Seq("l_returnflag"),
      Seq("l_returnflag", "l_extendedprice")),
    "c8_winsorize" -> """
      WITH t AS (
        SELECT l_returnflag,
          round(quantile_cont(l_extendedprice, 0.05e0), 4) AS lo,
          round(quantile_cont(l_extendedprice, 0.95e0), 4) AS hi
        FROM lineitem GROUP BY l_returnflag)
      SELECT l.l_returnflag, l.l_orderkey, l.l_extendedprice,
        least(greatest(l.l_extendedprice, t.lo), t.hi)
          AS l_extendedprice_clipped
      FROM lineitem l JOIN t USING (l_returnflag)""",
    "c8_robust_scale" -> """
      WITH t AS (
        SELECT c_mktsegment,
          round(quantile_cont(c_acctbal, 0.5e0), 4) AS med,
          round(quantile_cont(c_acctbal, 0.75e0), 4)
            - round(quantile_cont(c_acctbal, 0.25e0), 4) AS iqr
        FROM customer GROUP BY c_mktsegment)
      SELECT c.c_mktsegment, c.c_custkey, c.c_acctbal,
        CASE WHEN t.iqr = 0 THEN 0.0e0
             ELSE round((c.c_acctbal - t.med) / t.iqr, 6)
        END AS c_acctbal_scaled
      FROM customer c JOIN t USING (c_mktsegment)""",
    "d25_quantile_bins" -> graft.impute.Discretize.sqlQuantileBins(
      "customer", "c_acctbal", Seq("c_mktsegment"), 4,
      Seq("c_custkey", "c_mktsegment", "c_acctbal")),
  )
}
