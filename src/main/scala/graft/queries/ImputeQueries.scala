package graft.queries

import graft.Tables
import graft.functions.Noise
import graft.impute.{MeanImpute, RbmFixture}
import graft.ml.RbmImputer
import org.apache.spark.sql.functions.col

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
    // deterministic categorical fill: global mode with stable ties.
    "impute_orders_priority_mode" -> ((s, d) =>
      MeanImpute.imputeMode(Tables.orders(s, d), "o_orderpriority",
        "o_orderkey", salt = 42)),
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
    "impute_orders_priority_mode" ->
      MeanImpute.modeOracleSql("orders", ordersCols, "o_orderpriority",
        "o_orderkey", salt = 42),
    "impute_customer_rbm_fixture" -> RbmFixture.oracleSql,
    "c8_segment_mean_impute" -> graft.impute.SegmentedImpute.meanBySegmentSql(
      "customer", customerCols, "c_acctbal", "c_mktsegment", "c_custkey", salt = 31),
    // impute_customer_rbm / _tuned / _distributed / c8_segment_rbm /
    // clean_api: stochastic training — no SQL oracle by design
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
