package graft.queries

import graft.Tables
import graft.impute.MeanImpute

/** Driver-contract queries for the imputation pipeline (SURVEY §2-A).
  * M1: deterministic mean-impute slice (full `clean()` dataflow shape
  * with the model stage swapped for the known-cell mean). M2 adds the
  * RBM-backed variants (non-oracle, invariant-tested).
  */
object ImputeQueries extends Registry {

  private val customerCols =
    Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
  private val supplierCols =
    Seq("s_suppkey", "s_name", "s_nationkey", "s_acctbal")

  val queries: Map[String, Q] = Map(
    "impute_customer_acctbal" -> ((s, d) =>
      MeanImpute.imputeNumeric(Tables.customer(s, d), "c_acctbal", "c_custkey", salt = 1)),
    "impute_supplier_acctbal" -> ((s, d) =>
      MeanImpute.imputeNumeric(Tables.supplier(s, d), "s_acctbal", "s_suppkey", salt = 2)),
  )

  val oracle: Map[String, String] = Map(
    "impute_customer_acctbal" ->
      MeanImpute.oracleSql("customer", customerCols, "c_acctbal", "c_custkey", salt = 1),
    "impute_supplier_acctbal" ->
      MeanImpute.oracleSql("supplier", supplierCols, "s_acctbal", "s_suppkey", salt = 2),
  )
}
