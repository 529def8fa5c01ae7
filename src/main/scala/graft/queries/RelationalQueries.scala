package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Relational substrate queries (SURVEY §2-B): the star-schema query
  * surface the reference exercises implicitly through pandas, expressed
  * as native DataFrame plans so Catalyst supplies pushdown, pruning,
  * join strategy and AQE for free.
  *
  * Determinism for the DuckDB oracle (SURVEY §5.3): sums over
  * 2-decimal money doubles go through DECIMAL (exact, order-insensitive);
  * integer-valued doubles (l_quantity) sum exactly as doubles; ratios are
  * a single double division of identical operands on both sides.
  */
object RelationalQueries extends Registry {

  val queries: Map[String, Q] = Map(
    // B1+B2+B5: the TPC-H Q1 pattern — scan → pushed filter → hash agg.
    "q1_pricing_summary" -> ((s, d) => {
      val ep   = col("l_extendedprice").cast("decimal(12,2)")
      val disc = col("l_discount").cast("decimal(4,2)")
      val tax  = col("l_tax").cast("decimal(4,2)")
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          sum(ep).cast("double").as("sum_base_price"),
          sum(ep * (lit(1) - disc)).cast("double").as("sum_disc_price"),
          sum(ep * (lit(1) - disc) * (lit(1) + tax)).cast("double").as("sum_charge"),
          (sum(col("l_quantity")) / count(col("l_quantity"))).as("avg_qty"),
          (sum(ep).cast("double") / count(ep)).as("avg_price"),
          (sum(disc).cast("double") / count(disc)).as("avg_disc"),
          count(lit(1)).as("count_order"))
    }),
    // B2: predicate + projection, both pushed to the parquet scan.
    "b2_filter_project" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1998-06-01").cast("timestamp") &&
                col("l_discount") > lit(0.05))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")),
  )

  val oracle: Map[String, String] = Map(
    "q1_pricing_summary" -> """
      SELECT l_returnflag, l_linestatus,
        sum(l_quantity) AS sum_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
        sum(l_quantity) / count(l_quantity) AS avg_qty,
        CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
        CAST(sum(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
        count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus""",
    "b2_filter_project" -> """
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-06-01' AND l_discount > 0.05""",
  )
}
