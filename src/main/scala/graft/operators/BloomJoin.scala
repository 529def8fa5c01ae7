package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-filter pre-filtered joins (D6) — the 100 TB fact⋈dim pattern
  * for dimension sides too big to broadcast as a hash relation but
  * whose KEY SET fits a bloom filter (bits, not rows: 100M keys at 1%
  * fpp ≈ 120 MB). The fact side is filtered against the broadcast
  * bloom BEFORE the shuffle, so ~(1 − selectivity) of the fact rows
  * never enter the exchange; the exact join afterwards removes the
  * false positives, so the result is IDENTICAL to the plain join —
  * which keeps the operator under the DuckDB oracle.
  *
  * This is the explicit, composable form of what Spark's runtime
  * bloom-filter join (`spark.sql.optimizer.runtime.bloomFilter.*`)
  * injects automatically when statistics allow; building it as an
  * operator makes the pattern available on plans where the optimizer's
  * size/selectivity heuristics decline (e.g. an already-aggregated or
  * user-provided dim side), and via `keysOf` lets one bloom build be
  * reused across several fact tables of a star schema.
  *
  * The membership probe is the one UDF in this package: a bloom test
  * is bit-twiddling over a broadcast byte array, which no built-in
  * expression composition reaches. The probe sits in a simple filter
  * directly over the scan, so predicate pushdown of OTHER conjuncts
  * and column pruning are unaffected.
  */
object BloomJoin {

  /** Broadcastable key-set sketch of `dim.dimKey`, built distributed
    * (`stat.bloomFilter` tree-aggregates per-partition blooms). An
    * EMPTY dim yields an empty bloom (matches-nothing): Spark's
    * `stat.bloomFilter` itself NPEs on an empty frame (the aggregate
    * returns a null buffer), and a filtered dim being empty at some
    * scale factor is a legitimate state, not an error. */
  def keysOf(dim: DataFrame, dimKey: String,
             expectedItems: Long, fpp: Double = 0.01)
      : org.apache.spark.util.sketch.BloomFilter =
    if (dim.select(dimKey).isEmpty)
      org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp)
    else dim.stat.bloomFilter(dimKey, expectedItems, fpp)

  /** Fact rows surviving the broadcast bloom probe on `factKey`. Null
    * keys are dropped — an equi-join never matches them anyway.
    * The probe MUST hash the same way `stat.bloomFilter` inserted:
    * integral keys were put as longs, strings as strings — probing a
    * string key as a cast long would false-NEGATIVE and silently drop
    * matching fact rows, so the key type picks the probe and anything
    * else is rejected loudly. */
  private def prefiltered(fact: DataFrame, factKey: String,
                          bf: org.apache.spark.util.sketch.BloomFilter)
      : DataFrame = {
    import org.apache.spark.sql.types._
    val bcast = fact.sparkSession.sparkContext.broadcast(bf)
    val probe = fact.schema(factKey).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        udf((k: java.lang.Long) => k != null && bcast.value.mightContainLong(k))
          .apply(col(factKey).cast("long"))
      case StringType =>
        udf((k: String) => k != null && bcast.value.mightContainString(k))
          .apply(col(factKey))
      case other => throw new IllegalArgumentException(
        s"BloomJoin key '$factKey' has type $other; only integral and " +
          "string keys hash consistently with stat.bloomFilter")
    }
    fact.filter(probe)
  }

  /** `fact ⋉ dim` (left semi) with a bloom pre-filter on the fact side.
    * Result is exactly `fact.join(dim, keys, "left_semi")`. */
  def semiJoin(fact: DataFrame, dim: DataFrame,
               factKey: String, dimKey: String,
               expectedItems: Long = 1000000L,
               fpp: Double = 0.01): DataFrame =
    prefiltered(fact, factKey, keysOf(dim, dimKey, expectedItems, fpp))
      .join(dim.select(col(dimKey).as(factKey)), Seq(factKey), "left_semi")

  /** Inner equi-join with the same bloom pre-filter on the fact side. */
  def innerJoin(fact: DataFrame, dim: DataFrame,
                factKey: String, dimKey: String,
                expectedItems: Long = 1000000L,
                fpp: Double = 0.01): DataFrame = {
    // frame-qualified columns: with factKey == dimKey (the usual
    // star-schema spelling) unqualified col() is ambiguous
    val pf = prefiltered(fact, factKey, keysOf(dim, dimKey, expectedItems, fpp))
    pf.join(dim, pf(factKey) === dim(dimKey))
  }
}
