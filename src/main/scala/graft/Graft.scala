package graft

import org.apache.spark.sql.SparkSession

/** One-line session entry point: a SparkSession.Builder preloaded with
  * graft's extensions (native expressions + the opt-in range-join
  * rule) and the confs this library's operators assume:
  *
  *  - AQE on (Spark 4 default, pinned explicitly): skew-join splitting
  *    and shuffle coalescing are part of every operator's 100 TB story.
  *  - runtime bloom-filter joins on: the automatic form of
  *    [[graft.operators.BloomJoin]] for plans where statistics allow.
  *  - RocksDB state store: required by the `transformWithState`
  *    operators ([[graft.streaming.StatefulRunning]]) and strictly
  *    better for the session/dedup state the streaming ops keep.
  *  - UTC session timezone: the determinism contract every temporal
  *    operator and oracle in this library is tested under.
  *
  * `Graft.builder()` returns the builder for further tuning;
  * `Graft.session(master)` materializes it for quick starts and tests.
  */
object Graft {

  def builder(): SparkSession.Builder =
    SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.sql.session.timeZone", "UTC")

  /** Quick-start local session (tests, notebooks). On a cluster, use
    * [[builder]] with your own master/deploy settings — and apply
    * [[GraftConf.configure]] (or start from
    * `GraftConf.recommended(clusterCores)`) for the shuffle-partition /
    * AQE / scan-split knobs a 100 TB deployment should set. */
  def session(master: String = "local[*]",
              shufflePartitions: Option[Int] = None): SparkSession = {
    val b = builder().master(master)
    shufflePartitions.foreach(p =>
      b.config("spark.sql.shuffle.partitions", p.toString))
    b.getOrCreate()
  }
}
