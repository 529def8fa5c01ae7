package graft

import org.apache.spark.sql.SparkSession

/** Cluster-deploy configuration hook — the knobs a 100 TB deployment
  * should set, in code so a deploy can apply them in one call instead
  * of re-deriving them from SCALING.md. The local harness (Bench /
  * Verify / specs) intentionally does NOT use this: it pins
  * `shuffle.partitions = cores` for a single-JVM run, which is the
  * same policy at its degenerate point (one machine, AQE coalescing
  * mostly idle because partitions already ≈ cores).
  *
  * The story (SCALING.md "Global decisions" has the prose): set
  * `spark.sql.shuffle.partitions` to ~2× TOTAL executor cores as an
  * UPPER BOUND for AQE to coalesce DOWN from — with
  * `coalescePartitions` on, the static number only has to be big
  * enough that no single post-shuffle partition exceeds executor
  * memory; AQE merges the excess. Skew is handled by
  * `skewJoin.enabled` (plus the library's own salting where the skew
  * is algorithmic, e.g. TopPerGroup). Scan parallelism comes from
  * `files.maxPartitionBytes`, independent of the shuffle number.
  */
object GraftConf {

  /** Recommended cluster configuration, parameterized by the TOTAL
    * executor-core count of the deployment (e.g. 1000 executors × 8
    * cores → clusterCores = 8000). */
  def recommended(clusterCores: Int): Map[String, String] = {
    require(clusterCores >= 1)
    Map(
      // upper bound for AQE to coalesce down from: 2x cores keeps
      // every core busy through stragglers while bounding per-task
      // state; raise only if a single post-shuffle partition still
      // exceeds executor memory at your data scale
      "spark.sql.shuffle.partitions" -> (2L * clusterCores).toString,
      // the three AQE behaviors the plans in this library assume:
      // runtime re-plan, post-shuffle coalescing, skew-join splitting
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // 128 MB scan splits: parquet row-group friendly, and the unit
      // the "bucket x file ~ 128-512 MB" sizing in TableSink assumes
      "spark.sql.files.maxPartitionBytes" -> (128L * 1024 * 1024).toString)
  }

  /** Applies [[recommended]] plus the graft extensions (native
    * expressions + SQL registrations) to a session builder. */
  def configure(builder: SparkSession.Builder,
                clusterCores: Int): SparkSession.Builder =
    recommended(clusterCores).foldLeft(
      builder.withExtensions(new GraftExtensions)) {
      case (b, (k, v)) => b.config(k, v)
    }
}
