package graft.similarity

import graft.sources.AtomicPointer
import org.apache.spark.sql.{DataFrame, SparkSession}

/** VERSIONED IVF SERVING — atomic index swaps over [[IvfIndex]]. The
  * plain index is built with `mode(Overwrite)` into a fixed catalog
  * table, so a REBUILD (the re-fit policy's answer to quantizer
  * drift) races concurrent readers: a lazy scan started before the
  * overwrite reads files the rewrite is deleting — the exact hazard
  * `Registry.indexScratch` documents. Versioning splits build from
  * visibility:
  *
  *  - [[publishBuild]] writes a COMPLETELY FRESH index (new catalog
  *    table + new storage path, UUID-tagged — never touching the
  *    serving one), then swaps an [[AtomicPointer]] to it. In-flight
  *    readers keep the old version's table; new readers resolve the
  *    new one. No reader ever sees a half-built index.
  *  - [[topK]] resolves the pointer per call and delegates to the
  *    zero-Exchange bucketed serve path unchanged.
  *  - [[gc]] drops drained old versions — catalog table AND storage —
  *    keeping the newest `keepLast`.
  *
  * [[IvfIndex.merge]]'s incremental appends still apply to the
  * CURRENT version's table between rebuilds (appends are additive —
  * readers tolerate them; it is the destructive rewrite that needed
  * the swap). */
object IvfIndexVersioned {

  private def encode(table: String, path: String) = s"$table\t$path"
  private def decode(v: String): (String, String) = {
    val i = v.indexOf('\t')
    (v.substring(0, i), v.substring(i + 1))
  }

  /** Build a fresh index version from `df` and atomically publish it.
    * Returns the committed pointer version. `baseTable`/`dir` are the
    * stable identity; the physical table/path carry a per-version
    * UUID tag. */
  def publishBuild(df: DataFrame, idCol: String, vecCol: String,
                   baseTable: String, dir: String, numCentroids: Int = 0,
                   seed: Long = 42L, numBuckets: Int = 32): Long = {
    val spark = df.sparkSession
    val tag = java.util.UUID.randomUUID().toString.take(8)
    val table = s"${baseTable}_$tag"
    val path = s"$dir/data/$tag"
    IvfIndex.write(df, idCol, vecCol, table, path,
      numCentroids = numCentroids, seed = seed, numBuckets = numBuckets)
    AtomicPointer.publish(spark, dir, encode(table, path))
  }

  /** (catalog table, storage path) of the current serving version. */
  def resolve(spark: SparkSession, dir: String): (String, String) =
    decode(AtomicPointer.current(spark, dir).getOrElse(
      throw new NoSuchElementException(s"no published index at $dir")))

  /** (table, path) of a specific committed version — for readers that
    * must finish on the version they started with. */
  def resolveAsOf(spark: SparkSession, dir: String,
                  version: Long): (String, String) =
    decode(AtomicPointer.valueAsOf(spark, dir, version))

  /** Serve against the current version ([[IvfIndex.topK]] semantics,
    * zero index-side Exchange). */
  def topK(spark: SparkSession, dir: String, queries: DataFrame,
           idCol: String, vecCol: String, k: Int,
           nProbe: Int = 2): DataFrame = {
    val (table, path) = resolve(spark, dir)
    IvfIndex.topK(spark, table, path, queries, idCol, vecCol, k, nProbe)
  }

  /** Drop all but the newest `keepLast` versions: their catalog
    * tables, storage paths, and pointer slots. Run once in-flight
    * readers of old versions have drained. */
  def gc(spark: SparkSession, dir: String, keepLast: Int): Seq[Long] = {
    val hist = AtomicPointer.history(spark, dir)
    val stale = hist.dropRight(keepLast)
    stale.foreach { case (_, v) =>
      val (table, path) = decode(v)
      spark.sql(s"DROP TABLE IF EXISTS `$table`")
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(p, true)
    }
    AtomicPointer.gc(spark, dir, keepLast)
  }
}
