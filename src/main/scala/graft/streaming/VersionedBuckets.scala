package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Shared layout for the bucket-partitioned
  * [[graft.sources.VersionedTable]] state sinks ([[StreamingMerge]],
  * [[StreamingIncrementalCC]]): rows live in hash-bucket directories
  * (`__bucket=N`) inside each version's invisible data dir, so a
  * micro-batch can prune its reads AND its writes to the buckets it
  * touches at the MANIFEST level — untouched buckets' files carry
  * into the next version by reference, and visibility of the whole
  * batch is one atomic manifest commit. The bucket id lives in the
  * directory name, not in the files; readers that need it recompute
  * it from the key column. */
private[streaming] object VersionedBuckets {

  val BucketCol = "__bucket"

  private val BucketRe = raw"$BucketCol=(\d+)/".r

  /** Bucket id encoded in a manifest-relative file path, if any. */
  def bucketOfPath(rel: String): Option[Long] =
    BucketRe.findFirstMatchIn(rel).map(_.group(1).toLong)

  /** Persist the table's bucket count at init (atomic
    * create-no-overwrite; immutable thereafter). A caller whose
    * nBuckets disagrees with the stored value would compute bucket
    * ids that no longer match the stored directory tags — the
    * manifest-level prune would read the WRONG slice of the snapshot
    * and the merge would silently duplicate rows. [[checkNBuckets]]
    * turns that operator error into a loud failure. */
  def writeNBuckets(spark: org.apache.spark.sql.SparkSession,
                    dir: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir))
    val p = new Path(dir, "_nbuckets")
    val out = fs.create(p, false)
    try out.write(nBuckets.toString.getBytes("UTF-8")) finally out.close()
  }

  /** Require the caller's nBuckets to match the table's stored value
    * (tables predating the property pass through unchecked). */
  def checkNBuckets(spark: org.apache.spark.sql.SparkSession,
                    dir: String, nBuckets: Int): Unit = {
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val p = new Path(dir, "_nbuckets")
    if (fs.exists(p)) {
      val in = fs.open(p)
      val stored = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim.toInt finally in.close()
      require(stored == nBuckets,
        s"nBuckets mismatch at $dir: table was initialized with " +
          s"$stored, caller passed $nBuckets — a mismatched bucket " +
          "function would mis-prune reads and corrupt the merge")
    }
  }

  /** [[checkNBuckets]], but the pin file must EXIST — the guard for
    * writers that just tried to create it ([[StreamingMerge.rebucket]]
    * falls back to this after a racing-create IOException): a
    * transient create failure that left NO pin must not pass
    * vacuously, or the rewrite publishes unpinned and a later caller
    * with a different nBuckets silently mis-prunes lookups — the
    * exact corruption the pin exists to prevent. */
  def requireNBuckets(spark: org.apache.spark.sql.SparkSession,
                      dir: String, nBuckets: Int): Unit = {
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(dir, "_nbuckets")),
      s"no _nbuckets pin at $dir — the pin create failed (not a " +
        "racing writer); retry rather than publish an unpinned table")
    checkNBuckets(spark, dir, nBuckets)
  }

  /** Write `df` (which must already carry [[BucketCol]]) partitioned
    * by bucket into a fresh invisible data dir under `dir`; return
    * the dir-relative file paths (each carrying its `__bucket=N`
    * component). The files are unreferenced until the caller commits
    * a manifest naming them. */
  def writeBucketed(df: DataFrame, dir: String): Seq[String] = {
    val spark = df.sparkSession
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val uuid = java.util.UUID.randomUUID().toString
    val dataRel = s"data/$uuid"
    df.repartition(col(BucketCol))
      .write.partitionBy(BucketCol)
      .parquet(new Path(dir, dataRel).toString)
    val out = Seq.newBuilder[String]
    val it = fs.listFiles(new Path(dir, dataRel), true)
    while (it.hasNext) {
      val f = it.next()
      if (!f.getPath.getName.startsWith("_") &&
          !f.getPath.getName.startsWith("."))
        out += s"$dataRel/${f.getPath.getParent.getName}/${f.getPath.getName}"
    }
    out.result().sorted
  }
}
