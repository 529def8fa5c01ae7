package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch diagnostic for the d142_rollup_pruned 8-core failure:
  * replays the query's state-table writes step by step and prints the
  * file count of every published rollup version. Not part of any
  * query path. */
object DebugRollupLayout {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .withExtensions(new graft.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = graft.Tables.documents(spark, sfDir)
    println(s"distinct sources: ${docs.select("source").distinct.count}")

    // bare repartition+write control
    val st = docs.groupBy("source").agg(count(lit(1)).as("n"))
      .repartition(8, col("source"))
    val tmp = "/tmp/debug_rollup_layout_parquet"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(tmp), true)
    st.write.mode("overwrite").parquet(tmp)
    val n = new java.io.File(tmp).listFiles.count(f =>
      f.getName.endsWith(".parquet"))
    println(s"bare repartition(8, source) -> $n files")

    // full replay of the query's state maintenance
    val dir = "/tmp/debug_rollup_snap"
    val rdir = "/tmp/debug_rollup_state"
    graft.sources.VersionedTable.drop(spark, dir)
    graft.sources.VersionedTable.drop(spark, rdir)
    graft.streaming.StreamingMerge.init(docs, "doc_id", dir, nBuckets = 16)
    graft.streaming.StreamingRollup.init(spark, dir, rdir,
      Seq("source"), "n_chars", bloomCols = Seq("source"),
      statePartitions = Some(8))
    def filesOf(v: Long): Int = {
      val fs = org.apache.hadoop.fs.FileSystem
        .get(spark.sparkContext.hadoopConfiguration)
      graft.sources.VersionedTable.readAsOf(spark, rdir, v)
        .inputFiles.length
    }
    println(s"state v1 files: ${filesOf(1L)}")
    val deletes = docs.filter(col("doc_id") % 503 === 0)
      .withColumn("__seq", lit(1L))
      .withColumn("__op", lit(graft.operators.MergeUpsert.OpDelete))
    graft.streaming.StreamingMerge.applyBatch(deletes, "doc_id",
      "__seq", "__op", dir, 16, Some("rp-epoch-0"))
    graft.streaming.StreamingRollup.refresh(spark, dir, rdir,
      Seq("source"), "n_chars", bloomCols = Seq("source"),
      statePartitions = Some(8))
    val vs = graft.sources.VersionedTable.versions(spark, rdir)
    println(s"state versions: $vs")
    vs.foreach(v => println(s"state v$v files: ${filesOf(v)}"))
    val (_, opened, total) = graft.sources.VersionedTable
      .readLatestPoint(spark, rdir, "source", "src7")
    println(s"point read: opened $opened of $total")
    spark.stop()
  }
}
