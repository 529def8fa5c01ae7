package graft.tools

import org.apache.spark.sql.SparkSession

/** Multi-file variant of a bench data directory (VERDICT r17 #9): the
  * shipped sf dirs hold ONE ~11 MB parquet file per table, so every
  * scan is a single split and the 8-vs-32-cpu scaling block reads ≈1
  * for most rows — it measures the one-split layout, not the
  * operators. This tool rewrites each table into `filesPerTable`
  * files (row content identical; queries are order-insensitive and
  * re-aggregate, so results are unchanged — the oracle can be re-run
  * against the split dir to confirm). Point `SPARK_GRAFT_SF_DIR` at
  * the output to measure scan-parallel scaling:
  *
  *   sbt 'runMain graft.tools.SplitSfDir /root/testdata/sf0.1 \
  *        /tmp/sf0.1_split16 16'
  *   SPARK_GRAFT_SF_DIR=/tmp/sf0.1_split16 SPARK_GRAFT_CPUS=32 ... Bench
  *
  * Files are split round-robin (repartition(n)), which preserves rows
  * exactly and spreads them evenly; per-file min/max stats get wider
  * than a clustered layout, which only makes skipping-based rows
  * conservative, never wrong. */
object SplitSfDir {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: SplitSfDir <srcDir> <dstDir> [filesPerTable=16]")
    val src = args(0)
    val dst = args(1)
    val n = args.lift(2).map(_.toInt).getOrElse(16)
    require(n >= 1, "filesPerTable must be >= 1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fs = org.apache.hadoop.fs.FileSystem
      .get(spark.sparkContext.hadoopConfiguration)
    val tables = fs.listStatus(new org.apache.hadoop.fs.Path(src))
      .filter(s => s.getPath.getName.endsWith(".parquet"))
    require(tables.nonEmpty, s"no .parquet tables under $src")
    tables.foreach { t =>
      val name = t.getPath.getName
      val out = s"$dst/$name"
      spark.read.parquet(t.getPath.toString)
        .repartition(n)
        .write.mode("overwrite").parquet(out)
      val k = fs.listStatus(new org.apache.hadoop.fs.Path(out))
        .count(f => f.getPath.getName.endsWith(".parquet"))
      println(s"$name -> $k files at $out")
    }
    spark.stop()
  }
}
