package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Round-18 optimization evidence: dump the EXECUTED (AQE-final)
  * formatted physical plan of the given queries to
  * `plans/r18/<query>_<suffix>.txt` — the `_before`/`_after` pairs
  * OPTIMIZATION_r18.md cites.
  *
  *   sbt 'runMain graft.tools.DumpPlansR18 before q1,q2,...'
  *
  * Runs under the bench's configuration (master/shuffle partitions
  * from SPARK_GRAFT_CPUS, default 32; data from SPARK_GRAFT_SF_DIR,
  * default sf0.1) so the dumped plans are the bench's plans. */
object DumpPlansR18 {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: DumpPlansR18 <suffix> <q1,q2,...>")
    val suffix = args(0)
    val names = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get("plans/r18"))
    names.foreach { name =>
      val df = graft.SparkEntry.queries(name)(spark, sf)
      // execute THIS QueryExecution so the dumped plan is the
      // AQE-FINAL executed plan (a noop write plans and runs its OWN
      // QueryExecution, leaving df.queryExecution un-executed with
      // isFinalPlan=false — the DumpPlans collect() convention)
      df.collect()
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      Files.writeString(Paths.get(s"plans/r18/${name}_$suffix.txt"), plan)
      println(s"plans/r18/${name}_$suffix.txt written")
    }
    spark.stop()
  }
}
