// scratch profiling main — not part of the library
package graft.tools
import graft.Tables
import org.apache.spark.sql.SparkSession
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[profile] $name%-22s ${(System.nanoTime()-t0)/1e9}%.2f s  rows=$n")
    }
    val docs = Tables.documents(spark, d)
    time("signatures") { graft.dedup.MinHashDedup.signatures(docs, "doc_id", "text", 32, 3, 42L).count() }
    time("candidatePairs") { graft.dedup.MinHashDedup.candidatePairs(docs, "doc_id", "text").count() }
    time("confirmedPairs") { graft.dedup.MinHashDedup.confirmedPairs(docs, "doc_id", "text", 0.8).count() }
    val edges = graft.dedup.MinHashDedup.confirmedPairs(docs, "doc_id", "text", 0.8).localCheckpoint()
    time("cc-only") { graft.dedup.MinHashDedup.connectedComponents(edges).count() }
    time("full dedup") { graft.dedup.MinHashDedup.dedup(docs, "doc_id", "text").count() }
    spark.stop()
  }
}
