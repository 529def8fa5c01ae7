// scratch profiling main — stage costs of the ANN/embedding-dedup family
package graft.tools
import graft.Tables
import org.apache.spark.sql.SparkSession
object ProfileAnn {
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
    val embs = Tables.embeddings(spark, d)
    time("scan") { embs.count() }
    time("annScoredPairs") { graft.similarity.Cosine.annScoredPairs(embs, "vec_id", "embedding", 64).count() }
    time("pairs>=0.45") { graft.dedup.EmbeddingDedup.pairs(embs, "vec_id", "embedding", 64, 0.45).count() }
    time("full dedup") { graft.dedup.EmbeddingDedup.dedup(embs, "vec_id", "embedding", 64, 0.45).count() }
    time("ann_topk") { graft.similarity.Cosine.annTopK(embs, "vec_id", "embedding", 64, 3).count() }
    spark.stop()
  }
}
