package graft.tools

import graft.Tables
import graft.similarity.{Cosine, IvfIndex}
import org.apache.spark.sql.SparkSession

/** Measures the persisted-index serving claim: `IvfIndex.topK` must
  * cost a small fraction of the one-shot `ivfTopK` once the index is
  * built, because it skips the k-means fit and the corpus-wide cell
  * assignment. Usage: runMain graft.tools.ProfileIvfIndex [sfDir]
  * — numbers recorded in SCALING.md's similarity section. */
object ProfileIvfIndex {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val embs = Tables.embeddings(spark, sfDir).localCheckpoint()
    val tmp = java.nio.file.Files.createTempDirectory("profile_ivf").toString
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ivf] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // warm EVERY shape once before timing (discarded): the first run of
    // a query shape absorbs 1-2 s of codegen/scan warm-up, and timing
    // the one-shot cold while the serve runs warm would overstate the
    // serving advantage (ScaleProbe discards a warm run for the same
    // reason)
    Cosine.ivfTopK(embs, "vec_id", "embedding", k = 10).count()
    IvfIndex.write(embs, "vec_id", "embedding",
      table = "profile_ivf_vectors", path = s"$tmp/idx")
    IvfIndex.topK(spark, "profile_ivf_vectors", s"$tmp/idx",
      embs.limit(50), "vec_id", "embedding", k = 10).count()
    time("one-shot ivfTopK (fit + assign + join)") {
      Cosine.ivfTopK(embs, "vec_id", "embedding", k = 10).count()
    }
    time("index build (fit + assign + bucketed write, once)") {
      IvfIndex.write(embs, "vec_id", "embedding",
        table = "profile_ivf_vectors", path = s"$tmp/idx")
    }
    for (qn <- Seq(50, 500)) {
      time(s"serve $qn-query batch from the persisted index") {
        IvfIndex.topK(spark, "profile_ivf_vectors", s"$tmp/idx",
          embs.limit(qn), "vec_id", "embedding", k = 10).count()
      }
    }
    spark.stop()
  }
}
