package graft.similarity

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch phase profiler for round-17 targets (not part of any
  * shipped surface). */
object ProfileR17 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[t] $n%-22s ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }
    val d = "/root/testdata/sf0.1"
    spark.range(1000000).selectExpr("sum(id)").collect()
    val embs = graft.Tables.embeddings(spark, d)
    t("ivfpq.write") {
      IvfPq.write(embs, "vec_id", "embedding", dim = 64,
        table = "tpq", path = "/tmp/tpq_idx", numCentroids = 8,
        fitSample = 2000, numBuckets = 8)
    }
    t("ivfpq.topK") {
      IvfPq.topK(spark, "tpq", "/tmp/tpq_idx",
          embs.filter(col("vec_id") < 50), "vec_id", "embedding",
          dim = 64, k = 10, nProbe = 2)
        .write.mode("overwrite").format("noop").save()
    }
    t("ivfpq.write(2nd)") {
      IvfPq.write(embs, "vec_id", "embedding", dim = 64,
        table = "tpq", path = "/tmp/tpq_idx", numCentroids = 8,
        fitSample = 2000, numBuckets = 8)
    }
    t("fitQuantizer(3rd)") {
      IvfIndex.write(embs, "vec_id", "embedding",
        table = "tivf", path = "/tmp/tivf_idx")
    }
    // phase-level breakdown of IvfPq.write's body
    import spark.implicits._
    val path = "/tmp/tpq_idx2"
    val centers = t("  fitQuantizer") {
      Cosine.fitQuantizer(embs, "embedding", 8, 42L, 2000)
    }
    t("  centroids.write") {
      centers.zipWithIndex.map { case (c, i) => (i, c.toSeq) }.toSeq
        .toDF("i", "c")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/centroids")
    }
    val assigned = t("  probes+ckpt") {
      Cosine.ivfProbes(embs, "vec_id", "embedding",
          centers, 1, 32768)
        .select(element_at(col("__probes"), 1).as("__cell"),
          col("__id"), col("__v"))
        .localCheckpoint()
    }
    val cb = t("  pq.fit") {
      ProductQuantize.fit(assigned, "__id", "__v", 64,
        8, 16, 2, 2000)
    }
    t("  codebooks.write") {
      cb.centroids.zipWithIndex.flatMap { case (book, j) =>
        book.zipWithIndex.map { case (c, ci) => (j, ci, c.toSeq) }
      }.toSeq.toDF("j", "c", "centroid")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/codebooks")
    }
    val codes = t("  encode+ckpt") {
      ProductQuantize.encode(assigned, "__id", "__v", cb)
        .localCheckpoint()
    }
    t("  bucketed.write") {
      graft.sources.TableSink.writeBucketed(
        assigned.join(codes, "__id")
          .select(col("__cell"), col("__id"), col("__codes"), col("__v")),
        "tpq2", s"$path/vectors", Seq("__cell"), 8)
    }
    spark.stop()
  }
}
