package graft.tools

import graft.{GraftExtensions, Tables}
import graft.similarity.ProductQuantize
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timings for the PQ query — where does c3_pq_topk spend its
  * time at a given SF? Usage: runMain graft.tools.ProfilePq <sfDir> */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[pq] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val embs = Tables.embeddings(spark, sfDir)
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val cb = time("fit")(ProductQuantize.fit(
        embs, "vec_id", "embedding", dim = 64, m = 8, ksub = 16,
        iters = 2, fitSample = 2000))
      val codes = time("encode.count")(
        ProductQuantize.encode(embs, "vec_id", "embedding", cb).count())
      println(s"[pq] codes: $codes")
      // phase split found the round-8 pathology: WITHOUT the codes
      // localCheckpoint inside adcTopK, the posexplode re-evaluated the
      // m × ksub argmin per exploded row (encode 0.4 s, scoring 5-10 s);
      // with it the full serve is ~2.4 s warm at this SF
      time("adcTopK.count")(
        ProductQuantize.adcTopK(embs, "vec_id", "embedding",
          embs.filter(col("vec_id") < 10), "vec_id", "embedding",
          cb, k = 10).count())
      // IVF-PQ composed index: write vs serve split
      val tmp = java.nio.file.Files.createTempDirectory("pqprof").toString
      time("ivfpq.write")(graft.similarity.IvfPq.write(
        embs, "vec_id", "embedding", dim = 64,
        table = s"pqprof_$rep", path = s"$tmp/idx",
        numCentroids = 8, fitSample = 2000, numBuckets = 8))
      time("ivfpq.topK.count")(graft.similarity.IvfPq.topK(
        spark, s"pqprof_$rep", s"$tmp/idx",
        embs.filter(col("vec_id") < 50), "vec_id", "embedding",
        dim = 64, k = 10, nProbe = 2).count())
    }
    // recall/cost grid over the ADC shortlist (the PQ operating knob):
    // exact L2 reference by brute force over the query batch
    val cbG = ProductQuantize.fit(embs, "vec_id", "embedding", dim = 64,
      m = 8, ksub = 16, iters = 2, fitSample = 2000)
    val queries = embs.filter(col("vec_id") < 20)
    val cv = embs.select(col("vec_id").as("b"),
      graft.ml.KMeansLloyd.quantize(col("embedding")).as("cv"))
    val qv = queries.select(col("vec_id").as("a"),
      graft.ml.KMeansLloyd.quantize(col("embedding")).as("qv"))
    val d2 = aggregate(zip_with(col("cv"), col("qv"),
      (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
    val exact = qv.crossJoin(cv).filter(col("a") =!= col("b"))
      .withColumn("d2", d2).select("a", "b", "d2").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.sortBy(r => (r.getLong(2),
        r.getLong(1))).take(10).map(_.getLong(1)).toSet }
    println("\n| shortlist | mean recall@10 | sec |")
    println("|---|---|---|")
    Seq(20, 40, 80, 160).foreach { short =>
      val t0 = System.nanoTime()
      val got = ProductQuantize.adcTopK(embs, "vec_id", "embedding",
          queries, "vec_id", "embedding", cbG, k = 10, shortlist = short)
        .collect().groupBy(_.getLong(0))
        .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
      val sec = (System.nanoTime() - t0) / 1e9
      val recall = exact.map { case (q, truth) =>
        got.get(q).map(g => truth.count(g.contains).toDouble / 10).getOrElse(0.0)
      }
      println(f"| $short | ${recall.sum / recall.size}%.3f | $sec%.2f |")
    }
    spark.stop()
  }
}
