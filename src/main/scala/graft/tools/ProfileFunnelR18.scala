package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interleaved A/B timing of the c7_curation_v4_funnel FLAGS shape on
  * a noisy host: variant A = the round-17 five-left-join flags,
  * variant B = the round-18 single-pass union-agg flags (+ flags
  * checkpoint). Both run against the same freshly checkpointed
  * v4Stages frames inside one session, alternating A,B,A,B..., so
  * host-load swings hit both variants equally. Reports per-rep and
  * min times. */
object ProfileFunnelR18 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    // the stage frames are SHARED fixture here (checkpointed once):
    // this probe times only the flags+report shape, not v4Stages
    val docs = graft.Tables.documents(spark, sfDir)
    val cleaned = graft.text.ExactSubstring.dedupSubstrings(
      docs.filter(col("doc_id") >= 100), "doc_id", "text", n = 8)
      .localCheckpoint()
    val contam = graft.dedup.Decontaminate.contaminationScoreExact(
      cleaned,
      docs.filter(col("doc_id") < 100).select(col("text").as("clean_text")),
      "doc_id", "clean_text")
      .select(col("doc_id"), col("contamination")).localCheckpoint()
    val quality = cleaned.join(contam, "doc_id")
      .filter(col("contamination") <= 0.2)
      .withColumn("quality",
        graft.text.TextFunctions.qualityScore(col("clean_text")))
      .localCheckpoint()
    val gated = quality.filter(col("quality") >= 0.5)
      .join(docs.select(col("doc_id"), col("source")), "doc_id")
    val stripped = graft.text.Boilerplate.stripFrequentSpans(
      gated.select(col("doc_id"), col("source"), col("clean_text")),
      "doc_id", "clean_text", "source", spanTokens = 4, minDf = 3)
      .localCheckpoint()
    val mixed = graft.operators.Sampling.temperatureMixture(
      stripped.select(col("doc_id"), col("clean_text").as("final_text"))
        .join(docs.select(col("doc_id"), col("source")), "doc_id"),
      "doc_id", "source").localCheckpoint()
    val base = docs.filter(col("doc_id") >= 100).select(col("doc_id"))

    val gates: DataFrame => DataFrame = flags =>
      graft.operators.CurationFunnel.report(flags, Seq(
        "substring_dedup" -> col("__g1"),
        "decontam" -> (col("contamination") <= 0.2),
        "quality" -> (col("quality") >= 0.5),
        "boilerplate" -> col("__g4"),
        "mixture" -> col("__g5")))

    def variantA(): DataFrame = gates(
      base.join(cleaned.select(col("doc_id"), lit(true).as("__g1")),
          Seq("doc_id"), "left")
        .join(contam, Seq("doc_id"), "left")
        .join(quality.select(col("doc_id"), col("quality")),
          Seq("doc_id"), "left")
        .join(stripped.select(col("doc_id"), lit(true).as("__g4")),
          Seq("doc_id"), "left")
        .join(mixed.select(col("doc_id"), lit(true).as("__g5")),
          Seq("doc_id"), "left"))

    def variantB(): DataFrame = {
      def mark(df: DataFrame, k: Int, c: org.apache.spark.sql.Column) =
        df.select(col("doc_id"), lit(k).as("__k"),
          c.cast("double").as("__v"))
      val marks = mark(cleaned, 0, lit(1.0))
        .unionByName(mark(contam, 1, col("contamination")))
        .unionByName(mark(quality, 2, col("quality")))
        .unionByName(mark(stripped, 3, lit(1.0)))
        .unionByName(mark(mixed, 4, lit(1.0)))
        .groupBy(col("doc_id"))
        .agg(max(when(col("__k") === 0, lit(true))).as("__g1"),
          max(when(col("__k") === 1, col("__v"))).as("contamination"),
          max(when(col("__k") === 2, col("__v"))).as("quality"),
          max(when(col("__k") === 3, lit(true))).as("__g4"),
          max(when(col("__k") === 4, lit(true))).as("__g5"))
      gates(base.join(marks, Seq("doc_id"), "left").localCheckpoint())
    }

    val tA = Array.fill(reps)(0.0); val tB = Array.fill(reps)(0.0)
    (0 until reps).foreach { r =>
      var t0 = System.nanoTime()
      variantA().write.mode("overwrite").format("noop").save()
      tA(r) = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      variantB().write.mode("overwrite").format("noop").save()
      tB(r) = (System.nanoTime() - t0) / 1e9
      println(f"[rep $r] A=${tA(r)}%6.2f s  B=${tB(r)}%6.2f s")
    }
    println(f"A(5-join) min=${tA.min}%6.2f s  B(union-agg) min=${tB.min}%6.2f s")
    // cross-check identical outputs
    val a = variantA().collect().map(_.toString).sorted.mkString("\n")
    val b = variantB().collect().map(_.toString).sorted.mkString("\n")
    println(s"outputs identical: ${a == b}")
    spark.stop()
  }
}
