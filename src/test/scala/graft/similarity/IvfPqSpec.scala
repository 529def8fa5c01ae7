package graft.similarity

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** IVF-PQ composed serving index: candidates score from CODES only
  * (the scoring scan prunes the raw vector column — the 32× IO claim,
  * asserted on the ReadSchema), the shortlist re-ranks by exact
  * cosine, and recall against the exact brute force stays above the
  * floor at the default probe/shortlist operating point. */
class IvfPqSpec extends SparkSpec {

  private val K = 3
  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("ivfpq").toString
  private lazy val embs = Tables.embeddings(spark, sf0001).localCheckpoint()
  private lazy val queries = embs.filter(col("vec_id") < 20)

  private def written(): Unit = IvfPqSpec.synchronized {
    if (!IvfPqSpec.built) {
      IvfPq.write(embs, "vec_id", "embedding", dim = 64,
        table = "ivfpq_spec_vectors", path = s"$tmp/idx",
        numCentroids = 8, numBuckets = 4)
      IvfPqSpec.built = true
    }
  }

  /** Exact cosine top-K per query (brute force over the 500-row
    * fixture), the recall reference. */
  private lazy val exact: Map[Long, Seq[Long]] = {
    val rows = queries.select(col("vec_id").as("a")).collect().map(_.getLong(0))
    rows.map { q =>
      q -> Cosine.topK(embs, "vec_id", "embedding", queryId = q, k = K)
        .collect().map(_.getLong(0)).toSeq
    }.toMap
  }

  test("recall@3 vs exact cosine stays above 0.7 at nProbe=3") {
    written()
    val got = IvfPq.topK(spark, "ivfpq_spec_vectors", s"$tmp/idx",
        queries, "vec_id", "embedding", dim = 64, k = K, nProbe = 3, shortlist = 16 * K)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val recalls = exact.map { case (q, truth) =>
      got.get(q).map(g => truth.count(g.contains).toDouble / K).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    info(f"IVF-PQ nProbe=3 shortlist=${16 * K} mean recall@3 = $mean%.3f")
    assert(mean >= 0.7, f"mean recall $mean%.3f below floor")
  }

  test("scoring scan reads codes, not vectors (column pruning = the IO win)") {
    written()
    val served = IvfPq.topK(spark, "ivfpq_spec_vectors", s"$tmp/idx",
      queries, "vec_id", "embedding", dim = 64, k = K, nProbe = 3, shortlist = 16 * K)
    served.collect()
    val physical = served.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the vectors table is scanned twice: scoring (codes, no __v) and
    // shortlist re-rank (__v). Find the per-scan ReadSchemas.
    val schemas = "ReadSchema: struct<([^>]*)>".r
      .findAllMatchIn(physical).map(_.group(1)).toSeq
      .filter(s => s.contains("__cell") || s.contains("__codes") || s.contains("__v"))
    assert(schemas.exists(s => s.contains("__codes") && !s.contains("__v:")),
      s"no codes-only scoring scan found in:\n${schemas.mkString("\n")}")
    assert(schemas.exists(s => s.contains("__v:")),
      s"no vector scan for the re-rank found in:\n${schemas.mkString("\n")}")
    // and the index side never shuffles on the cell key
    assert(!physical.contains("Exchange hashpartitioning(__cell"),
      s"the INDEX side shuffled:\n${physical.take(2000)}")
  }

  test("ranks are 1..K, scores are exact rounded cosines") {
    written()
    val got = IvfPq.topK(spark, "ivfpq_spec_vectors", s"$tmp/idx",
      queries, "vec_id", "embedding", dim = 64, k = K, nProbe = 3, shortlist = 16 * K).collect()
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq === (1L to K).toSeq)
    }
    // spot-check scores against the exact cosine of the same pair
    val byId = embs.select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dd = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < a.length) { dd += a(i)*b(i); na += a(i)*a(i); nb += b(i)*b(i); i += 1 }
      dd / (math.sqrt(na) * math.sqrt(nb))
    }
    got.take(20).foreach { r =>
      val want = cos(byId(r.getLong(0)), byId(r.getLong(1)))
      assert(math.abs(r.getDouble(2) - want) < 1e-5,
        s"score ${r.getDouble(2)} vs exact $want")
    }
  }
}

object IvfPqSpec { @volatile private var built = false }
