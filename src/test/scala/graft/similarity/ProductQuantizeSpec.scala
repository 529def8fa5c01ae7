package graft.similarity

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** PQ contract: deterministic codes/ranks under any layout, honest
  * compression (m codes, each < ksub), and ADC+re-rank recall against
  * the exact L2 top-k. */
class ProductQuantizeSpec extends SparkSpec {

  private val K = 10
  private val Dim = 64

  private lazy val embs = Tables.embeddings(spark, sf0001).localCheckpoint()
  private lazy val queries = embs.filter(col("vec_id") < 10)
  private lazy val cb = ProductQuantize.fit(embs, "vec_id", "embedding",
    dim = Dim, m = 8, ksub = 16, iters = 4)

  /** Exact grid-L2 top-K per query by brute force (q·n pairs). */
  private lazy val exact: Map[Long, Seq[Long]] = {
    val cv = embs.select(col("vec_id").as("b"),
      graft.ml.KMeansLloyd.quantize(col("embedding")).as("__cv"))
    val qv = queries.select(col("vec_id").as("a"),
      graft.ml.KMeansLloyd.quantize(col("embedding")).as("__qv"))
    val d2 = aggregate(zip_with(col("__cv"), col("__qv"),
      (x, y) => (x - y) * (x - y)), lit(0L), (acc, v) => acc + v)
    qv.crossJoin(cv).filter(col("a") =!= col("b"))
      .withColumn("d2", d2)
      .select("a", "b", "d2").collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        q -> rows.sortBy(r => (r.getLong(2), r.getLong(1)))
          .take(K).map(_.getLong(1)).toSeq
      }
  }

  test("driver codebook fit == distributed KMeansLloyd fit, bit-exact") {
    val sample = graft.operators.Sampling.fixedSize(
        embs.select(col("vec_id").cast("long"),
          col("embedding").cast("array<double>")),
        "vec_id", 20000)
      .localCheckpoint()
    Seq(0, 5).foreach { j =>
      val sliced = sample.select(col("vec_id"),
        slice(col("embedding"), j * cb.sub + 1, cb.sub).as("__sv"))
      val distributed = graft.ml.KMeansLloyd.fit(
        sliced, "vec_id", "__sv", cb.ksub, iters = 4).centroids
      assert(cb.centroids(j).map(_.toSeq).toSeq ===
        distributed.map(_.toSeq).toSeq,
        s"subspace $j codebooks diverged between driver and cluster fit")
    }
  }

  test("codes are m entries, each a valid centroid id") {
    val codes = ProductQuantize.encode(embs, "vec_id", "embedding", cb)
      .select(col("__codes")).collect().map(_.getSeq[Long](0))
    assert(codes.nonEmpty && codes.forall(_.length == cb.m))
    assert(codes.forall(_.forall(c => c >= 0 && c < cb.ksub)))
    // the codebooks are actually used: more than one distinct code word
    assert(codes.map(_.mkString(",")).distinct.length > 10)
  }

  test("ADC + exact re-rank hits a 0.7 recall@10 floor vs exact L2") {
    val got = ProductQuantize.adcTopK(embs, "vec_id", "embedding",
        queries, "vec_id", "embedding", cb, k = K, shortlist = 8 * K)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val recalls = exact.map { case (q, truth) =>
      got.get(q).map(g => truth.count(g.contains).toDouble / K).getOrElse(0.0)
    }
    val mean = recalls.sum / recalls.size
    info(f"PQ m=8 ksub=16 shortlist=${8 * K} mean recall@10 = $mean%.3f")
    assert(mean >= 0.7, f"mean recall $mean%.3f below floor")
    // and the DEFAULT operating point (shortlist unset → 16k, the
    // measured knee) must be at least as good — the r6 "speed-tuned
    // default" bug class, pinned at the default call
    val gotDefault = ProductQuantize.adcTopK(embs, "vec_id", "embedding",
        queries, "vec_id", "embedding", cb, k = K)
      .collect().groupBy(_.getLong(0))
      .map { case (q, rows) => q -> rows.map(_.getLong(1)).toSet }
    val meanDefault = exact.map { case (q, truth) =>
      gotDefault.get(q).map(g => truth.count(g.contains).toDouble / K)
        .getOrElse(0.0)
    }.sum / exact.size
    info(f"PQ DEFAULT shortlist mean recall@10 = $meanDefault%.3f")
    assert(meanDefault >= mean - 1e-9,
      f"default operating point ($meanDefault%.3f) worse than 8k ($mean%.3f)")
  }

  test("re-ranked distances are the exact grid distances, ranks total-ordered") {
    val got = ProductQuantize.adcTopK(embs, "vec_id", "embedding",
      queries, "vec_id", "embedding", cb, k = K).collect()
    // spot-check one query's d2 values against the exact reference set:
    // every returned (id, d2) must match the exact pair distance
    val cv = embs.select(col("vec_id"),
        graft.ml.KMeansLloyd.quantize(col("embedding")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    got.foreach { r =>
      val (q, id, d2) = (r.getLong(0), r.getLong(1), r.getLong(2))
      val (a, b) = (cv(q), cv(id))
      var want = 0L
      var i = 0
      while (i < a.length) { val e = a(i) - b(i); want += e * e; i += 1 }
      assert(d2 === want, s"query $q id $id")
    }
    // ranks are 1..K per query
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.map(_.getLong(3)).sorted.toSeq === (1L to K).toSeq)
    }
  }

  test("bit-deterministic under repartitioning") {
    def run(df: org.apache.spark.sql.DataFrame) =
      ProductQuantize.adcTopK(df, "vec_id", "embedding",
          queries, "vec_id", "embedding", cb, k = K)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).sorted.toSeq
    assert(run(embs) === run(embs.repartition(7)))
  }
}
