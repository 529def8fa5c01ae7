package graft.similarity

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The persisted-index contract: serving from the index returns
  * EXACTLY what a fresh ivfTopK recompute returns (same quantizer fit
  * parameters ⇒ same centers ⇒ same probes ⇒ same scores), and the
  * index side of the serving join is read in place — bucketed scan,
  * no Exchange. */
class IvfIndexSpec extends SparkSpec {

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("ivf_index").toString

  test("serving from the persisted index equals a fresh ivfTopK recompute") {
    val embs = Tables.embeddings(spark, sf001).localCheckpoint()
    IvfIndex.write(embs, "vec_id", "embedding", table = "ivf_spec_vectors",
      path = s"$tmp/idx", numCentroids = 8, seed = 42L)
    val served = IvfIndex.topK(spark, "ivf_spec_vectors", s"$tmp/idx",
      embs, "vec_id", "embedding", k = 3, nProbe = 2)
    val recomputed = Cosine.ivfTopK(embs, "vec_id", "embedding", k = 3,
      numCentroids = 8, nProbe = 2, seed = 42L)
    assert(served.exceptAll(recomputed).isEmpty &&
           recomputed.exceptAll(served).isEmpty,
      "served index results diverged from the one-shot recompute")
  }

  test("incremental merge: union table under frozen centroids; new vectors findable") {
    val embs = Tables.embeddings(spark, sf001).localCheckpoint()
    val d1 = embs.filter(col("vec_id") % 4 =!= 0)
    val d2 = embs.filter(col("vec_id") % 4 === 0)
    IvfIndex.write(d1, "vec_id", "embedding", table = "ivf_incr_vectors",
      path = s"$tmp/idx_incr", numCentroids = 8, seed = 42L, numBuckets = 4)
    IvfIndex.merge(spark, "ivf_incr_vectors", s"$tmp/idx_incr",
      d2, "vec_id", "embedding", numBuckets = 4)
    // merged table ≡ what write() would produce for the UNION given
    // the SAME (frozen) centroids: assign the union directly and diff
    val centers = IvfIndex.readCentroids(spark, s"$tmp/idx_incr")
    val expected = Cosine.ivfProbes(embs, "vec_id", "embedding", centers,
        nProbe = 1, maxPlanCentroidDoubles = 32768)
      .select(org.apache.spark.sql.functions.element_at(
        col("__probes"), 1).as("__cell"), col("__id"), col("__v"))
    val merged = spark.table("ivf_incr_vectors")
    assert(merged.count() === embs.count())
    assert(merged.exceptAll(expected).isEmpty &&
           expected.exceptAll(merged).isEmpty,
      "merged vector table != frozen-centroid assignment of the union")
    // a merged-in vector is immediately served: querying WITH one of
    // the new vectors returns its exact twin (score 1.0 self excluded;
    // its own cell certainly probes) only if new rows participate —
    // weaker but direct: the new id appears among someone's neighbors
    val served = IvfIndex.topK(spark, "ivf_incr_vectors", s"$tmp/idx_incr",
      d2.limit(20), "vec_id", "embedding", k = 3, nProbe = 2)
    assert(served.count() > 0)
    val newIds = d2.select(col("vec_id")).collect().map(_.getLong(0)).toSet
    val asNeighbors = IvfIndex.topK(spark, "ivf_incr_vectors",
        s"$tmp/idx_incr", d1.limit(50), "vec_id", "embedding",
        k = 5, nProbe = 8)
      .filter(col("b").isin(newIds.toSeq.map(Long.box): _*)).count()
    assert(asNeighbors > 0, "no merged-in vector ever surfaced as a neighbor")
  }

  test("index side of the serving join is bucketed — no Exchange on it") {
    val embs = Tables.embeddings(spark, sf001).localCheckpoint()
    IvfIndex.write(embs, "vec_id", "embedding", table = "ivf_plan_vectors",
      path = s"$tmp/idx2", numCentroids = 8, seed = 42L, numBuckets = 4)
    // force the shuffle join family: a broadcast of the query side
    // would trivially avoid exchanges and hide the property under test
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val served = IvfIndex.topK(spark, "ivf_plan_vectors", s"$tmp/idx2",
        embs.limit(50), "vec_id", "embedding", k = 3, nProbe = 2)
      served.collect() // finalize the AQE plan before reading it
      // AdaptiveSparkPlan.toString prints Final AND Initial plans —
      // assert on the final section only or every exchange counts twice
      val physical = served.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      assert(physical.contains("Bucketed: true"),
        s"index scan not bucketed:\n${physical.take(2000)}")
      // exactly the query side shuffles to meet the bucketed layout;
      // the index (100 TB side) must contribute zero hash exchanges.
      // (The window's rank exchange partitions on `a`, not __cell.)
      val cellExchanges = "Exchange hashpartitioning\\(__(q?)cell".r
        .findAllIn(physical).size
      assert(cellExchanges <= 1,
        s"expected at most the query-side exchange on the cell key, " +
          s"found $cellExchanges:\n${physical.take(2000)}")
      assert(!physical.contains("Exchange hashpartitioning(__cell"),
        s"the INDEX side shuffled:\n${physical.take(2000)}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
  }
}
