package graft.similarity

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CosineSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf0001).cache()

  test("cosine of a vector with itself is 1") {
    val bad = emb.select(
      Cosine.cosine(col("embedding").cast("array<double>"),
        col("embedding").cast("array<double>")).as("c"))
      .filter(abs(col("c") - 1.0) > 1e-9)
    assert(bad.count() === 0)
  }

  test("topK returns k rows, descending, excluding the query row") {
    val top = Cosine.topK(emb, "vec_id", "embedding", queryId = 1L, k = 10)
      .collect()
    assert(top.length === 10)
    assert(!top.map(_.getLong(0)).contains(1L))
    val scores = top.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
  }

  test("IVF recall on clustered vectors; embedding dedup removes planted duplicates") {
    import spark.implicits._
    // synthetic clustered embeddings: 8 centers, tight noise
    val dim = 16
    def vec(center: Int, noiseSeed: Int): Seq[Double] =
      (0 until dim).map { d =>
        val c = math.sin(center * 37.0 + d * 1.7) // stable center pattern
        // hash-noise, not a sin lattice: sin(seed*k) phase-aliases at
        // small seed deltas, accidentally planting real near-dups
        val x = math.sin(noiseSeed * 12.9898 + d * 78.233) * 43758.5453
        c + ((x - math.floor(x)) - 0.5) * 0.6
      }
    val rows = (0 until 400).map(i => (i.toLong, vec(i % 8, i)))
    val df = rows.toDF("vec_id", "embedding")
    val exact = Cosine.selfJoinTopK(df.withColumn("__one", lit(1)),
      "vec_id", "embedding", "__one", k = 1).filter(col("rank") === 1)
      .select("a", "b")
    val ivf = Cosine.ivfTopK(df, "vec_id", "embedding", k = 3,
      numCentroids = 8).select("a", "b")
    val nExact = exact.count()
    val hit = exact.intersect(ivf).count()
    // multi-probe (nProbe=2 default) covers cell-border neighbors that
    // single-probe missed — the floor rises from round 1's 0.8
    assert(hit.toDouble / nExact >= 0.9, s"IVF recall $hit/$nExact")
    // single-probe must never beat multi-probe (sanity on the probe set)
    val single = Cosine.ivfTopK(df, "vec_id", "embedding", k = 3,
      numCentroids = 8, nProbe = 1).select("a", "b")
    val hit1 = exact.intersect(single).count()
    assert(hit1 <= hit, s"nProbe=1 found $hit1 > nProbe=2's $hit")

    // plant exact duplicates; embedding dedup must remove them
    val withDups = df.union(df.limit(50).withColumn("vec_id", col("vec_id") + 1000))
    val deduped = graft.dedup.EmbeddingDedup.dedup(withDups, "vec_id",
      "embedding", dim = dim, threshold = 0.999)
    assert(deduped.count() === 400, s"expected 400, got ${deduped.count()}")
  }

  test("IVF broadcast-centroid path matches the literal path exactly") {
    // the adaptive gate (maxPlanCentroidDoubles) switches centroid
    // storage from plan literals to a one-row broadcast relation as
    // nlist × dim grows with the corpus — both paths must produce the
    // SAME rows (the arithmetic order is identical by construction)
    val sample = emb.filter(col("vec_id") < 300)
    val literal = Cosine.ivfTopK(sample, "vec_id", "embedding", k = 3,
      numCentroids = 8, maxPlanCentroidDoubles = Int.MaxValue)
    val bcast = Cosine.ivfTopK(sample, "vec_id", "embedding", k = 3,
      numCentroids = 8, maxPlanCentroidDoubles = 0)
    assert(literal.exceptAll(bcast).isEmpty && bcast.exceptAll(literal).isEmpty,
      "broadcast-centroid IVF diverged from the literal-centroid path")
    // plan-shape check on the probe stage itself (ivfTopK checkpoints
    // it, which would hide the join): above the gate the centroid
    // matrix arrives via a broadcast join and the plan text stays
    // small no matter how large nlist grows; below it the literals are
    // inlined and no join exists
    val centers = Array.tabulate(8)(i =>
      Array.tabulate(64)(d => math.sin(i * 37.0 + d)))
    val bPlan = Cosine.ivfProbes(sample, "vec_id", "embedding", centers,
      nProbe = 2, maxPlanCentroidDoubles = 0)
      .queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastNestedLoopJoin"),
      "forced-broadcast IVF probe plan shows no broadcast join")
    val lPlan = Cosine.ivfProbes(sample, "vec_id", "embedding", centers,
      nProbe = 2, maxPlanCentroidDoubles = Int.MaxValue)
      .queryExecution.executedPlan.toString
    assert(!lPlan.contains("Join"), "literal IVF probe plan grew a join")
    // the broadcast plan must be free of the per-centroid literal
    // blowup: at 8×64 the literal plan inlines ≥512 doubles, the
    // broadcast one carries none of them
    assert(bPlan.length < lPlan.length,
      s"broadcast plan (${bPlan.length} chars) not smaller than literal (${lPlan.length})")
  }

  test("measured recall/cost knee holds at sf0.01 (curve in SCALING.md)") {
    // operating points from graft.tools.AnnRecallCurve (deterministic:
    // fixed seeds, fixed corpus): recall@1 vs the exact top-1 on the
    // REAL embeddings table. Floors sit just under the measured values
    // (LSH tables=12: 0.846, IVF nProbe=8: 0.850) so a recall
    // regression in banding, probe selection, or scoring fails here
    // before it silently degrades c3_ann_topk / c3_ivf_topk.
    val embs = Tables.embeddings(spark, sf001).localCheckpoint()
    val exact = Cosine.selfJoinTopK(embs.withColumn("__all", lit(1)),
        "vec_id", "embedding", "__all", k = 1)
      .select("a", "b").localCheckpoint()
    val nExact = exact.count()
    def recallOf(approx: org.apache.spark.sql.DataFrame): Double =
      exact.intersect(approx.select("a", "b")).count().toDouble / nExact
    val lsh = recallOf(Cosine.annTopK(embs, "vec_id", "embedding",
      dim = 64, k = 1, numTables = 12))
    assert(lsh >= 0.8, s"LSH tables=12 recall@1 $lsh below the 0.846 knee")
    val ivf = recallOf(Cosine.ivfTopK(embs, "vec_id", "embedding",
      k = 1, nProbe = 8))
    assert(ivf >= 0.8, s"IVF nProbe=8 recall@1 $ivf below the 0.850 knee")
  }

  test("DEFAULT annTopK operating point clears a 0.7 recall@10 floor at sf0.1") {
    // r6 verdict: the shipped default (targetBucket 32 → planes 6 at
    // 2000 vectors) measured 0.36 recall@10 — speed-tuned past the
    // knee. The default now sits AT the measured knee (targetBucket
    // 128 → planes 4, 0.711 recall@10 in SCALING.md's grid). This
    // floor pins the DEFAULT call — the exact shape a user ships
    // without reading the grid — not a hand-picked operating point.
    val embs = Tables.embeddings(spark, sf01).localCheckpoint()
    val exact = Cosine.selfJoinTopK(embs.withColumn("__all", lit(1)),
        "vec_id", "embedding", "__all", k = 10)
      .select("a", "b").localCheckpoint()
    val nExact = exact.count()
    val ann = Cosine.annTopK(embs, "vec_id", "embedding", dim = 64, k = 10)
    val hit = exact.intersect(ann.select("a", "b")).count()
    assert(hit.toDouble / nExact >= 0.7,
      s"default annTopK recall@10 ${hit.toDouble / nExact} below the 0.711 knee")
    // and the high-recall multiprobe point (tables=4, planes=4,
    // probeBits=1 — 0.938 measured) holds a 0.9 floor: one flipped
    // sign bit on the query side recovers across-one-hyperplane
    // misses more cheaply than quadrupling the tables
    val mp = Cosine.annTopK(embs, "vec_id", "embedding", dim = 64, k = 10,
      numPlanes = 4, numTables = 4, probeBits = 1)
    val mpHit = exact.intersect(mp.select("a", "b")).count()
    assert(mpHit.toDouble / nExact >= 0.9,
      s"multiprobe recall@10 ${mpHit.toDouble / nExact} below the 0.938 point")
  }

  test("ANN recall against the exact global top-1 baseline") {
    val sample = emb.filter(col("vec_id") < 200).withColumn("__all", lit(1))
    val exact = Cosine.selfJoinTopK(sample, "vec_id", "embedding", "__all", k = 1)
      .filter(col("rank") === 1).select("a", "b")
    val ann = Cosine.annTopK(sample, "vec_id", "embedding", dim = 64, k = 3)
      .select("a", "b")
    val nExact = exact.count()
    val hit = exact.intersect(ann).count()
    assert(nExact > 0)
    // neighbors here are near-orthogonal (cos≈0.2): 12 tables × 3 planes
    // gives per-pair detection ≈ 1-(1-0.17)^12 ≈ 0.89
    assert(hit.toDouble / nExact >= 0.6, s"ANN recall $hit/$nExact")
  }
}
