package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding similarity search (C3/C4): exact cosine as the baseline,
  * LSH-bucketed approximate as the scale path. Dot products compile to
  * graft's native DotProduct expression (a codegen'd primitive loop,
  * see graft.expressions) with deterministic left-to-right accumulation
  * (matters for the oracle) and the same null semantics as the
  * `aggregate(zip_with(...))` composition it replaced.
  */
object Cosine {

  /** Native codegen'd dot product (graft.expressions.DotProduct): a bare
    * primitive loop over the array buffers — same left-to-right
    * accumulation order as the previous `aggregate(zip_with(...))`
    * composition (bit-identical results) without its per-row
    * intermediate array allocation. Built directly as an Expression so
    * it works in any session, registered or not. */
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.DotProduct(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Top-k most similar rows to one query vector (C4). The query row is
    * a one-row broadcast cross-join — the plan is scan → projection →
    * TakeOrderedAndProject, no shuffle of the big side. Scores rounded
    * to 6 dp (absorbs FP accumulation-order noise) with id tie-break so
    * the ranking is total and engine-portable. */
  def topK(df: DataFrame, idCol: String, vecCol: String, queryId: Long,
           k: Int): DataFrame = {
    val q = df.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>").as("__q"))
    df.crossJoin(broadcast(q))
      .filter(col(idCol) =!= queryId)
      .withColumn("score", round(cosine(col(vecCol).cast("array<double>"), col("__q")), 6))
      .orderBy(col("score").desc, col(idCol).asc)
      .limit(k)
      .select(col(idCol), col("score"))
  }

  /** Exact all-pairs top-k within a partition key (label) — brute force
    * is O(n²) per group, so real corpora bucket by an IVF/LSH key first;
    * the operator shape (per-bucket self-join + window top-k) is the
    * same. */
  def selfJoinTopK(df: DataFrame, idCol: String, vecCol: String,
                   bucketCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val l = df.select(col(bucketCol).as("__bk"), col(idCol).as("a"),
      col(vecCol).cast("array<double>").as("__va"))
    val r = df.select(col(bucketCol).as("__bk2"), col(idCol).as("b"),
      col(vecCol).cast("array<double>").as("__vb"))
    val w = Window.partitionBy(col("a")).orderBy(col("score").desc, col("b").asc)
    l.join(r, col("__bk") === col("__bk2") && col("a") =!= col("b"))
      .withColumn("score", round(cosine(col("__va"), col("__vb")), 6))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("a", "b", "score", "rank")
  }

  /** Sign-bit bucket of `numPlanes` seeded random hyperplanes. */
  def lshBucket(vec: Column, dim: Int, numPlanes: Int,
                seed: Long): Column = {
    val rng = new scala.util.Random(seed)
    val planes = Array.fill(numPlanes)(Array.fill(dim)(rng.nextGaussian()))
    val bits = (0 until numPlanes).map { p =>
      val plane = array(planes(p).toIndexedSeq.map(lit): _*)
      when(dot(vec.cast("array<double>"), plane) > 0,
        shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** IVF-style approximate neighbors: a k-means coarse quantizer
    * (MLlib KMeans over the vectors) assigns every row to a centroid
    * cell; neighbors are searched within the cell only — the
    * data-adaptive alternative to random hyperplanes (cells follow the
    * data's cluster structure). Single-probe: at 100 TB the centroid id
    * is the physical bucketing key, and multi-probe is a union over
    * the nProbe nearest cells. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
              numCentroids: Int = 16, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val withVec = df.withColumn("__mlvec",
      array_to_vector(col(vecCol).cast("array<double>")))
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(numCentroids).setSeed(seed)
      .setFeaturesCol("__mlvec").setPredictionCol("__cell")
    val assigned = km.fit(withVec).transform(withVec).drop("__mlvec")
    selfJoinTopK(assigned, idCol, vecCol, "__cell", k)
  }

  /** Approximate top-k neighbors via MULTI-TABLE random-hyperplane LSH:
    * `numTables` independent codes of `numPlanes` bits; candidates share
    * a bucket in at least one table, are deduped, then scored exactly.
    * Multi-table is the part that matters: with near-orthogonal
    * neighbors (cos≈0.2, as in the test embeddings) a single m-bit code
    * has per-pair recall (1−θ/π)^m ≈ 0.1, while L tables lift it to
    * 1−(1−p)^L. At 100 TB each table's (table,bucket) key is the
    * shuffle/bucketing key, and candidate scoring stays per-bucket —
    * never all-pairs. */
  def annTopK(df: DataFrame, idCol: String, vecCol: String, dim: Int,
              k: Int, numPlanes: Int = 3, numTables: Int = 8,
              seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val buckets = array((0 until numTables).map(t =>
      lshBucket(col(vecCol), dim, numPlanes, seed + t * 7919)): _*)
    val coded = df.select(col(idCol).as("__id"),
      col(vecCol).cast("array<double>").as("__v"),
      posexplode(buckets).as(Seq("__table", "__bucket")))
    val l = coded.select(col("__table"), col("__bucket"),
      col("__id").as("a"), col("__v").as("__va"))
    val r = coded.select(col("__table").as("__t2"), col("__bucket").as("__b2"),
      col("__id").as("b"), col("__v").as("__vb"))
    val candidates = l.join(r,
        col("__table") === col("__t2") && col("__bucket") === col("__b2") &&
        col("a") =!= col("b"))
      .select("a", "b").distinct()
    // unit-normalize per VECTOR before the pair join: cosine then costs
    // one dot per pair instead of three (3× on the bench corpus)
    val vecs = df.select(col(idCol).as("__id"), {
      val v = col(vecCol).cast("array<double>")
      val n = norm(v)
      when(n === 0, v).otherwise(transform(v, x => x / n)).as("__v")
    })
    val w = Window.partitionBy(col("a")).orderBy(col("score").desc, col("b").asc)
    // vecs is rows×dim (small relative to the pair set): force broadcast
    // so the 10⁶-scale candidate pairs never shuffle with arrays attached
    candidates
      .join(broadcast(vecs.select(col("__id").as("a"), col("__v").as("__va"))), "a")
      .join(broadcast(vecs.select(col("__id").as("b"), col("__v").as("__vb"))), "b")
      .withColumn("score", round(dot(col("__va"), col("__vb")), 6))
      .withColumn("rank", row_number().over(w).cast("bigint"))
      .filter(col("rank") <= k)
      .select("a", "b", "score", "rank")
  }
}
