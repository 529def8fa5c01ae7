package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Near-duplicate detection via MinHash + LSH banding (C2), the
  * standard web-corpus dedup pipeline: word-shingle → 64-bit shingle
  * hash → k permutation-min signatures → band buckets → candidate
  * pairs → (optional) exact Jaccard confirm → connected components →
  * keep one doc per cluster.
  *
  * Scale shape: signatures are computed in ONE pass over the shingle
  * array with a single `aggregate` expression (no UDF, stays in
  * codegen). Banding explodes each doc into `bands` rows — a constant
  * factor — and candidate generation is a self-join *within buckets
  * only*. At 100 TB the bucket join is the only quadratic risk; the
  * bucket-size cap below drops degenerate buckets (boilerplate shingles)
  * exactly as production pipelines do.
  */
object MinHashDedup {

  // 2^31 - 1 (Mersenne): with a,b,h < p, a*h + b < 2^62 stays inside
  // long range, so the permutation math never overflows under ANSI.
  private val Prime = 2147483647L

  /** Deterministic permutation parameters (seeded). */
  private def params(k: Int, seed: Long): (Seq[Long], Seq[Long]) = {
    val rng = new scala.util.Random(seed)
    def pos(): Long = math.abs(rng.nextLong()) % (Prime - 1) + 1
    (Seq.fill(k)(pos()), Seq.fill(k)(pos()))
  }

  /** k-wide MinHash signature of a text column, one aggregate pass. */
  def signature(text: Column, numHashes: Int, shingleSize: Int,
                seed: Long = 42L): Column = {
    val (a, b) = params(numHashes, seed)
    val hashes = transform(TextFunctions.shingles(text, shingleSize),
      s => pmod(xxhash64(s), lit(Prime)))
    val aArr = array(a.map(lit): _*)
    val bArr = array(b.map(lit): _*)
    val idx = sequence(lit(0), lit(numHashes - 1))
    val init = array_repeat(lit(Long.MaxValue), numHashes)
    aggregate(hashes, init, (acc, h) =>
      zip_with(acc, idx, (m, i) =>
        least(m, pmod(element_at(aArr, i + 1) * h + element_at(bArr, i + 1), lit(Prime)))))
  }

  /** Whole-table signatures via explode + k min-aggregates — same
    * result as [[signature]] but ~an order of magnitude faster: the
    * hash-agg path keeps k long buffers per doc instead of allocating
    * a k-element array per shingle. Returns (doc, sig). */
  def signatures(df: DataFrame, idCol: String, textCol: String,
                 numHashes: Int, shingleSize: Int, seed: Long): DataFrame = {
    val (a, b) = params(numHashes, seed)
    val exploded = df.select(col(idCol).as("doc"),
        explode(TextFunctions.shingles(col(textCol), shingleSize)).as("sh"))
      .select(col("doc"), pmod(xxhash64(col("sh")), lit(Prime)).as("h"))
    val mins = (0 until numHashes).map(i =>
      min(pmod(lit(a(i)) * col("h") + lit(b(i)), lit(Prime))).as(s"m$i"))
    exploded.groupBy(col("doc")).agg(mins.head, mins.tail: _*)
      .select(col("doc"),
        array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))
  }

  /** Candidate near-dup pairs (idA < idB) from LSH banding. Buckets
    * larger than `maxBucket` are dropped (degenerate/boilerplate). */
  def candidatePairs(df: DataFrame, idCol: String, textCol: String,
                     numHashes: Int = 32, bands: Int = 8, shingleSize: Int = 3,
                     maxBucket: Int = 64, seed: Long = 42L): DataFrame = {
    val rows = numHashes / bands
    require(bands * rows == numHashes, "bands must divide numHashes")
    val banded = signatures(df, idCol, textCol, numHashes, shingleSize, seed)
      .select(col("doc"), posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws("_", lit("band"), b,
          concat_ws(",", slice(col("sig"), b * rows + 1, lit(rows))))))))
      .toDF("doc", "band", "bucket")
    val small = banded.groupBy("band", "bucket")
      .agg(collect_list(col("doc")).as("docs"))
      .filter(size(col("docs")).between(2, maxBucket))
    // pairs within bucket, deduped across bands
    small.select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
  }

  /** Expose the permutation constants so the DuckDB oracle SQL can
    * embed the SAME (a,b) pairs as the Spark plan. */
  private[graft] def permutationParams(k: Int, seed: Long): (Seq[Long], Seq[Long]) =
    params(k, seed)

  /** Expression-level `let`: evaluate `value` ONCE per row and hand it
    * to `body` as a bound lambda variable. Catalyst has no common-
    * subexpression elimination across lambda scopes, and CollapseProject
    * happily inlines an aliased attribute back INTO a lambda body — so a
    * banding lambda that references the signature array re-evaluates the
    * whole shingle→Horner→16-permutation pipeline once PER BAND, and the
    * explode-pushdown filter re-evaluates it again (measured: the
    * c2_online_dedup_twin claims projection cost 9.9s vs 0.8s for the
    * same arithmetic evaluated once). `transform` over a one-element
    * array is the fix: the value becomes a lambda ARGUMENT, which the
    * evaluator materializes exactly once and the optimizer cannot
    * inline through. */
  private def bindOnce(value: Column, body: Column => Column): Column =
    element_at(transform(array(value), body), 1)

  /** Engine-portable shingle hash: Horner base-31 mod 1e9+7 over the
    * shingle's code points — the same arithmetic DuckDB reproduces via
    * `list_reduce`/`ascii` (see Winnowing for the precedent), unlike
    * xxhash64 which only Spark implements. Native one-pass expression
    * (graft.expressions.HornerHash) — the split+aggregate composition
    * allocated a per-char string array per shingle. */
  def portableShingleHash(sh: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.HornerHash(
        org.apache.spark.sql.GraftColumnBridge.expression(sh)))

  /** Candidate pairs exactly as [[candidatePairs]], but with the
    * portable shingle hash and band buckets keyed by the signature
    * VALUES (comma-joined) instead of an engine hash — every stage is
    * reproducible in DuckDB SQL, putting the LSH banding pipeline
    * itself (not just the Jaccard confirm) under the driver's exact
    * oracle. Same scale shape: one signature pass, banding explode,
    * degenerate-bucket cap, within-bucket pairs. */
  def portableCandidatePairs(df: DataFrame, idCol: String, textCol: String,
                             numHashes: Int = 16, bands: Int = 4,
                             shingleSize: Int = 3, maxBucket: Int = 64,
                             seed: Long = 42L): DataFrame = {
    val rows = numHashes / bands
    require(bands * rows == numHashes, "bands must divide numHashes")
    val (a, b) = params(numHashes, seed)
    val hs = transform(
      TextFunctions.shingles(col(textCol), shingleSize),
      sh => portableShingleHash(sh))
    def sigOf(hsv: Column): Column =
      transform(sequence(lit(0), lit(numHashes - 1)), i =>
        array_min(transform(hsv, h =>
          pmod(element_at(array(a.map(lit): _*), i + 1) * h +
            element_at(array(b.map(lit): _*), i + 1), lit(Prime)))))
    // hs and sig are let-bound (see bindOnce): each evaluated once per
    // row regardless of how many bands reference them
    val buckets = bindOnce(hs, hsv => bindOnce(sigOf(hsv), sigv =>
      transform(sequence(lit(0), lit(bands - 1)),
        bi => concat_ws(",",
          transform(slice(sigv, bi * rows + 1, lit(rows)),
            v => v.cast("string"))))))
    val banded = df
      // zero shingles (empty doc at shingleSize=1) → array_min(null):
      // drop them on both engines rather than bucket nulls together.
      // Filtering on the raw shingle count costs a tokenization pass
      // but no Horner hashing (transform preserves length).
      .filter(size(TextFunctions.shingles(col(textCol), shingleSize)) > 0)
      .select(col(idCol).as("doc"), posexplode(buckets))
      .toDF("doc", "band", "bucket")
    val small = banded.groupBy("band", "bucket")
      .agg(collect_list(col("doc")).as("docs"))
      .filter(size(col("docs")).between(2, maxBucket))
    small.select(explode(col("docs")).as("a"), col("docs"))
      .select(col("a"), explode(col("docs")).as("b"))
      .filter(col("a") < col("b"))
      .distinct()
  }

  /** Per-doc portable band-bucket strings (`"band:v1,v2,..."`) as ONE
    * array column — a pure projection (signature + banding, no shuffle,
    * no self-join), which is exactly what a STREAMING frame can run:
    * [[graft.streaming.StreamingNearDedup]] explodes these into
    * per-bucket claims. Same portable arithmetic as
    * [[portableCandidatePairs]] (Horner shingle hash, value-keyed
    * buckets), so the batch twin sits under the DuckDB oracle.
    * Docs with zero shingles (empty text at shingleSize=1) are dropped,
    * mirroring portableCandidatePairs. Returns (doc_id, buckets). */
  def portableBandedDocs(df: DataFrame, idCol: String, textCol: String,
                         numHashes: Int = 16, bands: Int = 4,
                         shingleSize: Int = 1, seed: Long = 42L): DataFrame = {
    val rows = numHashes / bands
    require(bands * rows == numHashes, "bands must divide numHashes")
    val (a, b) = params(numHashes, seed)
    val hs = transform(
      TextFunctions.shingles(col(textCol), shingleSize),
      sh => portableShingleHash(sh))
    def sigOf(hsv: Column): Column =
      transform(sequence(lit(0), lit(numHashes - 1)), i =>
        array_min(transform(hsv, h =>
          pmod(element_at(array(a.map(lit): _*), i + 1) * h +
            element_at(array(b.map(lit): _*), i + 1), lit(Prime)))))
    // the shingle hashes and the signature are LET-BOUND (bindOnce):
    // materializing them as aliased attributes is NOT enough, because
    // CollapseProject inlines the alias back into the banding lambda
    // and the whole pipeline re-runs once per band (+ once more in the
    // explode-pushdown filter) — measured 9.9s vs 0.8s on this very
    // projection at sf0.1.
    val buckets = bindOnce(hs, hsv => bindOnce(sigOf(hsv), sigv =>
      transform(sequence(lit(0), lit(bands - 1)), bi =>
        concat_ws(":", bi.cast("string"),
          concat_ws(",", transform(slice(sigv, bi * rows + 1, lit(rows)),
            v => v.cast("string")))))))
    df.filter(size(TextFunctions.shingles(col(textCol), shingleSize)) > 0)
      .select(col(idCol).as("doc_id"), buckets.as("buckets"))
  }

  /** Jaccard from two precomputed distinct-shingle arrays. Sizes are
    * ints, so any expression arrangement yields identical doubles. */
  def jaccardFromShingles(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb))
    val uni = size(sa) + size(sb) - inter
    when(uni === 0, lit(0.0)).otherwise(inter.cast("double") / uni.cast("double"))
  }

  /** Exact word-shingle Jaccard similarity for a pair of texts. */
  def jaccard(textA: Column, textB: Column, shingleSize: Int): Column =
    jaccardFromShingles(
      array_distinct(TextFunctions.shingles(textA, shingleSize)),
      array_distinct(TextFunctions.shingles(textB, shingleSize)))

  /** DIRECTIONAL containment |A ∩ B| / |A| — the asymmetric near-dup
    * measure Jaccard dilutes: a short doc quoted whole inside a long
    * one has containment ≈ 1 but Jaccard ≈ |A|/|B| → a quote-
    * expansion duplicate the symmetric threshold misses. Finished on
    * the 6-dp floor-portable grid (§5.3 — no unrounded emitted
    * quotients). Empty A → 0. */
  def containmentFromShingles(sa: Column, sb: Column): Column = {
    val inter = size(array_intersect(sa, sb))
    when(size(sa) === 0, lit(0.0))
      .otherwise(floor(inter.cast("double") / size(sa).cast("double")
        * lit(1e6) + lit(0.5)) / lit(1e6))
  }

  /** Candidate pairs confirmed by exact Jaccard ≥ threshold. Shingle
    * sets are materialized per DOC before the pair join — shingling per
    * PAIR would multiply the tokenization cost by the candidate count
    * (measured 5× on the bench corpus). */
  def confirmedPairs(df: DataFrame, idCol: String, textCol: String,
                     threshold: Double, numHashes: Int = 32, bands: Int = 8,
                     shingleSize: Int = 3, seed: Long = 42L): DataFrame = {
    val pairs = candidatePairs(df, idCol, textCol, numHashes, bands, shingleSize,
      seed = seed)
    // materialized once: the shingle arrays feed BOTH the a- and b-side
    // joins, and re-shingling the corpus is the dominant repeated cost
    // (same pattern as the ANN bucket-code checkpoint in Cosine)
    val sh = df.select(col(idCol),
      array_distinct(TextFunctions.shingles(col(textCol), shingleSize)).as("__sh"))
      .localCheckpoint()
    pairs
      .join(sh.select(col(idCol).as("a"), col("__sh").as("__sha")), "a")
      .join(sh.select(col(idCol).as("b"), col("__sh").as("__shb")), "b")
      .withColumn("jaccard", jaccardFromShingles(col("__sha"), col("__shb")))
      .filter(col("jaccard") >= threshold)
      .select("a", "b", "jaccard")
  }

  /** Connected components over an (a,b) edge list by iterative min-label
    * propagation — the GraphX-free formulation that is just joins and
    * aggregations, so it scales like any shuffle and needs no extra
    * dependency. Converges in O(diameter) rounds and exits as soon as a
    * round changes nothing, so a generous `maxIter` costs nothing on
    * short-chain near-dup graphs. Non-convergence is VISIBLE: a warning
    * is logged (use [[connectedComponentsConverged]] for the flag) —
    * a 100 TB corpus with dup-chains longer than the cap must not
    * silently mis-cluster.
    * Returns (id, component) where component = min id in the cluster. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 50,
                          smallGraphMaxEdges: Long = 1L << 20): DataFrame = {
    val (labels, converged, rounds) =
      connectedComponentsConverged(edges, maxIter, smallGraphMaxEdges)
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"connectedComponents did NOT converge within $rounds rounds " +
          s"(maxIter=$maxIter): long duplicate chains may be split " +
          "across components; raise maxIter")
    labels
  }

  /** [[connectedComponents]] plus the convergence flag and round count.
    * Convergence is detected by comparing consecutive round fingerprints,
    * so the flag can first be true after round 2 — on the DISTRIBUTED
    * path, `maxIter = 1` always reports `converged = false` on a
    * nonempty edge set (which is also semantically right: one round of
    * min-label propagation is only a fixpoint for a graph of isolated
    * pairs). An EMPTY edge set returns immediately as converged with 0
    * rounds.
    *
    * ADAPTIVE SMALL-GRAPH PATH: when the (materialized) edge list holds
    * at most `smallGraphMaxEdges` rows, components are computed by
    * union-find on the driver — exact, single job, `converged = true`,
    * 0 rounds. The near-dup GRAPH is typically orders of magnitude
    * smaller than the corpus (confirmed pairs only), so even 100 TB
    * runs often fit the default 2²⁰-edge bound (edges stream through
    * `toLocalIterator` partition-by-partition, so driver heap holds the
    * union-find map — one entry per distinct id — not 2²⁰ boxed Rows);
    * when they don't, the checkpointed distributed rounds run unchanged.
    * Same AQE philosophy as broadcast-threshold joins: pick the
    * physical strategy from the measured size, keep semantics
    * identical (DedupSpec asserts driver == distributed labels). Pass
    * `smallGraphMaxEdges = 0` to force the distributed path. */
  def connectedComponentsConverged(edges: DataFrame, maxIter: Int = 50,
                                   smallGraphMaxEdges: Long = 1L << 20)
      : (DataFrame, Boolean, Int) = {
    // localCheckpoint after every round: iterative self-joins double the
    // logical plan per iteration, and Catalyst re-analyzes the WHOLE
    // lineage each round (cache doesn't truncate it) — without the
    // checkpoint, planning time explodes exponentially with maxIter.
    // Checkpoint the edge list BEFORE symmetrizing: a union of `edges`
    // with its own swap executes the entire upstream candidate+confirm
    // pipeline TWICE (measured ~2× the whole dedup cost at sf0.1).
    val e = edges.select(col("a"), col("b")).localCheckpoint()
    val nEdges = e.count()
    if (nEdges == 0)
      return (e.select(col("a").as("id"), col("b").as("component")),
        true, 0)
    if (nEdges <= smallGraphMaxEdges)
      return (driverComponents(e), true, 0)
    val sym = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .localCheckpoint()
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()
    // change-detection fingerprint that works for ANY id type (summing
    // raw ids breaks for string/double ids): decimal sum of per-row
    // hashes — decimal so an ANSI long-sum overflow can't throw
    def labelSum(df: DataFrame): java.math.BigDecimal =
      Option(df.agg(sum(xxhash64(col("id"), col("component"))
          .cast("decimal(38,0)"))).collect()(0).getDecimal(0))
        .getOrElse(java.math.BigDecimal.ZERO)
    // no fingerprint of the INITIAL labels: a nonempty edge set always
    // changes something in round 1 (every b of an a<b edge adopts a),
    // so the first comparable sum is round 1's — one job saved per call
    var prevSum: Option[java.math.BigDecimal] = None
    var i = 0
    var converged = false
    while (i < maxIter && !converged) {
      val neighborMin = sym
        .join(labels, sym("b") === labels("id"))
        .groupBy(sym("a").as("id2"))
        .agg(min(col("component")).as("nbr_component"))
      val updated = labels.join(neighborMin, labels("id") === col("id2"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr_component"), col("component")))
            .as("component"))
        .localCheckpoint()
      val newSum = labelSum(updated)
      labels = updated
      converged = prevSum.exists(_.compareTo(newSum) == 0)
      prevSum = Some(newSum)
      i += 1
    }
    (labels, converged, i)
  }

  /** Driver-side union-find over a SMALL collected edge list, emitting
    * the same (id, component = min id of cluster) labels as the
    * distributed fixpoint. Works for any Comparable id type (long,
    * string, ...), matching the distributed path's type-agnosticism. */
  private def driverComponents(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    val parent = scala.collection.mutable.HashMap.empty[Any, Any]
    def find(x: Any): Any = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x // path compression
      while (parent(c) != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    // stream the (already checkpointed) edges: a full collect() of 2²⁰
    // edges materializes ~1M boxed GenericRows (100 MB+ of driver heap)
    // all at once; the iterator keeps only the union-find map (one entry
    // per distinct id) resident. coalesce(1) first — toLocalIterator
    // runs ONE Spark job per partition fetched, and with cluster-scale
    // shuffle.partitions (200–2000) that is hundreds of sequential
    // driver round-trips for a ≤16 MB edge set. The edge count is
    // already measured ≤ smallGraphMaxEdges before entering this path,
    // so a single partition is bounded by construction → exactly one
    // fetch job.
    e.coalesce(1).toLocalIterator().forEachRemaining { row =>
      val a = row.get(0); val b = row.get(1)
      if (!parent.contains(a)) parent(a) = a
      if (!parent.contains(b)) parent(b) = b
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent(rb) = ra
    }
    // the min label must agree with the distributed path's min(component):
    // Spark orders strings as UTF-8 bytes (UTF8String), while Java
    // String.compareTo is UTF-16 code-unit order — the two diverge for
    // supplementary (non-BMP) characters, which would flip cluster labels
    // depending on which side of smallGraphMaxEdges a run lands
    val ord: Ordering[Any] = (x: Any, y: Any) => (x, y) match {
      case (a: String, b: String) =>
        org.apache.spark.unsafe.types.UTF8String.fromString(a)
          .compareTo(org.apache.spark.unsafe.types.UTF8String.fromString(b))
      case _ => x.asInstanceOf[Comparable[Any]].compareTo(y)
    }
    val rows = parent.keys.toSeq.groupBy(find).valuesIterator.flatMap { ns =>
      val m = ns.min(ord)
      ns.map(n => org.apache.spark.sql.Row(n, m))
    }.toSeq
    val idType = e.schema.fields(0).dataType
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id", idType),
      org.apache.spark.sql.types.StructField("component", idType)))
    spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
  }

  /** End-to-end near-dup removal: keep one doc per confirmed cluster
    * plus all unclustered docs. ONE corpus scan: the (small) component
    * table joins in with a per-id keep flag (id == min id of its
    * cluster), and unclustered rows pass through the left join as
    * null-flag rows — the previous anti-join ∪ semi-join shape read
    * the corpus twice. */
  def dedup(df: DataFrame, idCol: String, textCol: String,
            threshold: Double = 0.8, numHashes: Int = 32, bands: Int = 8,
            shingleSize: Int = 3, seed: Long = 42L): DataFrame = {
    val comps = connectedComponents(confirmedPairs(df, idCol, textCol, threshold,
      numHashes, bands, shingleSize, seed))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("component"))
    val flags = comps
      .withColumn("__keep", col("id") === min(col("id")).over(w))
      .select(col("id").as("__cid"), col("__keep"))
    df.join(flags, df(idCol) === flags("__cid"), "left")
      .filter(col("__cid").isNull || col("__keep"))
      .drop("__cid", "__keep")
  }
}
