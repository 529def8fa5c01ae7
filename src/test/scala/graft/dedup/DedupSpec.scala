package graft.dedup

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001).cache()

  test("exact dedup is idempotent and keeps one row per fingerprint") {
    val once = Dedup.exact(docs, "doc_id", "text")
    val twice = Dedup.exact(once.select(docs.columns.map(col): _*), "doc_id", "text")
    assert(once.count() === twice.count())
    val fps = Dedup.withFingerprint(docs, "text")
      .select("fingerprint").distinct().count()
    assert(once.count() === fps)
  }

  test("keepBest keeps the max-score copy, min id on ties, one per group") {
    import spark.implicits._
    val df = Seq(
      // group A: same token SET, different completeness — 3 wins on count
      (1L, "alpha beta"), (3L, "beta alpha beta alpha beta"),
      // group B: byte-identical → count ties → min id (4) wins
      (4L, "gamma delta"), (5L, "gamma delta"),
      // singleton
      (9L, "epsilon")
    ).toDF("doc_id", "text")
    val kept = Dedup.tokenSetKeepBest(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(3L, 4L, 9L))
    // output schema is the input schema (no internal columns leak)
    assert(Dedup.tokenSetKeepBest(df, "doc_id", "text").columns.toSeq
      === df.columns.toSeq)
  }

  test("keepBest equals the naive window form on real documents") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(Dedup.tokenSetFingerprint(col("text")))
      .orderBy(size(graft.text.TextFunctions.tokens(col("text"))).desc,
        col("doc_id").asc)
    val naive = docs.withColumn("__r", row_number().over(w))
      .filter(col("__r") === 1).select("doc_id")
    val got = Dedup.tokenSetKeepBest(docs, "doc_id", "text").select("doc_id")
    assert(got.exceptAll(naive).count() === 0)
    assert(naive.exceptAll(got).count() === 0)
  }

  test("minhash candidate pairs cover the high-jaccard ground truth (recall)") {
    val sample = docs.filter(col("doc_id") < 100)
    // ground truth: token-set jaccard >= 0.9 pairs
    val l = sample.select(col("doc_id").as("a"), col("text").as("__ta"))
    val r = sample.select(col("doc_id").as("b"), col("text").as("__tb"))
    val truth = l.join(r, col("a") < col("b"))
      .withColumn("j", MinHashDedup.jaccard(col("__ta"), col("__tb"), 1))
      .filter(col("j") >= 0.9)
      .select("a", "b")
    val candidates = MinHashDedup.candidatePairs(sample, "doc_id", "text",
      shingleSize = 1).select("a", "b")
    val nTruth = truth.count()
    val found = truth.intersect(candidates).count()
    assert(nTruth > 0, "fixture should contain >=0.9-jaccard near-dup pairs")
    assert(found.toDouble / nTruth >= 0.8,
      s"LSH recall too low: $found/$nTruth")
  }

  test("confirmed pairs all meet the jaccard threshold (precision)") {
    val pairs = MinHashDedup.confirmedPairs(docs.filter(col("doc_id") < 100),
      "doc_id", "text", threshold = 0.7, shingleSize = 1)
    assert(pairs.filter(col("jaccard") < 0.7).count() === 0)
    assert(pairs.count() > 0)
  }

  test("connected components merge transitive near-dup chains") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a", "b")
    val comps = MinHashDedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps(1L) === 1L && comps(2L) === 1L && comps(3L) === 1L)
    assert(comps(10L) === 10L && comps(11L) === 10L)
  }

  test("connected components converge on a chain longer than round 1's cap, and report status") {
    import spark.implicits._
    // a 30-hop chain: min-label propagation moves one hop per round, so
    // this needs ~30 rounds — round 1's silent maxIter=10 would have
    // mislabeled the tail without any signal
    // smallGraphMaxEdges = 0 forces the DISTRIBUTED rounds — this test
    // pins their convergence reporting, which the driver path bypasses
    val chain = (0L until 30L).map(i => (i, i + 1)).toDF("a", "b")
    val (labels, converged, rounds) =
      MinHashDedup.connectedComponentsConverged(chain, smallGraphMaxEdges = 0)
    assert(converged, s"chain did not converge in $rounds rounds")
    val comps = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps.values.forall(_ === 0L), "all chain nodes must share component 0")
    // an artificially low cap must report non-convergence, not lie
    val (_, conv2, _) = MinHashDedup.connectedComponentsConverged(
      chain, maxIter = 3, smallGraphMaxEdges = 0)
    assert(!conv2, "3 rounds cannot converge a 30-hop chain")
  }

  test("adaptive driver union-find emits the same labels as the distributed rounds") {
    import spark.implicits._
    // pseudo-random graph with chains, triangles, and isolated pairs
    val rng = new scala.util.Random(7)
    val edges = (1 to 400).map { _ =>
      val a = rng.nextInt(300).toLong; val b = rng.nextInt(300).toLong
      (math.min(a, b), math.max(a, b))
    }.filter { case (a, b) => a != b }.toDF("a", "b")
    val driver = MinHashDedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = MinHashDedup.connectedComponents(edges, smallGraphMaxEdges = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver === dist)
    // string ids go through the same generic driver path
    val sEdges = Seq(("x", "y"), ("y", "z"), ("p", "q")).toDF("a", "b")
    val sComps = MinHashDedup.connectedComponents(sEdges)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(sComps === Map("x" -> "x", "y" -> "x", "z" -> "x",
      "p" -> "p", "q" -> "p"))
  }

  test("near-dup dedup removes clustered docs but keeps one per cluster") {
    val sample = docs.filter(col("doc_id") < 100)
    val deduped = MinHashDedup.dedup(sample, "doc_id", "text",
      threshold = 0.9, shingleSize = 1)
    val n = sample.count()
    val m = deduped.count()
    assert(m < n, s"expected near-dups to be removed ($m of $n kept)")
    assert(m > 0)
    // no surviving pair should exceed the threshold... spot-check count
    val pairs = MinHashDedup.confirmedPairs(deduped, "doc_id", "text",
      threshold = 0.9, shingleSize = 1)
    assert(pairs.count() === 0, "dedup left a >=0.9-jaccard pair behind")
  }

  test("simhash: identical text same fingerprint, near pairs found") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally different words entirely here now")).toDF("doc_id", "text")
    val fps = df.select(col("doc_id"), SimHash.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) === fps(2L))
    val pairs = SimHash.nearPairs(df, "doc_id", "text", maxDistance = 3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("containment catches the quote-expansion duplicate Jaccard " +
    "dilutes; asymmetric by construction") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val short = "alpha beta gamma delta"
    val long = s"$short " + (1 to 40).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, short), (2L, long)).toDF("doc_id", "text")
      .select(col("doc_id"), array_distinct(
        graft.text.TextFunctions.shingles(col("text"), 1)).as("sh"))
    val Seq(a, b) = df.orderBy("doc_id").collect()
      .map(_.getSeq[String](1)).toSeq
    val cAB = MinHashDedup.containmentFromShingles(lit(a.toArray), lit(b.toArray))
    val cBA = MinHashDedup.containmentFromShingles(lit(b.toArray), lit(a.toArray))
    val j = MinHashDedup.jaccardFromShingles(lit(a.toArray), lit(b.toArray))
    val r = spark.range(1).select(cAB.as("ab"), cBA.as("ba"), j.as("j"))
      .collect().head
    assert(r.getDouble(0) === 1.0, "short doc fully contained in long")
    assert(r.getDouble(1) < 0.1, "reverse direction is small")
    assert(r.getDouble(2) < 0.1,
      "symmetric Jaccard dilutes below any sane threshold")
  }
}
