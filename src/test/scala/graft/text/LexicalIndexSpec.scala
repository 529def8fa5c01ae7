package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The persisted inverted-index contract: serving from the index
  * returns EXACTLY what a fresh Bm25.topK recompute returns (same
  * postings/df/stats ⇒ same contributions ⇒ same decimal scores ⇒
  * same ranks), and the index side of the serving join never
  * shuffles — the 100 TB side is read in place. */
class LexicalIndexSpec extends SparkSpec {

  private lazy val tmp =
    java.nio.file.Files.createTempDirectory("lex_index").toString

  private lazy val docs = Tables.documents(spark, sf0001).localCheckpoint()
  private lazy val corpus = docs.filter(col("doc_id") >= 10)
  private lazy val queries = docs.filter(col("doc_id") < 10)

  test("serving from the persisted index equals a fresh Bm25 recompute") {
    LexicalIndex.write(corpus, "doc_id", "text",
      table = "lex_spec_postings", path = s"$tmp/idx", numBuckets = 4)
    val served = LexicalIndex.topK(spark, "lex_spec_postings", s"$tmp/idx",
      queries, "doc_id", "text", k = 5)
    val recomputed = Bm25.topK(corpus, "doc_id", "text",
      queries, "doc_id", "text", k = 5)
    assert(served.count() > 0, "fixture queries must hit the corpus")
    assert(served.exceptAll(recomputed).isEmpty &&
           recomputed.exceptAll(served).isEmpty,
      "served index results diverged from the one-shot recompute")
  }

  test("df stopping applies at serve time too") {
    LexicalIndex.write(corpus, "doc_id", "text",
      table = "lex_stop_postings", path = s"$tmp/idx_stop", numBuckets = 4)
    val served = LexicalIndex.topK(spark, "lex_stop_postings",
      s"$tmp/idx_stop", queries, "doc_id", "text", k = 5,
      maxDfFraction = 0.05)
    val recomputed = Bm25.topK(corpus, "doc_id", "text",
      queries, "doc_id", "text", k = 5, maxDfFraction = 0.05)
    assert(served.exceptAll(recomputed).isEmpty &&
           recomputed.exceptAll(served).isEmpty)
    // and stopping actually binds on this fixture (fewer candidates
    // than the unstopped run ⇒ some scores/ranks change)
    val unstopped = LexicalIndex.topK(spark, "lex_stop_postings",
      s"$tmp/idx_stop", queries, "doc_id", "text", k = 5)
    assert(served.exceptAll(unstopped).count() > 0,
      "maxDfFraction=0.05 should change results on the fixture")
  }

  test("incremental merge: (build ∪ merge) ≡ one-shot rebuild bit-exact") {
    // nightly shape: index ~3/4 of the corpus, merge the rest
    val initial = corpus.filter(pmod(col("doc_id"), lit(4)) =!= 0)
    val batch = corpus.filter(pmod(col("doc_id"), lit(4)) === 0)
    LexicalIndex.write(initial, "doc_id", "text",
      table = "lex_incr_postings", path = s"$tmp/idx_incr", numBuckets = 4)
    LexicalIndex.merge(spark, "lex_incr_postings", s"$tmp/idx_incr",
      batch, "doc_id", "text", numBuckets = 4)
    val served = LexicalIndex.topK(spark, "lex_incr_postings",
      s"$tmp/idx_incr", queries, "doc_id", "text", k = 5)
    // one-shot index of the union corpus — the rebuild the merge avoids
    LexicalIndex.write(corpus, "doc_id", "text",
      table = "lex_full_postings", path = s"$tmp/idx_full", numBuckets = 4)
    val rebuilt = LexicalIndex.topK(spark, "lex_full_postings",
      s"$tmp/idx_full", queries, "doc_id", "text", k = 5)
    assert(served.count() > 0)
    assert(served.exceptAll(rebuilt).isEmpty &&
           rebuilt.exceptAll(served).isEmpty,
      "merged index diverged from the one-shot rebuild")
    // stats really are the union's (additive 1-row rewrite)
    val st = spark.read.parquet(s"$tmp/idx_incr/stats").collect()(0)
    val full = spark.read.parquet(s"$tmp/idx_full/stats").collect()(0)
    assert(st === full, s"merged stats $st != rebuilt stats $full")
    // serving the MERGED table still never shuffles the index side
    served.collect()
    val physical = served.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(!physical.contains("Exchange hashpartitioning(term"),
      "merged index side shuffled on term")
    // an empty batch is a no-op, not a corrupted index
    LexicalIndex.merge(spark, "lex_incr_postings", s"$tmp/idx_incr",
      batch.limit(0), "doc_id", "text", numBuckets = 4)
    assert(LexicalIndex.topK(spark, "lex_incr_postings", s"$tmp/idx_incr",
      queries, "doc_id", "text", k = 5)
      .exceptAll(rebuilt).isEmpty)
  }

  test("index side of the serving join never shuffles on term") {
    LexicalIndex.write(corpus, "doc_id", "text",
      table = "lex_plan_postings", path = s"$tmp/idx_plan", numBuckets = 4)
    val served = LexicalIndex.topK(spark, "lex_plan_postings",
      s"$tmp/idx_plan", queries, "doc_id", "text", k = 5)
    served.collect() // finalize the AQE plan before reading it
    val physical = served.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    // the query side travels by broadcast; the postings scan must not
    // contribute a hash exchange on term (the candidate-score groupBy
    // on (query_id, doc_id) is the only wide shuffle in the plan)
    assert(!physical.contains("Exchange hashpartitioning(term"),
      s"the INDEX side shuffled on term:\n${physical.take(2000)}")
    assert(physical.contains("BroadcastHashJoin") ||
           physical.contains("BroadcastNestedLoopJoin"),
      s"query terms did not broadcast:\n${physical.take(2000)}")
  }
}
