package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KneserNeySpec extends SparkSpec {

  import spark.implicits._

  // tiny reference corpus: repeated phrases so trigrams recur
  private def ref = Seq(
    (0L, "the cat sat on the mat"),
    (2L, "the cat ate the fish"),
    (4L, "a dog sat on a log"),
    (6L, "the dog ate the bone")).toDF("doc_id", "text")

  test("KN distribution normalizes EXACTLY: single-token docs over " +
    "vocab + unk have probabilities summing to 1") {
    // a 1-token doc is scored as one transition with history (<s>,<s>);
    // 1/ppl recovers P(w | <s>, <s>) up to the 1e-6 log-grid quantization
    val vocab = Seq("the", "cat", "sat", "on", "mat", "ate", "fish",
      "a", "dog", "log", "bone", "zzz_oov")
    val probes = vocab.zipWithIndex
      .map { case (w, i) => (1000L + i, w) }.toDF("doc_id", "text")
    val r = KneserNey.perplexity(probes, ref, "doc_id", "text")
      .select(col("ppl")).collect().map(_.getDouble(0))
    assert(r.length === vocab.length)
    val total = r.map(1.0 / _).sum
    assert(math.abs(total - 1.0) < 1e-3,
      s"P over vocab+unk must sum to 1, got $total")
  }

  test("bigram-level normalization: 2-token docs sharing first token " +
    "sum to 1 after dividing out the shared first-transition prob") {
    // docs "sat w": P(doc) = P(sat|<s>,<s>) · P(w|<s>,sat); summing
    // exp(-2·xent·... ) over w and dividing by P(sat|..) must give 1
    val vocab = Seq("the", "cat", "sat", "on", "mat", "ate", "fish",
      "a", "dog", "log", "bone", "zzz_oov")
    val pairs = vocab.zipWithIndex
      .map { case (w, i) => (2000L + i, s"sat $w") }.toDF("doc_id", "text")
    val first = Seq((3000L, "sat")).toDF("doc_id", "text")
    val pSat = 1.0 / KneserNey.perplexity(first, ref, "doc_id", "text")
      .select(col("ppl")).collect().head.getDouble(0)
    // per-doc joint prob = exp(-n·xent) with n = 2
    val joints = KneserNey.perplexity(pairs, ref, "doc_id", "text")
      .select(col("xent")).collect().map(x => math.exp(-2.0 * x.getDouble(0)))
    val total = joints.sum / pSat
    assert(math.abs(total - 1.0) < 1e-2,
      s"conditional P(w|<s>,sat) must sum to 1, got $total")
  }

  test("a seen reference phrase scores far lower perplexity than " +
    "shuffled/OOV text; OOV tokens are counted") {
    val docs = Seq(
      (10L, "the cat sat on the mat"),
      (11L, "mat the on sat cat the"),
      (12L, "qqq www eee rrr ttt yyy")).toDF("doc_id", "text")
    val r = KneserNey.perplexity(docs, ref, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(4))).toMap
    assert(r(10L)._3 < r(11L)._3,
      s"in-order phrase must beat shuffled: ${r(10L)._3} vs ${r(11L)._3}")
    assert(r(11L)._3 < r(12L)._3,
      s"in-vocab shuffle must beat all-OOV: ${r(11L)._3} vs ${r(12L)._3}")
    assert(r(10L)._2 === 0L && r(12L)._2 === 6L, "n_oov must count OOV")
    assert(r.values.forall(_._1 == 6L))
  }

  test("empty documents drop; determinism across invocations") {
    val docs = Seq((20L, ""), (21L, "the cat")).toDF("doc_id", "text")
    val a = KneserNey.perplexity(docs, ref, "doc_id", "text").collect()
    assert(a.map(_.getLong(0)).toSet === Set(21L), "empty doc must drop")
    val b = KneserNey.perplexity(docs, ref, "doc_id", "text").collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
  }

  test("model state is mergeable: merge(state(A), state(B)) == " +
    "state(A union B) exactly, and scoring from the merged state is " +
    "bit-identical to the full retrain") {
    val a = ref.filter(col("doc_id") % 4 === 0)
    val b = ref.filter(col("doc_id") % 4 =!= 0)
    val merged = KneserNey.mergeStates(
      KneserNey.modelState(a, "doc_id", "text"),
      KneserNey.modelState(b, "doc_id", "text"))
    val full = KneserNey.modelState(ref, "doc_id", "text")
    assert(merged.exceptAll(full).isEmpty && full.exceptAll(merged).isEmpty,
      "merged count table must equal the one-shot count table")
    val docs = Seq((10L, "the cat sat on the mat"),
      (11L, "a dog ate the fish zzz")).toDF("doc_id", "text")
    val viaMerged = KneserNey.perplexityFromState(docs, merged,
      "doc_id", "text").collect().map(_.toString).sorted
    val viaFull = KneserNey.perplexity(docs, ref, "doc_id", "text")
      .collect().map(_.toString).sorted
    assert(viaMerged.sameElements(viaFull),
      "scores from merged state must be bit-identical to retrain")
  }

  test("discount outside (0,1) is rejected") {
    val docs = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      KneserNey.perplexity(docs, ref, "doc_id", "text", discount = 1.0)
    }
    intercept[IllegalArgumentException] {
      KneserNey.perplexity(docs, ref, "doc_id", "text", discount = 0.0)
    }
  }
}
