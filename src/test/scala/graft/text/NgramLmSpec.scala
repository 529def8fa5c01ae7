package graft.text

import graft.SparkSpec

class NgramLmSpec extends SparkSpec {

  import spark.implicits._

  // Hand model: train on "a b" + "a b c". Vocab {a,b,c}, V = 4.
  // Bigram counts: (<s>,a)=2 (a,b)=2 (b,c)=1; contexts: <s>=2 a=2 b=2 c=1.
  private val ref = Seq((0L, "a b"), (2L, "a b c")).toDF("doc_id", "text")

  private def lp(c2: Long, c1: Long, v: Long, a: Double = 0.5): Double =
    math.floor(math.log((c2 + a) / (c1 + a * v)) * 1e6 + 0.5) / 1e6

  test("hand-computed cross-entropy on a three-word model") {
    val docs = Seq((1L, "a b"), (3L, "a z")).toDF("doc_id", "text")
    val r = NgramLm.perplexity(docs, ref, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getLong(2), x.getDouble(3), x.getDouble(4))).toMap
    // doc 1: <s>→a (2+.5)/(2+2) then a→b (2+.5)/(2+2); no OOV
    val s1 = lp(2, 2, 4) + lp(2, 2, 4)
    val x1 = math.floor(-s1 / 2 * 1e6 + 0.5) / 1e6 // already on grid
    assert(r(1L)._1 === 2L && r(1L)._2 === 0L)
    assert(math.abs(r(1L)._3 - (-s1 / 2)) < 1e-6, r(1L).toString)
    assert(math.abs(r(1L)._4 - math.exp(-s1 / 2)) < 1e-5, r(1L).toString)
    // doc 3: z is OOV → <unk>; <s>→a then a→<unk> with c2=0
    val s3 = lp(2, 2, 4) + lp(0, 2, 4)
    assert(r(3L)._1 === 2L && r(3L)._2 === 1L)
    assert(math.abs(r(3L)._3 - (-s3 / 2)) < 1e-6, r(3L).toString)
  }

  test("reference-looking text scores lower perplexity than noise") {
    val docs = graft.Tables.documents(spark, sf0001)
    val scored = NgramLm.perplexity(
      docs, docs.filter($"doc_id" % 2 === 0), "doc_id", "text")
    val inDist = scored.filter($"doc_id" % 2 === 0)
      .agg(org.apache.spark.sql.functions.avg($"ppl")).head.getDouble(0)
    val held = scored.filter($"doc_id" % 2 =!= 0)
      .agg(org.apache.spark.sql.functions.avg($"ppl")).head.getDouble(0)
    // the held-out half shares the generator, so the gap is small but
    // the training half must not score WORSE than held-out on average
    assert(inDist < held, s"train $inDist vs held-out $held")
    // and a scrambled-alphabet doc is an extreme outlier under the LM
    val noise = Seq((999999L, "qz qx zj xq jzq zqx")).toDF("doc_id", "text")
    val pNoise = NgramLm.perplexity(
        noise.union(docs.select($"doc_id", $"text")),
        docs.filter($"doc_id" % 2 === 0), "doc_id", "text")
      .filter($"doc_id" === 999999L).head.getDouble(4)
    // the synthetic corpus has a small vocabulary, so the <unk> floor
    // 1/V is not astronomical — but noise must still clear the corpus
    // average decisively
    assert(pNoise > 1.3 * held, s"noise ppl $pNoise vs corpus avg $held")
  }

  test("perplexity buckets: per-group thirds, boundary docs go head-ward") {
    val docs = graft.Tables.documents(spark, sf0001)
    val b = NgramLm.perplexityBuckets(
      docs, docs.filter($"doc_id" % 2 === 0), "doc_id", "text", "lang")
      .collect()
    assert(b.length === docs.filter(
      org.apache.spark.sql.functions.length($"text") > 0).count())
    val byLang = b.groupBy(_.getString(1))
    byLang.foreach { case (lang, rows) =>
      val counts = rows.groupBy(_.getString(3)).view.mapValues(_.length)
      val n = rows.length
      Seq("head", "middle", "tail").foreach { bk =>
        val c = counts.getOrElse(bk, 0)
        assert(c > 0 && c <= 2 * n / 3 + 2, s"$lang/$bk = $c of $n")
      }
      // ordering invariant: every head ppl <= every tail ppl
      val maxHead = rows.filter(_.getString(3) == "head")
        .map(_.getDouble(2)).max
      val minTail = rows.filter(_.getString(3) == "tail")
        .map(_.getDouble(2)).min
      assert(maxHead <= minTail, s"$lang: head $maxHead > tail $minTail")
    }
  }

  test("empty docs are dropped; OOV never yields NaN or -inf") {
    val docs = Seq((1L, ""), (2L, "   "), (3L, "zz")).toDF("doc_id", "text")
    val r = NgramLm.perplexity(docs, ref, "doc_id", "text").collect()
    assert(r.map(_.getLong(0)).toSet === Set(3L))
    val row = r.head
    assert(!row.getDouble(3).isNaN && !row.getDouble(3).isInfinite)
    assert(row.getLong(2) === 1L) // zz → <unk>
  }
}
