package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {

  import spark.implicits._

  /** Independent driver-side BPE reference: word-frequency map →
    * repeated (count DESC, pair ASC) argmax + greedy merge. */
  private def referenceLearn(corpus: Seq[String], nMerges: Int,
                             minCount: Long = 2L): Seq[(String, String, Long)] = {
    var words: Map[Vector[String], Long] = corpus
      .flatMap(_.toLowerCase.split("[^a-z]+")).filter(_.nonEmpty)
      .groupBy(identity).map { case (w, ws) =>
        (w.map(_.toString).toVector :+ Bpe.EndOfWord) -> ws.size.toLong
      }
    val out = Seq.newBuilder[(String, String, Long)]
    var done = false
    var r = 0
    while (r < nMerges && !done) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, f) =>
        syms.sliding(2).filter(_.size == 2).foreach { p =>
          val k = (p(0), p(1)); counts(k) = counts.getOrElse(k, 0L) + f
        }
      }
      if (counts.isEmpty) done = true
      else {
        val (pair, cnt) = counts.toSeq
          .sortBy { case ((a, b), c) => (-c, a, b) }.head
        if (cnt < minCount) done = true
        else {
          out += ((pair._1, pair._2, cnt))
          words = words.map { case (syms, f) =>
            applyPair(syms, pair._1, pair._2) -> f
          }
          r += 1
        }
      }
    }
    out.result()
  }

  private def applyPair(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  // the classic Sennrich-style corpus: "low/lower/newest/widest" with
  // skewed frequencies so merge order is forced and interesting
  private val corpus =
    Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
  private val corpusDf = corpus.toDF("text")

  test("distributed learner ≡ driver reference on the classic corpus") {
    val got = Bpe.learn(corpusDf, "text", nMerges = 12)
      .map(m => (m.left, m.right, m.pair_count))
    val want = referenceLearn(corpus, 12)
    assert(got === want)
    // sanity on the content: 'est</w>' family dominates (9 words)
    assert(got.take(2).map(t => t._1 + t._2).toSet === Set("es", "est"))
  }

  test("learner ≡ reference on real documents (sf0.001)") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val texts = docs.select("text").as[String].collect().toSeq
    val got = Bpe.learn(docs.select("text"), "text", nMerges = 8)
      .map(m => (m.left, m.right, m.pair_count))
    assert(got === referenceLearn(texts, 8))
    assert(got.size === 8) // real text never exhausts at 8 merges
  }

  test("distributed merge application ≡ segmentWord on every word") {
    val merges = Bpe.learn(corpusDf, "text", nMerges = 10)
    val words = Bpe.wordFreq(corpusDf, "text")
      .select(col("word"),
        concat(split(col("word"), ""), array(lit(Bpe.EndOfWord))).as("syms"),
        col("freq"))
    val applied = Bpe.applyMerges(words, merges, checkpointEvery = 3)
      .select("word", "syms").as[(String, Seq[String])].collect().toMap
    val pairList = merges.map(m => (m.left, m.right))
    applied.foreach { case (w, syms) =>
      assert(syms === Bpe.segmentWord(w, pairList), s"word=$w")
    }
    // reconstruction: concatenated symbols spell the word + terminal
    applied.foreach { case (w, syms) =>
      assert(syms.mkString === w + Bpe.EndOfWord)
    }
  }

  test("driver-side learner ≡ distributed learner") {
    assert(Bpe.learn(corpusDf, "text", 12) ===
      Bpe.learnDistributed(corpusDf, "text", 12))
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("text")
    assert(Bpe.learn(docs, "text", 8) ===
      Bpe.learnDistributed(docs, "text", 8))
  }

  test("maxVocabRows guard fails fast toward learnDistributed") {
    val e = intercept[IllegalArgumentException] {
      Bpe.learn(corpusDf, "text", 2, maxVocabRows = 1)
    }
    assert(e.getMessage.contains("learnDistributed"))
  }

  test("tie-break is total: equal counts resolve (left, right) ascending") {
    // "ab" and "cd" both appear twice; (a,b) < (c,d) lexicographically
    val df = Seq("ab ab cd cd").toDF("text")
    val merges = Bpe.learn(df, "text", nMerges = 2, minCount = 2)
    assert(merges.head.left === "a" && merges.head.right === "b")
  }

  test("minCount stops the loop; zero merges requested returns empty") {
    assert(Bpe.learn(corpusDf, "text", 0).isEmpty)
    // every pair in a singleton corpus occurs once → minCount=2 stops
    assert(Bpe.learn(Seq("xyz").toDF("text"), "text", 5).isEmpty)
  }

  test("layout-invariant: repartitioned corpus learns identical merges") {
    val a = Bpe.learn(corpusDf, "text", 6)
    val b = Bpe.learn(corpusDf.repartition(5), "text", 6)
    assert(a === b)
  }

  test("fertility: the untrained language pays more tokens per word") {
    import spark.implicits._
    // merges learned on pure-'en' text; 'xx' words share no pairs with
    // it, so every xx word stays at character granularity
    val docs = (Seq.fill(20)(("en", "the the banana banana")) ++
      Seq.fill(20)(("xx", "zq zq wvk wvk")))
      .toDF("lang", "text")
    val merges = Bpe.learn(docs.filter($"lang" === "en")
      .select("text"), "text", nMerges = 12)
    val r = Bpe.fertility(docs, "lang", "text", merges)
      .collect().map(x => x.getString(0) ->
        (x.getLong(1), x.getDouble(3), x.getDouble(4))).toMap
    assert(r("en")._1 === 80L) // 4 words × 20 docs
    // en words collapse toward 1 token; xx words stay ~chars+terminal
    assert(r("en")._2 < r("xx")._2 - 1.0,
      s"en ${r("en")._2} vs xx ${r("xx")._2}")
    assert(r("en")._3 > r("xx")._3, "en tokens carry more chars each")
    // hand floor: xx 'zq' → z,q,</w> = 3; 'wvk' → 4 → tpw = 3.5
    assert(r("xx")._2 === 3.5, r("xx").toString)
  }
}
