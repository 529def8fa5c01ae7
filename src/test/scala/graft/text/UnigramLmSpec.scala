package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {

  import spark.implicits._

  test("viterbi picks the high-probability piece over char-by-char") {
    val lp = Map("ab" -> -0.5, "a" -> -3.0, "b" -> -3.0, "c" -> -3.0)
    assert(UnigramLm.viterbi("abc", lp) === Seq("ab", "c"))
    assert(UnigramLm.viterbi("cab", lp) === Seq("c", "ab"))
  }

  test("viterbi tie-break: equal scores resolve to the longer piece") {
    // "ab" scores exactly a+b → tie; the longer last piece must win
    val lp = Map("a" -> -1.0, "b" -> -1.0, "ab" -> -2.0)
    assert(UnigramLm.viterbi("ab", lp) === Seq("ab"))
  }

  test("viterbi: unknown characters fall back to single-char pieces") {
    val lp = Map("a" -> -1.0)
    assert(UnigramLm.viterbi("axa", lp) === Seq("a", "x", "a"))
    assert(UnigramLm.viterbi("", lp) === Nil)
  }

  test("learn reaches the vocab target, keeps every corpus char, " +
    "and promotes the dominant word") {
    // 'data' dominates the corpus → it must survive as one piece
    val docs = (Seq.fill(50)("data") ++ Seq("mix", "mux", "mex"))
      .map(w => Seq.fill(4)(w).mkString(" "))
      .toDF("text")
    val pieces = UnigramLm.learn(docs, "text", vocabSize = 12,
      maxPieceLen = 4)
    val vocab = pieces.map(_.piece).toSet
    val chars = "dataixumex".map(_.toString).toSet
    assert(chars.subsetOf(vocab), s"missing chars in $vocab")
    assert(vocab.contains("data"), s"dominant word lost: $vocab")
    assert(pieces.count(_.piece.length > 1) + chars.size <= 12 ||
      vocab.size <= 12, s"vocab ${vocab.size} over target")
    val lp = pieces.map(p => p.piece -> p.logProb).toMap
    assert(UnigramLm.viterbi("data", lp) === Seq("data"))
  }

  test("learn is deterministic: two runs produce identical tables") {
    val docs = (1 to 40).map(i => s"alpha beta gamma g$i").toDF("text")
    val a = UnigramLm.learn(docs, "text", vocabSize = 30)
    val b = UnigramLm.learn(docs, "text", vocabSize = 30)
    assert(a === b)
  }

  test("distributed encode ≡ driver viterbi, and round-trips lossless") {
    val docs = (1 to 30).map(i => s"token stream token t$i").toDF("text")
    val pieces = UnigramLm.learn(docs, "text", vocabSize = 25)
    val lp = pieces.map(p => p.piece -> p.logProb).toMap
    val words = Bpe.wordFreq(docs, "text")
    val enc = UnigramLm.encodeWords(words, pieces)
      .select(col("word"), col("pieces"), col("n_pieces")).collect()
    assert(enc.nonEmpty)
    enc.foreach { r =>
      val w = r.getString(0)
      val ps = r.getSeq[String](1)
      assert(ps === UnigramLm.viterbi(w, lp), s"mismatch on $w")
      assert(ps.mkString("") === w, s"lossy round-trip on $w")
      assert(r.getLong(2) === ps.length.toLong)
    }
  }
}
