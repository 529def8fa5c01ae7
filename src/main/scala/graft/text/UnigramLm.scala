package graft.text

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** UNIGRAM-LM TOKENIZER TRAINING (SentencePiece's default algorithm,
  * Kudo 2018) — the second production tokenizer family next to
  * [[Bpe]]: instead of greedy pair merges, hold a vocabulary of
  * candidate pieces with probabilities and keep the subset that best
  * explains the corpus; encoding is the Viterbi-best segmentation
  * under the piece log-probabilities. BPE and unigram-LM are the two
  * algorithms real pipelines train; a tokenizer story with only BPE
  * is half a story.
  *
  * Scale shape — identical to [[Bpe]]'s two-phase decomposition, and
  * for the same reason:
  *  1. ONE corpus-sized pass builds the word-frequency table
  *     ([[Bpe.wordFreq]] — hash agg, partial map-side).
  *  2. Seeding, EM and pruning run DRIVER-SIDE over the bounded word
  *     table (`maxVocabRows` fails fast past the bound). Each EM
  *     round is a dynamic program per word — sequential, tiny, and
  *     exactly what SentencePiece itself does in memory; a cluster
  *     buys nothing here but per-round scheduling latency.
  *  3. ENCODING is the distributed step that must scale — and it runs
  *     over the DISTINCT word table, not corpus rows ([[encodeWords]]:
  *     Viterbi once per distinct word under the broadcast vocabulary,
  *     weight by frequency; a corpus-side consumer equi-joins words to
  *     pieces). The per-word lattice DP is a genuine
  *     can't-compose-from-builtins case, so it rides a broadcast-map
  *     UDF — the [[graft.operators.BloomJoin]] tier, documented.
  *
  * This implementation is the HARD-EM (Viterbi-count) variant: the
  * E-step counts pieces along each word's best segmentation rather
  * than the full lattice expectation. Hard EM is the common practical
  * simplification (it is what most from-scratch reimplementations
  * ship), keeps every count an integer — so selection and pruning are
  * deterministic under the (count DESC, piece ASC) total order, the
  * [[Bpe]] convention — and converges on the same pieces for the
  * corpus sizes an engine trains in practice.
  *
  * Determinism: seed selection, Viterbi tie-breaks (longer piece at
  * each boundary wins, the SentencePiece convention) and pruning all
  * use explicit total orders over integer counts; log-probs only
  * RANK candidates inside one driver JVM and never cross an engine
  * boundary, so the learned vocabulary is reproducible bit-for-bit.
  * Iterative data-dependent selection is not one SQL query — the
  * query surface is rows-only, with the spec pinning hand-computable
  * segmentations and the driver ≡ distributed encode equivalence. */
object UnigramLm {

  /** One vocabulary entry: surviving piece, its final Viterbi usage
    * count and hard-EM log-probability. */
  case class Piece(piece: String, count: Long, logProb: Double)

  /** Learn a vocabulary of ≤ `vocabSize` pieces over the lowercase
    * letter-run words of `textCol`. Single characters observed in the
    * corpus are always kept (coverage guarantee: every word stays
    * encodable). `maxPieceLen` bounds candidate length; each round
    * runs one hard-EM re-count then drops the weakest
    * (1 − `keepFrac`) of multi-char pieces until the target size. */
  def learn(df: DataFrame, textCol: String, vocabSize: Int,
            maxPieceLen: Int = 6, keepFrac: Double = 0.75,
            maxVocabRows: Int = 5000000): Seq[Piece] = {
    require(vocabSize >= 1 && maxPieceLen >= 1)
    require(keepFrac > 0 && keepFrac < 1)
    val rows = Bpe.wordFreq(df, textCol).limit(maxVocabRows + 1).collect()
    require(rows.length <= maxVocabRows,
      s"word table exceeds maxVocabRows=$maxVocabRows")
    learnLocal(rows.map(r => (r.getString(0), r.getLong(1))),
      vocabSize, maxPieceLen, keepFrac)
  }

  /** The in-memory seed → hard-EM → prune loop over a (word, freq)
    * table — exposed for spec-level determinism pinning. */
  def learnLocal(table: Array[(String, Long)], vocabSize: Int,
                 maxPieceLen: Int, keepFrac: Double): Seq[Piece] = {
    val chars: Set[String] =
      table.iterator.flatMap(_._1.map(_.toString)).toSet
    // ---- seed: substring counts up to maxPieceLen, all chars kept --
    val subCount = mutable.HashMap.empty[String, Long]
    table.foreach { case (w, f) =>
      var i = 0
      while (i < w.length) {
        var l = 1
        while (l <= maxPieceLen && i + l <= w.length) {
          val s = w.substring(i, i + l)
          subCount(s) = subCount.getOrElse(s, 0L) + f
          l += 1
        }
        i += 1
      }
    }
    val seedSize = math.max(vocabSize * 4, chars.size)
    var vocab: Map[String, Long] = {
      val multi = subCount.iterator.filter(_._1.length > 1).toArray
        .sortBy { case (p, c) => (-c, p) }
        .take(math.max(0, seedSize - chars.size))
      (chars.iterator.map(c => c -> subCount.getOrElse(c, 1L)) ++
        multi.iterator).toMap
    }
    // ---- hard-EM + prune rounds until the target size --------------
    var done = false
    var counts: Map[String, Long] = null
    while (!done) {
      val lp = logProbs(vocab)
      val used = mutable.HashMap.empty[String, Long]
      table.foreach { case (w, f) =>
        viterbi(w, lp).foreach(p =>
          used(p) = used.getOrElse(p, 0L) + f)
      }
      counts = used.toMap
      val multi = vocab.keysIterator.filter(_.length > 1).toArray
      if (chars.size + multi.length <= vocabSize) done = true
      else {
        // rank multi-char pieces by Viterbi usage; keep the strongest
        // keepFrac (at least down to the target), chars untouchable
        val budget = math.max(vocabSize - chars.size,
          math.floor(multi.length * keepFrac).toInt)
        val kept = multi
          .map(p => (p, counts.getOrElse(p, 0L)))
          .sortBy { case (p, c) => (-c, p) }
          .take(budget).map(_._1).toSet
        val next = vocab.filter { case (p, _) =>
          p.length == 1 || kept(p) }
        if (next.size == vocab.size) done = true else vocab = next
      }
    }
    val lpFinal = logProbs(vocab)
    vocab.keysIterator.toArray.sorted.map { p =>
      Piece(p, counts.getOrElse(p, 0L), lpFinal(p))
    }.sortBy(p => (-p.count, p.piece)).toSeq
  }

  private def logProbs(vocab: Map[String, Long]): Map[String, Double] = {
    val total = vocab.valuesIterator.map(_.toDouble).sum
    vocab.map { case (p, c) =>
      p -> math.log(math.max(c, 1L).toDouble / total) }
  }

  /** Viterbi-best segmentation of `word` under piece log-probs: at
    * each position keep the best (score, pieces) prefix; on score
    * ties the LONGER last piece wins (the SentencePiece convention),
    * then the lexicographically smaller one — a total order, so the
    * segmentation is deterministic. Characters absent from the vocab
    * surface as themselves with a flat penalty (coverage fallback). */
  def viterbi(word: String, lp: Map[String, Double]): Seq[String] = {
    val n = word.length
    if (n == 0) return Nil
    val unkPenalty = -1e2
    val score = Array.fill(n + 1)(Double.NegativeInfinity)
    val backLen = Array.fill(n + 1)(0)
    score(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      val maxL = math.min(i, 16)
      while (l <= maxL) {
        val piece = word.substring(i - l, i)
        val w = lp.get(piece) match {
          case Some(x) => x
          case None => if (l == 1) unkPenalty else Double.NegativeInfinity
        }
        if (w > Double.NegativeInfinity && score(i - l) > Double.NegativeInfinity) {
          val s = score(i - l) + w
          val better = s > score(i) ||
            (s == score(i) && (l > backLen(i) ||
              (l == backLen(i) && piece < word.substring(i - backLen(i), i))))
          if (better) { score(i) = s; backLen(i) = l }
        }
        l += 1
      }
      i += 1
    }
    val out = List.newBuilder[String]
    var pos = n
    val rev = mutable.ArrayBuffer.empty[String]
    while (pos > 0) {
      val l = backLen(pos)
      rev += word.substring(pos - l, pos)
      pos -= l
    }
    rev.reverseIterator.foreach(out += _)
    out.result()
  }

  /** Learned vocabulary as a DataFrame (the query-surface shape):
    * `(rank, piece, count, log_prob (6dp))`. */
  def piecesDf(spark: SparkSession, pieces: Seq[Piece]): DataFrame = {
    import spark.implicits._
    pieces.zipWithIndex
      .map { case (p, i) =>
        (i.toLong, p.piece, p.count,
          math.floor(p.logProb * 1e6 + 0.5) / 1e6) }
      .toDF("rank", "piece", "count", "log_prob")
  }

  /** DISTRIBUTED ENCODE — Viterbi over the distinct word table under
    * the broadcast vocabulary: one row per (word, freq) in, one row
    * out with the piece array and count. Cost ∝ |distinct words|
    * (vocabulary-sized), never corpus rows; a corpus consumer joins
    * words → pieces on the word key. Spec-pinned ≡ driver
    * [[viterbi]]. */
  def encodeWords(words: DataFrame, pieces: Seq[Piece]): DataFrame = {
    val spark = words.sparkSession
    val lp = pieces.map(p => p.piece -> p.logProb).toMap
    val bcast = spark.sparkContext.broadcast(lp)
    val seg = udf((w: String) =>
      if (w == null) null else viterbi(w, bcast.value))
    words.withColumn("pieces", seg(col("word")))
      .withColumn("n_pieces", size(col("pieces")).cast("bigint"))
  }
}
