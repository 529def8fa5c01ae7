package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BYTE-PAIR-ENCODING TOKENIZER TRAINING — learn a merge table from a
  * corpus (the Sennrich et al. 2016 algorithm every GPT/Llama-family
  * tokenizer descends from): start from characters, repeatedly merge
  * the most frequent adjacent symbol pair. The missing piece of this
  * repo's tokenizer story — token *counting* existed (TextFunctions),
  * tokenizer *training* did not, and at 100 TB training the tokenizer
  * IS a cluster job.
  *
  * Scale shape — the classic two-phase decomposition:
  *  1. ONE pass over the corpus builds the word-frequency table (hash
  *     agg on the word — partial map-side; the result is
  *     vocabulary-sized, millions of rows at web scale, not corpus-
  *     sized). This is the only pass that touches the corpus.
  *  2. The merge loop runs over that BOUNDED word table — and because
  *     it is bounded, [[learn]] collects it once and runs the loop
  *     DRIVER-SIDE with incremental pair-stat maintenance (the
  *     Sennrich reference shape): each round re-touches only the
  *     words containing the merged pair. The alternative of one Spark
  *     job per round ([[learnDistributed]], kept for word tables that
  *     exceed driver memory) is data-scale-safe but pays ~3 sequential
  *     jobs of scheduling latency PER MERGE — a 32k-merge production
  *     vocabulary means ~100k sequential jobs, hours of pure latency
  *     for work that fits in one machine's memory. Tokenizer trainers
  *     (HF, SentencePiece) are driver-side for exactly this reason;
  *     the cluster's job here is the corpus pass, not the argmax loop.
  *
  * Determinism: the argmax tie-breaks (count DESC, left ASC, right
  * ASC) — total order, so the learned merge table is identical for any
  * partitioning or row order (counts are exact integer sums), and the
  * driver and distributed learners are provably interchangeable
  * (BpeSpec pins learn ≡ learnDistributed ≡ an independent reference).
  * The merge application is a left-to-right greedy fold, the standard
  * convention. Iterative data-dependent argmax is not expressible in
  * one SQL query, so the query surface is rows-only.
  *
  * Symbols stay in `[a-z]` + the `</w>` terminal by construction
  * (wordFreq keeps lowercase letter runs only), so embedding them in
  * generated lambda SQL needs no escaping beyond quote doubling.
  */
object Bpe {

  /** One learned merge: `left`+`right` → `merged`, with the pair count
    * that won the round. */
  case class Merge(merge_rank: Int, left: String, right: String,
                   merged: String, pair_count: Long)

  /** (word, freq) over lowercase letter runs of `textCol` — the single
    * corpus-sized pass. */
  def wordFreq(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Learn up to `nMerges` merges; stops early when the best remaining
    * pair occurs fewer than `minCount` times.
    *
    * ONE corpus-sized Spark pass (the word-frequency agg), then the
    * merge loop runs driver-side over the collected word table with
    * INCREMENTAL pair-stat maintenance: round r only re-processes
    * words that contain the pair merged in round r — the Sennrich
    * `learn_bpe` shape. Kills the one-Spark-job-per-merge latency
    * cliff of [[learnDistributed]] (identical output, spec-pinned)
    * while keeping the corpus pass distributed.
    *
    * `maxVocabRows` bounds the driver copy (a web-scale word table is
    * millions of rows — tens of MB — but a caller feeding raw
    * UNtokenizable junk could blow past that); exceeding it fails
    * fast with a pointer to [[learnDistributed]]. */
  def learn(df: DataFrame, textCol: String, nMerges: Int,
            minCount: Long = 2L, maxVocabRows: Int = 5000000): Seq[Merge] = {
    require(nMerges >= 0 && minCount >= 1)
    val rows = wordFreq(df, textCol).limit(maxVocabRows + 1).collect()
    require(rows.length <= maxVocabRows,
      s"word table exceeds maxVocabRows=$maxVocabRows — use learnDistributed")
    learnLocal(
      rows.map(r => (r.getString(0).map(_.toString).toArray :+ EndOfWord,
        r.getLong(1))),
      nMerges, minCount)
  }

  /** The in-memory merge loop over a (symbols, freq) word table —
    * exposed for spec-level equivalence pinning. Selection order and
    * greedy application are IDENTICAL to the distributed form. */
  def learnLocal(table: Array[(Array[String], Long)], nMerges: Int,
                 minCount: Long): Seq[Merge] = {
    import scala.collection.mutable
    val syms = table.map(_._1)
    val freq = table.map(_._2)
    val stats = mutable.HashMap.empty[(String, String), Long]
    val index = mutable.HashMap.empty[(String, String), mutable.Set[Int]]
    def addWord(wi: Int, sign: Long): Unit = {
      val s = syms(wi)
      var i = 0
      while (i + 1 < s.length) {
        val p = (s(i), s(i + 1))
        val n = stats.getOrElse(p, 0L) + sign * freq(wi)
        if (n == 0L) stats.remove(p) else stats(p) = n
        if (sign > 0) index.getOrElseUpdate(p, mutable.Set.empty) += wi
        i += 1
      }
      if (sign < 0) {
        // drop the word from indexes of pairs it no longer contains
        // (recomputed below when the rewritten form is re-added)
        var j = 0
        while (j + 1 < s.length) {
          index.get((s(j), s(j + 1))).foreach(_ -= wi)
          j += 1
        }
      }
    }
    var wi = 0
    while (wi < syms.length) { addWord(wi, 1L); wi += 1 }
    val merges = Seq.newBuilder[Merge]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      // argmax by (count DESC, left ASC, right ASC) — an explicit
      // total order, so HashMap iteration order is irrelevant
      var best: ((String, String), Long) = null
      stats.foreach { case e @ (p, c) =>
        if (best == null || c > best._2 ||
            (c == best._2 && (p._1 < best._1._1 ||
              (p._1 == best._1._1 && p._2 < best._1._2)))) best = e
      }
      if (best == null || best._2 < minCount) done = true
      else {
        val ((a, b), cnt) = best
        merges += Merge(r, a, b, a + b, cnt)
        // only words CONTAINING (a, b) can change — the incremental
        // step that makes round cost ∝ affected words, not vocabulary
        val affected = index.getOrElse((a, b), mutable.Set.empty).toArray
        java.util.Arrays.sort(affected)
        affected.foreach { w =>
          val rewritten = applyPairGreedy(syms(w), a, b)
          if (!java.util.Arrays.equals(
              rewritten.asInstanceOf[Array[AnyRef]],
              syms(w).asInstanceOf[Array[AnyRef]])) {
            addWord(w, -1L)
            syms(w) = rewritten
            addWord(w, 1L)
          }
        }
        r += 1
      }
    }
    merges.result()
  }

  /** One greedy left-to-right (a, b) → ab pass — the driver-side twin
    * of [[mergeOnce]]'s codegen fold. */
  private def applyPairGreedy(s: Array[String], a: String,
                              b: String): Array[String] = {
    val out = Array.newBuilder[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += s(i); i += 1 }
    }
    out.result()
  }

  /** The one-Spark-job-per-round learner — for word tables that exceed
    * driver memory (at which point each round's pair agg and fold ARE
    * cluster-sized work, and the per-round scheduling latency is the
    * price of not fitting in RAM). Output ≡ [[learn]] (spec-pinned). */
  def learnDistributed(df: DataFrame, textCol: String, nMerges: Int,
                       minCount: Long = 2L): Seq[Merge] = {
    require(nMerges >= 0 && minCount >= 1)
    // chars + terminal: "low" → [l, o, w, </w>]
    var words = wordFreq(df, textCol)
      .select(concat(split(col("word"), ""), array(lit(EndOfWord)))
        .as("syms"), col("freq"))
      .localCheckpoint()
    val merges = Seq.newBuilder[Merge]
    var r = 0
    var done = false
    while (r < nMerges && !done) {
      val top = pairCounts(words)
        .orderBy(desc("cnt"), asc("l"), asc("r")).limit(1).collect()
      if (top.isEmpty || top(0).getLong(2) < minCount) done = true
      else {
        val (a, b) = (top(0).getString(0), top(0).getString(1))
        merges += Merge(r, a, b, a + b, top(0).getLong(2))
        words = words.withColumn("syms", mergeOnce(a, b))
        r += 1
        // flatten every few rounds, not every round: each checkpoint is
        // an eager job, and a handful of nested fold projections stays
        // codegen-friendly (measured 5.1 s → fewer sequential jobs)
        if (r % 4 == 0) words = words.localCheckpoint()
      }
    }
    merges.result()
  }

  /** Adjacent-pair counts weighted by word frequency (overlapping
    * pairs counted, the standard convention): (l, r, cnt). */
  def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(explode(expr(
        """transform(sequence(0, size(syms) - 2),
          |  i -> struct(syms[i] AS l, syms[i + 1] AS r))""".stripMargin))
        .as("p"), col("freq"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("freq").as("cnt"))

  /** Apply an ordered merge table to a symbol-array frame (column
    * `syms`) — one codegen'd fold per merge, lineage flattened every
    * few rounds so arbitrarily long merge lists stay plannable. */
  def applyMerges(words: DataFrame, merges: Seq[Merge],
                  checkpointEvery: Int = 8): DataFrame =
    merges.zipWithIndex.foldLeft(words) { case (df, (m, i)) =>
      val merged = df.withColumn("syms", mergeOnce(m.left, m.right))
      if ((i + 1) % checkpointEvery == 0) merged.localCheckpoint()
      else merged
    }

  /** Learned merges as a DataFrame (the query-surface shape). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDF()
  }

  /** Driver-side greedy segmentation of one word under a merge table —
    * the reference semantics the distributed fold must match. */
  def segmentWord(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = word.map(_.toString) :+ EndOfWord
    merges.foreach { case (a, b) =>
      val out = Seq.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      syms = out.result().toIndexedSeq
    }
    syms
  }

  val EndOfWord = "</w>"

  /** One greedy left-to-right merge pass of (a, b) → ab over `syms`,
    * as a fold the codegen can run per row: seed with the first
    * symbol, then either grow the last symbol into the merge or
    * append. (Driver-side loop equivalent: [[segmentWord]].)
    *
    * The seed-with-first trick sidesteps typed-empty-array literals;
    * size-<2 arrays pass through (sequence() would otherwise run
    * backwards on them). */
  private def mergeOnce(a: String, b: String): Column = {
    val qa = lit(a); val qb = lit(b); val qab = lit(a + b)
    val fold = aggregate(
      slice(col("syms"), lit(2), size(col("syms")) - 1),
      slice(col("syms"), lit(1), lit(1)),
      (acc, x) => when(element_at(acc, -1) === qa && x === qb,
        concat(slice(acc, lit(1), size(acc) - 1), array(qab)))
        .otherwise(concat(acc, array(x))))
    when(size(col("syms")) < 2, col("syms")).otherwise(fold)
  }

  /** TOKENIZER FERTILITY — the eval every tokenizer ships with: how
    * many subword tokens a word costs (tokens/word) and how much text
    * each token carries (chars/token), PER LANGUAGE. A vocabulary
    * trained on one language's distribution taxes the others — their
    * fertility climbs, their effective context shrinks, and their
    * per-token training cost rises; this readout is how the tax is
    * measured before a vocabulary ships.
    *
    * Scale shape — the [[learn]] decomposition inverted: the corpus
    * collapses to a (lang, word, freq) table, merges apply once per
    * DISTINCT word (never corpus rows), and the per-language sums are
    * one vocabulary-sized agg. rows+spec like the rest of the BPE
    * family (the merge table is driver-derived state).
    *
    * Output per language: `(lang, n_words, n_tokens,
    * tokens_per_word (6 dp), chars_per_token (6 dp))` — chars count
    * the word's letters (the `</w>` terminal carries none). */
  def fertility(docs: DataFrame, langCol: String, textCol: String,
                merges: Seq[Merge]): DataFrame = {
    val wf = docs
      .select(col(langCol).as("lang"),
        explode(split(lower(col(textCol)), "[^a-z]+")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("lang"), col("word")).agg(count(lit(1)).as("freq"))
    val pieces = applyMerges(
      wf.select(col("word")).distinct()
        .select(col("word"),
          concat(split(col("word"), ""), array(lit(EndOfWord)))
            .as("syms")),
      merges)
      .select(col("word"), size(col("syms")).cast("long").as("__np"))
    def d(c: Column) = c.cast("double")
    wf.join(pieces, "word")
      .groupBy(col("lang"))
      .agg(sum(col("freq")).cast("bigint").as("n_words"),
        sum(col("freq") * col("__np")).cast("bigint").as("n_tokens"),
        sum(col("freq") * length(col("word"))).cast("bigint").as("__nc"))
      .select(col("lang"), col("n_words"), col("n_tokens"),
        round(d(col("n_tokens")) / d(col("n_words")), 6)
          .as("tokens_per_word"),
        round(d(col("__nc")) / d(col("n_tokens")), 6)
          .as("chars_per_token"))
  }
}
