package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination (training-data hygiene): drop TRAIN
  * documents that share any word n-gram with an EVAL/benchmark set, so
  * held-out benchmarks stay held out — the standard pretraining-corpus
  * step (overlap measured on word n-grams; published pipelines use
  * n ≈ 8–13, the n here is a parameter).
  *
  * Scale shape: the eval set is small by definition (benchmarks are
  * MBs, the corpus is TBs), so its DISTINCT gram set is reduced first
  * and broadcast; the train side streams through one explode →
  * broadcast semi-join → distinct-ids, and survivors come from an
  * anti-join on those ids — the corpus is scanned twice (gram pass +
  * output pass) and never shuffled on text.
  *
  * Two matching keys, both collision-safe at corpus scale:
  *  - [[contaminatedIds]]/[[decontaminate]] match on `xxhash64` of the
  *    shingle — 8-byte broadcast entries; with ~1M distinct eval grams
  *    the per-gram false-match probability is ~1M/2^64 ≈ 5e-14, so even
  *    a trillion-gram corpus expects no false flags. (A 30-bit hash here
  *    would falsely flag a typical 1000-gram doc with ~63% probability —
  *    collisions in decontamination DELETE clean data, unlike MinHash
  *    where they only add candidates.)
  *  - [[contaminatedIdsExact]]/[[decontaminateExact]] match on the
  *    shingle STRING itself — zero false positives and engine-portable,
  *    so it sits under the DuckDB oracle (c2_decontaminate) and is the
  *    ground truth DecontaminateSpec checks the hashed path against.
  *    The broadcast is ~6× larger (n-gram text vs 8 bytes); prefer the
  *    hashed path when the eval set is large.
  *
  * The eval side needs ONLY `textCol` — any id/metadata columns are
  * ignored, so eval sets with arbitrary schemas work. Empty shingles
  * (zero-token text at n > 1 yields `[""]`) are filtered on both sides:
  * a blank eval row must not flag every blank train doc as benchmark
  * overlap.
  */
object Decontaminate {

  /** One row per n-gram occurrence: `cols :+ shingle`; empty shingles
    * dropped. */
  private def grams(df: DataFrame, cols: Seq[Column], textCol: String,
                    n: Int): DataFrame =
    df.select(cols :+ explode(TextFunctions.shingles(col(textCol), n)).as("__sh"): _*)
      .filter(length(col("__sh")) > 0)

  private def contaminated(train: DataFrame, eval: DataFrame, idCol: String,
                           textCol: String, n: Int,
                           key: Column => Column): DataFrame = {
    val evalGrams = grams(eval, Seq.empty, textCol, n)
      .select(key(col("__sh")).as("__g")).distinct()
    grams(train, Seq(col(idCol)), textCol, n)
      .select(col(idCol), key(col("__sh")).as("__g"))
      .join(broadcast(evalGrams), Seq("__g"), "left_semi")
      .select(col(idCol)).distinct()
  }

  /** Distinct train-doc ids sharing at least one word n-gram with eval
    * (64-bit-hash matching — the production path). */
  def contaminatedIds(train: DataFrame, eval: DataFrame, idCol: String,
                      textCol: String, n: Int = 8): DataFrame =
    contaminated(train, eval, idCol, textCol, n, xxhash64(_))

  /** [[contaminatedIds]] with exact string matching — no hash at all;
    * engine-portable and collision-free. */
  def contaminatedIdsExact(train: DataFrame, eval: DataFrame, idCol: String,
                           textCol: String, n: Int = 8): DataFrame =
    contaminated(train, eval, idCol, textCol, n, identity)

  /** Train rows surviving decontamination; output schema == input
    * schema. The anti-join is NOT broadcast-pinned: contamination is
    * usually rare (AQE will broadcast the id set when it is), but a
    * boilerplate-heavy corpus can flag a large fraction of its docs and
    * a forced broadcast would OOM exactly there — the shuffled anti-join
    * keyed on id stays linear either way. */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int = 8): DataFrame =
    train.join(contaminatedIds(train, eval, idCol, textCol, n),
      Seq(idCol), "left_anti")

  /** [[decontaminate]] on the exact string-matching path. */
  def decontaminateExact(train: DataFrame, eval: DataFrame, idCol: String,
                         textCol: String, n: Int = 8): DataFrame =
    train.join(contaminatedIdsExact(train, eval, idCol, textCol, n),
      Seq(idCol), "left_anti")

  private def score(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int,
                    key: Column => Column): DataFrame = {
    val evalGrams = grams(eval, Seq.empty, textCol, n)
      .select(key(col("__sh")).as("__g")).distinct()
      .withColumn("__hit", lit(1L))
    grams(train, Seq(col(idCol)), textCol, n)
      .select(col(idCol), key(col("__sh")).as("__g")).distinct()
      .join(broadcast(evalGrams), Seq("__g"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"),
           sum(coalesce(col("__hit"), lit(0L))).as("n_overlap"))
      .withColumn("contamination",
        round(col("n_overlap").cast("double") / col("n_grams"), 6))
  }

  /** Per-doc contamination SCORE — the graded companion to the binary
    * drop: the fraction of each train doc's DISTINCT word n-grams that
    * appear in the eval set (what published pipelines threshold on when
    * "any shared gram" is too blunt, e.g. boilerplate-heavy corpora).
    * Same broadcast-eval / one-explode scan shape as [[decontaminate]];
    * the per-doc distinct + count is one hash agg keyed on id. Docs
    * with zero grams (empty text) have no defined score and drop out.
    * Output: idCol, n_grams, n_overlap, contamination (6 dp). */
  def contaminationScore(train: DataFrame, eval: DataFrame, idCol: String,
                         textCol: String, n: Int = 8): DataFrame =
    score(train, eval, idCol, textCol, n, xxhash64(_))

  /** [[contaminationScore]] with exact string matching — collision-free
    * and engine-portable (the DuckDB-oracled variant). */
  def contaminationScoreExact(train: DataFrame, eval: DataFrame,
                              idCol: String, textCol: String,
                              n: Int = 8): DataFrame =
    score(train, eval, idCol, textCol, n, identity)
}
