package graft.dedup

import graft.text.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination (training-data hygiene): drop TRAIN
  * documents that share any word n-gram with an EVAL/benchmark set, so
  * held-out benchmarks stay held out — the standard pretraining-corpus
  * step (overlap measured on n-gram hashes; published pipelines use
  * n ≈ 8–13, the n here is a parameter).
  *
  * Scale shape: the eval set is small by definition (benchmarks are
  * MBs, the corpus is TBs), so its DISTINCT gram-hash set is reduced
  * first and broadcast; the train side streams through one explode →
  * broadcast semi-join → distinct-ids, and survivors come from a
  * broadcast anti-join on those ids — the corpus is scanned twice
  * (gram pass + output pass) and never shuffled on text. Gram hashing
  * is the engine-portable Horner hash, so the whole operator sits
  * under the DuckDB oracle (c2_decontaminate).
  */
object Decontaminate {

  /** (id, gram-hash) rows — one per n-gram occurrence. */
  private def gramHashes(df: DataFrame, idCol: String, textCol: String,
                         n: Int): DataFrame =
    df.select(col(idCol),
        explode(TextFunctions.shingles(col(textCol), n)).as("__sh"))
      .select(col(idCol),
        MinHashDedup.portableShingleHash(col("__sh")).as("__g"))

  /** Distinct train-doc ids sharing at least one n-gram with eval. */
  def contaminatedIds(train: DataFrame, eval: DataFrame, idCol: String,
                      textCol: String, n: Int = 8): DataFrame = {
    val evalGrams = gramHashes(eval, idCol, textCol, n)
      .select(col("__g")).distinct()
    gramHashes(train, idCol, textCol, n)
      .join(broadcast(evalGrams), Seq("__g"), "left_semi")
      .select(col(idCol)).distinct()
  }

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
}
