package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document fingerprinting by winnowing (Schleimer, Wilkerson, Aiken,
  * SIGMOD 2003 — the MOSS algorithm): hash every character k-gram of the
  * normalized text with a polynomial rolling hash, then keep the minimum
  * hash of every window of `w` consecutive k-grams. The selected set is
  * a position-robust fingerprint: any shared substring of length
  * ≥ w + k − 1 is guaranteed to contribute at least one common
  * fingerprint, so partial overlap (quotes, boilerplate, near-dups with
  * insertions) is detectable without all-pairs comparison.
  *
  * Everything is built-in expressions over a materialized normalized
  * column — no UDFs, stays inside whole-stage codegen, and the hash is
  * pure BIGINT Horner arithmetic (base 31, mod 1e9+7) that DuckDB
  * reproduces exactly (`list_reduce`), so fingerprints sit under the
  * driver's oracle. At 100 TB the fingerprint table is ~|corpus|·(len/w)
  * rows keyed by `fp` — the overlap join shuffles on `fp` and hot
  * fingerprints (site-wide boilerplate) are dropped by a document-
  * frequency cap, same degenerate-bucket posture as MinHash banding.
  */
object Winnowing {

  /** Modulus keeps Horner state < 2^30, so `acc*31 + code` never nears
    * BIGINT range in either engine. */
  val Mod = 1000000007L
  val Base = 31L

  /** Whitespace-normalized lowercase text — tokenization identical to
    * [[TextFunctions.tokens]], rejoined with single spaces. */
  def normalize(text: Column): Column =
    concat_ws(" ", TextFunctions.tokens(text))

  /** Character codes of `norm` as array<bigint> — computed ONCE per doc
    * so gram hashing can index in O(1). Direct `substr(norm, j, 1)` in
    * the hash lambda is the trap: UTF8String seeks from the string start
    * per access, turning hashing O(len²·k) (measured 15s for 5k docs at
    * sf0.1; this shape is ~1 pass). Kept as the semantic reference for
    * [[gramHashesComposed]]; the production path is the native rolling
    * expression below. */
  def charCodes(norm: Column): Column =
    transform(filter(split(norm, ""), c => length(c) > 0),
      c => ascii(c).cast("long"))

  /** Built-in-composition gram hashing over a materialized char-code
    * column — O(len·k) folds + one sequence alloc per gram. Retained as
    * the reference implementation WinnowingSpec checks the native
    * expression against. */
  def gramHashesComposed(codes: Column, k: Int): Column =
    when(size(codes) < k, array().cast("array<bigint>"))
      .otherwise(transform(sequence(lit(1), size(codes) - (k - 1)),
        i => aggregate(sequence(i, i + (k - 1)), lit(0L),
          (acc, j) => (acc * Base + element_at(codes, j)) % Mod)))

  /** Polynomial hash of every character k-gram of `norm` — the native
    * rolling-hash expression (graft.expressions.GramHashes): one O(len)
    * pass, no per-gram allocation. Returns array<bigint>; fewer than k
    * chars → empty. */
  def gramHashes(norm: Column, k: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      graft.expressions.GramHashes(
        org.apache.spark.sql.GraftColumnBridge.expression(norm), k))

  /** Winnowing selection: distinct minima over every window of `w`
    * consecutive gram hashes (fewer than w grams → one window). */
  def select(hashes: Column, w: Int): Column =
    when(size(hashes) === 0, array().cast("array<bigint>"))
      .otherwise(array_distinct(transform(
        sequence(lit(1), greatest(size(hashes) - (w - 1), lit(1))),
        p => array_min(slice(hashes, p, lit(w))))))

  /** One row per (doc, fingerprint): `idCol, fp`. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 8, w: Int = 4): DataFrame =
    df.withColumn("__gh", gramHashes(normalize(col(textCol)), k))
      .select(col(idCol), explode(select(col("__gh"), w)).as("fp"))

  /** Document pairs sharing ≥ `minShared` fingerprints, with the shared
    * count — the winnowing overlap detector. Fingerprints present in
    * more than `maxDocFreq` documents are dropped before the self-join
    * (corpus-wide boilerplate would otherwise make a quadratic hot key;
    * they carry no dedup signal, exactly like MinHash's degenerate
    * buckets). */
  def overlapPairs(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 8, w: Int = 4, minShared: Int = 3,
                   maxDocFreq: Int = 16): DataFrame = {
    // materialize once: fps feeds both the frequency agg and the join —
    // without the checkpoint the whole hashing pipeline runs twice
    val fps = fingerprints(df, idCol, textCol, k, w).localCheckpoint()
    val rare = fps.groupBy(col("fp")).agg(count(lit(1)).as("__df"))
      .filter(col("__df").between(2, maxDocFreq))
      .select("fp")
    val kept = fps.join(rare, "fp")
    kept.select(col("fp"), col(idCol).as("a"))
      .join(kept.select(col("fp").as("__fp2"), col(idCol).as("b")),
        col("fp") === col("__fp2") && col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= minShared)
  }
}
