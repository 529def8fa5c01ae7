package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FUZZY MATCHING via symmetric deletes (the public SymSpell scheme,
  * re-expressed as a distributed join) — exact edit-distance pairing
  * for SHORT strings: record linkage on names/titles, crawl-key
  * near-collision, OCR noise matching. Document-scale near-dup is the
  * MinHash family's job; this operator is for keys of tens of chars
  * where edit distance ≤ 1–2 is the right notion of "same".
  *
  * Why this scheme: q-gram blocking collapses on real-world keys with
  * shared boilerplate prefixes ("Customer#…", "https://www.…") — the
  * common gram puts every row in one bucket (quadratic). Deletion
  * variants hash the WHOLE string minus ≤d chars, so two keys collide
  * only when they already agree on all but ≤d positions: candidates
  * stay proportional to true near-pairs, not n².
  *
  * Exactness: if ed(a,b) ≤ d, any optimal alignment's matched
  * positions form a common string reachable by ≤ d deletions from
  * each side, so a and b share a variant (necessary); a shared variant
  * only bounds ed by 2d, so candidates are confirmed with an exact
  * `levenshtein` — the result equals the naive all-pairs filter.
  *
  * Scale shape: variant generation is a narrow flatMap (≤ L^d + 1
  * variants per key, in-expression, codegen'd — no UDF); candidates
  * come from ONE equi-join on the variant string; the confirm filter
  * runs inside the same stage. A variant shared by k keys contributes
  * k² candidate rows — that skew is inherent to the answer (those ARE
  * the near-pairs), and AQE's skew-join split handles a pathological
  * hub bucket.
  */
object SymSpell {

  /** Array of ALL distinct strings reachable from `s` by deleting at
    * most `d` characters (includes `s` itself). d ∈ {0, 1, 2}. */
  def deleteVariants(s: Column, d: Int): Column = d match {
    case 0 => array(s)
    case 1 => del1(s)
    case 2 => array_distinct(flatten(transform(del1(s), v => del1(v))))
    case _ => throw new IllegalArgumentException(
      s"maxDist $d not supported (variant count grows as L^d; use the " +
        "MinHash family for coarser similarity)")
  }

  /** `s` plus every single-character deletion of `s`. Pure SQL
    * expressions (concat/substring over a `sequence` of positions), so
    * the whole generation stays inside whole-stage codegen. */
  private def del1(s: Column): Column =
    when(coalesce(length(s), lit(0)) < 1, array(coalesce(s, lit(""))))
      .otherwise(array_distinct(concat(
        array(s),
        transform(sequence(lit(1), length(s)),
          p => concat(s.substr(lit(1), p - 1), s.substr(p + 1, length(s)))))))

  /** All cross-side pairs with edit distance ≤ maxDist. Output:
    * `(aIdOut, bIdOut, dist)` — one row per (aId, bId) pair. */
  def fuzzyJoin(a: DataFrame, aId: String, aStr: String,
                b: DataFrame, bId: String, bStr: String,
                maxDist: Int): DataFrame = {
    val av = a.select(col(aId).as("__a_id"), col(aStr).as("__a_str"))
      .withColumn("__v", explode(deleteVariants(col("__a_str"), maxDist)))
    val bv = b.select(col(bId).as("__b_id"), col(bStr).as("__b_str"))
      .withColumn("__v", explode(deleteVariants(col("__b_str"), maxDist)))
    av.join(bv, "__v")
      .groupBy(col("__a_id"), col("__b_id"))
      .agg(first(col("__a_str")).as("__a_str"),
        first(col("__b_str")).as("__b_str"))
      .where(levenshtein(col("__a_str"), col("__b_str")) <= maxDist)
      .select(col("__a_id").as(aId), col("__b_id").as(bId),
        levenshtein(col("__a_str"), col("__b_str")).cast("long").as("dist"))
  }

  /** All unordered within-table pairs (idA < idB) with edit distance ≤
    * maxDist. Output: `(id_a, id_b, dist)`. */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String,
                 maxDist: Int): DataFrame = {
    val v = df.select(col(idCol).as("__id"), col(strCol).as("__str"))
      .withColumn("__v", explode(deleteVariants(col("__str"), maxDist)))
    val left = v.select(col("__id").as("__id_a"), col("__str").as("__str_a"),
      col("__v"))
    val right = v.select(col("__id").as("__id_b"), col("__str").as("__str_b"),
      col("__v"))
    left.join(right, "__v")
      .where(col("__id_a") < col("__id_b"))
      .groupBy(col("__id_a"), col("__id_b"))
      .agg(first(col("__str_a")).as("__str_a"),
        first(col("__str_b")).as("__str_b"))
      .where(levenshtein(col("__str_a"), col("__str_b")) <= maxDist)
      .select(col("__id_a").as("id_a"), col("__id_b").as("id_b"),
        levenshtein(col("__str_a"), col("__str_b")).cast("long").as("dist"))
  }
}
