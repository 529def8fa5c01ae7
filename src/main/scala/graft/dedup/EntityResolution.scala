package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ENTITY RESOLUTION — end-to-end fuzzy record linkage: which rows are
  * the same real-world thing despite typos and duplication, and which
  * one id canonically names each group. Composes three already-proven
  * pieces into the standard ER pipeline shape:
  *
  *   1. candidate pairs: [[SymSpell.fuzzyPairs]] (exact edit-distance
  *      blocking — survives boilerplate prefixes),
  *   2. transitive closure: [[MinHashDedup.connectedComponents]]
  *      (min-label propagation; adaptive driver union-find under the
  *      measured edge bound, checkpointed distributed rounds above),
  *   3. canonical id: the component label IS the min record id —
  *      records without any near-match resolve to themselves.
  *
  * The whole chain is deterministic, so the composed operator sits
  * under a DuckDB oracle (naive all-pairs edges + a recursive-CTE
  * reachability closure).
  *
  * Scale shape — exact-dedup BEFORE fuzzy: real corpora repeat the
  * same string thousands of times, and pairing records directly makes
  * the candidate set quadratic in group size (measured: 40 s at sf0.1
  * vs 2 s with the collapse). So the pipeline first reduces records to
  * DISTINCT strings (one hash agg, each string represented by its
  * minimum record id), runs variant blocking + closure on that far
  * smaller frame, and maps labels back through one equi-join on the
  * string. Identical strings are distance 0 — they land in the same
  * component either way, so the collapse changes cost, not semantics
  * (the oracle, which pairs naively, still matches bit-for-bit).
  * Transitivity means a typo chain A~B~C canonicalizes together even
  * when ed(A,C) > maxDist — why this is a component problem, not a
  * pairwise filter.
  */
object EntityResolution {

  /** One row per input record: `(id, canonical)` where canonical is
    * the minimum id of the record's edit-distance-≤ maxDist connected
    * component (itself when unmatched). */
  def resolve(records: DataFrame, idCol: String, strCol: String,
              maxDist: Int): DataFrame = {
    val recs = records.select(col(idCol).as("id"), col(strCol).as("__s"))
    // one representative (min record id) per distinct string
    val reps = recs.groupBy(col("__s")).agg(min(col("id")).as("__rep"))
    val pairs = SymSpell.fuzzyPairs(reps, "__rep", "__s", maxDist)
    val edges = pairs.select(col("id_a").as("a"), col("id_b").as("b"))
    // component label = min rep id = min RECORD id in the component
    // (every record id ≥ its string's rep id)
    val labels = MinHashDedup.connectedComponents(edges)
      .select(col("id").as("__lid"), col("component"))
    recs.join(reps, "__s")
      .join(labels, col("__rep") === col("__lid"), "left")
      .select(col("id"),
        coalesce(col("component"), col("__rep")).as("canonical"))
  }
}
