package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** INCREMENTAL CONNECTED-COMPONENTS STATE — the serving half the
  * near-dup stack was missing: [[MinHashIndex]] persists the bucket
  * set and first-wins claims, but cluster LABELS were recomputed from
  * scratch every batch, so nightly dedup at corpus scale re-paid the
  * full CC per run. This operator maintains a persisted `(id,
  * component)` labeling under batches of NEW edges with cost that
  * tracks the BATCH (plus one linear scan of the state), not the
  * corpus:
  *
  *  1. TOUCH SCOPING: only components owning an endpoint of a new
  *     edge participate; every other state row passes through as
  *     untouched bytes (one semi/anti join each — a scan, not a CC).
  *  2. STAR COMPRESSION: each touched component enters the fixpoint
  *     as a STAR (component → member edges) — connectivity-equivalent
  *     to its original edge set but exactly one hop deep, so the
  *     label-propagation rounds converge in O(diameter of the NEW
  *     edges), never re-walking old chains.
  *  3. The merged sub-labeling rides [[MinHashDedup
  *     .connectedComponents]] (adaptive driver/distributed path,
  *     convergence-checked), then unions back with the untouched rows.
  *
  * CONTRACT (IncrementalCCSpec, the LexicalIndex.merge convention):
  * for CANONICAL state (labels = min id per component, i.e. anything
  * [[MinHashDedup.connectedComponents]] or this merge produced),
  * `merge(cc(E₁), E₂) ≡ cc(E₁ ∪ E₂)` bit-exactly — batches can arrive
  * in any split without drifting from the recompute. Non-canonical
  * labels in UNTOUCHED components survive verbatim (the pass-through
  * is structural, which is also the proof the scoping works).
  *
  * Scale: state is read once (two hash joins against the batch-node /
  * touched-component sets, both batch-sized); the CC input is
  * |new edges| + |members of touched components|. A batch touching k
  * components of mean size m costs O(batch + k·m) — independent of
  * corpus size. Merging two components' labels is exactly the
  * new-edge-bridges-two-stars case and resolves in one round. */
object IncrementalCC {

  /** Compute a fresh labeling from an edge list — [[MinHashDedup
    * .connectedComponents]] under this operator's column contract
    * (`edges(a, b)` → `(id, component = min id)`). */
  def cc(edges: DataFrame, maxIter: Int = 50,
         smallGraphMaxEdges: Long = 1L << 20): DataFrame =
    MinHashDedup.connectedComponents(edges, maxIter, smallGraphMaxEdges)

  /** Merge a batch of `newEdges(a, b)` into persisted `state(id,
    * component)`. Returns the updated full labeling `(id, component)`
    * — new nodes appear, touched components re-resolve (possibly
    * fusing), untouched rows pass through unchanged. */
  def merge(state: DataFrame, newEdges: DataFrame, maxIter: Int = 50,
            smallGraphMaxEdges: Long = 1L << 20): DataFrame = {
    // one materialization each: state feeds three joins, edges two
    val st = state.select(col("id"), col("component")).localCheckpoint()
    val e = newEdges.select(col("a"), col("b")).localCheckpoint()
    val batchNodes = e.select(col("a").as("id"))
      .union(e.select(col("b").as("id"))).distinct()
    val touched = st.join(batchNodes, Seq("id"), "left_semi")
      .select(col("component")).distinct()
    val touchedState = st.join(touched, Seq("component"), "left_semi")
    val untouched = st.join(touched, Seq("component"), "left_anti")
    // star edges: component → member, one hop deep. Size-1 components
    // emit no star row, but their single node is by construction a
    // batch endpoint (that's the only way a singleton gets touched),
    // so it reaches the fixpoint through the new edges.
    val starEdges = touchedState.filter(col("id") =!= col("component"))
      .select(col("component").as("a"), col("id").as("b"))
    val relabeled = cc(starEdges.unionByName(e), maxIter,
      smallGraphMaxEdges)
    // explicit projection: the USING-column anti-join reorders
    // untouched to (component, id), and a positional reader of the
    // union would silently transpose labels
    untouched.select(col("id"), col("component"))
      .unionByName(relabeled.select(col("id"), col("component")))
  }
}
