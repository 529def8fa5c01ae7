package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC MERGE — apply a changelog to a corpus snapshot and produce the
  * next snapshot: the write-side complement of [[SnapshotDiff]] (which
  * asks "what changed?"; this op *makes* the change). Every versioned
  * training-data corpus needs exactly this between cuts: upserts for
  * re-crawled / re-labelled documents, deletes for takedowns and
  * opt-outs, everything else carried forward untouched.
  *
  * Semantics (latest-wins): the changelog holds one or more entries per
  * id, each stamped with a monotonically increasing sequence number and
  * an op in {`upsert`, `delete`}. For each id, only the entry with the
  * highest (seq, op, payload) wins — struct max, so ties on seq resolve
  * deterministically rather than by arrival order. A winning `upsert`
  * replaces (or inserts) the row; a winning `delete` removes it; ids
  * untouched by the changelog pass through from the base.
  *
  * Scale shape: the changelog first collapses to latest-per-id with a
  * plain hash aggregate (`max(struct(seq, op, payload))`) — partial
  * aggregation runs map-side, so a hot id that was upserted a million
  * times costs one row per task, not a window over the changelog. The
  * base then full-outer-joins the collapsed changes on id: one shuffle
  * per side at worst, zero-shuffle co-partitioned merge when both sides
  * are written id-bucketed (sources.TableSink). Nothing in the plan is
  * a corpus-wide window or driver collect, and the join payload carries
  * each column once — merging a 100 TB base moves the base once, the
  * (far smaller) changelog once.
  */
object MergeUpsert {

  final val OpUpsert = "upsert"
  final val OpDelete = "delete"

  /** Next snapshot from `base` + `changes`.
    *
    * `changes` must carry every payload column of `base`, plus `seqCol`
    * (numeric, higher = later) and `opCol` (`upsert` | `delete`;
    * payload columns of a delete are ignored). Base ids must be unique
    * — a snapshot primary key.
    */
  def merge(base: DataFrame, changes: DataFrame, idCol: String,
            seqCol: String, opCol: String): DataFrame = {
    val payload = base.columns.filter(_ != idCol).toSeq
    // Unknown ops fail LOUDLY at execution: without this, anything that
    // is not exactly 'upsert' wins the arg-max and then silently falls
    // through the keep-filter — a changelog writing 'update' or
    // 'UPSERT' would erase its rows from the snapshot as if deleted.
    val checked = changes.withColumn(opCol,
      when(col(opCol).isin(OpUpsert, OpDelete), col(opCol))
        .otherwise(raise_error(concat(
          lit(s"MergeUpsert: unknown op (expected '$OpUpsert' or " +
            s"'$OpDelete'): "), col(opCol)))))
    // Latest change per id as ONE aggregate: struct comparison orders
    // by seq first, so max() is arg-max-by-seq with deterministic
    // (op, payload) tie-breaks on equal seqs.
    val latest = checked
      .groupBy(col(idCol))
      .agg(max(struct(
        (col(seqCol) +: col(opCol) +: payload.map(col)): _*)).as("__c"))
      .select(col(idCol) +: col(s"__c.$opCol").as("__op") +:
        payload.map(c => col(s"__c.$c").as(s"__new_$c")): _*)
    base
      .join(latest, Seq(idCol), "full_outer")
      // delete wins → drop; upsert wins → new payload; no change entry
      // (op null ⇒ the row came from the base side) → base row carried
      // forward. An upsert for an id absent from the base is an insert;
      // a delete for an absent id is a no-op (dropped here too).
      .filter(col("__op").isNull || col("__op") === OpUpsert)
      .select(col(idCol) +: payload.map(c =>
        when(col("__op") === OpUpsert, col(s"__new_$c"))
          .otherwise(col(c)).as(c)): _*)
  }
}
