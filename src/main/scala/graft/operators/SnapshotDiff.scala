package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus SNAPSHOT DIFF — the dataset-versioning primitive: classify
  * every document as `added` / `removed` / `changed` / `unchanged`
  * between two snapshots of a corpus, by content fingerprint per id.
  * The question every training-data pipeline asks between crawls
  * ("what actually changed since the last cut?") answered as one
  * relational op, so downstream incremental work (re-embed, re-dedup,
  * re-tokenize) can target `added ∪ changed` instead of the full
  * corpus.
  *
  * Scale shape: each side is reduced to (id, md5) IN THE SCAN
  * PROJECTION — the join shuffles ~40 bytes per row regardless of
  * document size, so diffing two 100 TB snapshots moves gigabytes,
  * not terabytes. One full-outer equi-join on the id: with both
  * snapshots written id-bucketed (sources.TableSink) it is a
  * zero-shuffle co-partitioned merge; otherwise one shuffle per side,
  * AQE-planned. Ids must be unique within each snapshot (a corpus
  * primary key).
  */
object SnapshotDiff {

  /** One row per id present in either snapshot: (idCol, status).
    * Fingerprint is md5 over the raw text bytes — byte-level change
    * detection (an edit of case or whitespace IS a change; callers
    * wanting normalized comparison pass a pre-normalized column).
    * Presence is carried as an explicit flag per side, NOT inferred
    * from fingerprint nullness — a row whose text is NULL still
    * exists in its snapshot (md5(NULL) is NULL, and conflating the
    * two would report a live doc as added/removed); null-vs-null
    * compares as unchanged via null-safe equality. */
  def diff(oldDf: DataFrame, newDf: DataFrame,
           idCol: String, textCol: String): DataFrame = {
    val o = oldDf.select(col(idCol), md5(col(textCol)).as("__old_fp"),
      lit(true).as("__in_old"))
    val n = newDf.select(col(idCol), md5(col(textCol)).as("__new_fp"),
      lit(true).as("__in_new"))
    o.join(n, Seq(idCol), "full_outer")
      .select(col(idCol),
        when(col("__in_old").isNull, lit("added"))
          .when(col("__in_new").isNull, lit("removed"))
          .when(col("__old_fp") <=> col("__new_fp"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Status → document count: the release-notes row (tiny: ≤4 rows). */
  def summary(oldDf: DataFrame, newDf: DataFrame,
              idCol: String, textCol: String): DataFrame =
    diff(oldDf, newDf, idCol, textCol)
      .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))

  /** INCREMENTAL diff between two committed versions of a
    * [[graft.sources.VersionedTable]], driven by the manifest-level
    * change feed instead of a full-content join: files carried from
    * `vOld` into `vNew` BY REFERENCE (the copy-on-write sinks'
    * untouched buckets) are byte-identical in both snapshots, so
    * under the id-uniqueness contract every row in them is
    * `unchanged` — only their ID COLUMN is read (columnar projection,
    * a tiny fraction of the bytes), never the content. The md5
    * fingerprint join runs ONLY over the rows of removed (vOld-side)
    * and added (vNew-side) files. Result ≡ [[diff]] over the two full
    * snapshots — cost ∝ the change + |carried| id bytes, not the
    * corpus (a full diff fingerprints every document's text twice).
    * Correct for ANY version pair (no file sharing ⇒ it degrades to
    * exactly the full diff); the savings track how incremental the
    * writer actually was. */
  def incremental(spark: org.apache.spark.sql.SparkSession, dir: String,
                  vOld: Long, vNew: Long,
                  idCol: String, textCol: String): DataFrame = {
    import graft.sources.VersionedTable
    val (added, removed) = VersionedTable.changedFiles(spark, dir,
      vOld, vNew)
    val carried = VersionedTable.filesOf(spark, dir, vNew)
      .filterNot(added.toSet)
    val carriedIds = VersionedTable
      .readFileSubset(spark, dir, vNew, carried)
      .select(col(idCol), lit("unchanged").as("status"))
    diff(VersionedTable.readFileSubset(spark, dir, vOld, removed),
      VersionedTable.readFileSubset(spark, dir, vNew, added),
      idCol, textCol)
      .unionByName(carriedIds)
  }
}
