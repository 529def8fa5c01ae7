package graft.queries

import graft.Tables
import graft.dedup.{Decontaminate, Dedup, MinHashDedup, MinHashIndex, SimHash}
import org.apache.spark.sql.functions._

/** Deduplication queries (C1/C2). Exact dedup and the sampled n-gram
  * Jaccard self-join are deterministic → DuckDB oracles. MinHash and
  * SimHash pipelines hinge on xxhash64 (no DuckDB equivalent) → rows
  * checked by the driver, semantics by ScalaTest invariants.
  */
object DedupQueries extends Registry {

  private val docCols = Seq("doc_id", "text", "lang", "source", "n_chars")

  val queries: Map[String, Q] = Map(
    // C1: exact dedup — keep the min-id doc per normalized content.
    "c1_exact_dedup" -> ((s, d) =>
      Dedup.exact(Tables.documents(s, d), "doc_id", "text")
        .select(docCols.map(col): _*)),
    "c1_dup_stats" -> ((s, d) =>
      Dedup.groupSizes(Tables.documents(s, d), "doc_id", "text")
        .filter(col("n_copies") > 1)),
    // C1b: order-insensitive exact dedup — catches the corpus's
    // token-shuffled duplicates (the byte-exact variant finds none).
    "c1_tokenset_dedup" -> ((s, d) =>
      Dedup.exactTokenSet(Tables.documents(s, d), "doc_id", "text")
        .select(docCols.map(col): _*)),
    "c1_tokenset_dup_stats" -> ((s, d) =>
      Tables.documents(s, d)
        .withColumn("fingerprint", Dedup.tokenSetFingerprint(col("text")))
        .groupBy(col("fingerprint"))
        .agg(count(lit(1)).as("n_copies"), min(col("doc_id")).as("keeper_id"))
        .filter(col("n_copies") > 1)),
    // C1c: canonical selection — among token-set duplicate groups keep
    // the MOST COMPLETE copy (max token count, tie min id), not the
    // first-seen: bag-of-words copies differ in repetition/truncation
    // and a pipeline wants the fullest one. Agg+re-join, no window.
    "c1_keep_best" -> ((s, d) =>
      Dedup.tokenSetKeepBest(Tables.documents(s, d), "doc_id", "text")
        .select(docCols.map(col): _*)),
    // C1c: INCREMENTAL dedup — the nightly-ingest op: a new batch
    // (doc_id >= 250) drops docs already present in the reference
    // corpus (doc_id < 250, matched by token-set fingerprint via a
    // shuffled anti join — the reference fingerprint set is never
    // broadcast-pinned) and then dedups within the batch keeping the
    // min id. Appending tomorrow's batch never re-decides today's.
    "c1_incremental_dedup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val oldFps = docs.filter(col("doc_id") < 250)
        .select(Dedup.tokenSetFingerprint(col("text")).as("__fp")).distinct()
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("__fp"))
      docs.filter(col("doc_id") >= 250)
        .withColumn("__fp", Dedup.tokenSetFingerprint(col("text")))
        .join(oldFps, Seq("__fp"), "left_anti")
        .withColumn("__keep", min(col("doc_id")).over(w))
        .filter(col("doc_id") === col("__keep"))
        .select(docCols.map(col): _*)
    }),
    // D34: snapshot diff — dataset versioning between two corpus cuts.
    // Old = 90% of docs (drops every 10th id), new = 6/7 of docs with
    // every 3rd doc's text revised; the diff classifies every id seen
    // in either cut as added / removed / changed / unchanged by content
    // md5. Both snapshots derive deterministically from `documents` so
    // DuckDB rebuilds them and the statuses are under the exact oracle.
    "d11_snapshot_diff" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val oldSnap = docs.filter(col("doc_id") % 10 =!= 0)
      val newSnap = docs.filter(col("doc_id") % 7 =!= 0)
        .withColumn("text",
          when(col("doc_id") % 3 === 0, concat(col("text"), lit(" [rev2]")))
            .otherwise(col("text")))
      graft.operators.SnapshotDiff.diff(oldSnap, newSnap, "doc_id", "text")
    }),
    // D210: versioned publish + time travel — the ATOMIC half of
    // dataset versioning d11 diffs: two corpus cuts go through
    // VersionedTable's manifest-commit protocol (write data files →
    // reserve version slot → terminator commit), v2's batch is
    // REPLAYED to prove publish idempotence (no third version), and
    // the emitted diff reads BOTH cuts back via time travel
    // (readAsOf) — so the oracle checks the full write→commit→read
    // path, not just the diff arithmetic. Scratch dir wiped up front:
    // the rebuild is deterministic, so the row stays oracle-able.
    "d116_versioned_diff" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_versioned_docs")
      graft.sources.VersionedTable.drop(s, dir)
      val docs = Tables.documents(s, d)
      val v1 = docs.filter(col("doc_id") % 4 =!= 1)
      val v2 = docs.filter(col("doc_id") % 6 =!= 2)
        .withColumn("text",
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" [v2]")))
            .otherwise(col("text")))
      val n1 = graft.sources.VersionedTable.publish(v1, dir, "cut-1")
      val n2 = graft.sources.VersionedTable.publish(v2, dir, "cut-2")
      val n2b = graft.sources.VersionedTable.publish(v2, dir, "cut-2")
      require(n1 == 1L && n2 == 2L && n2b == 2L,
        s"publish protocol drifted: $n1 $n2 $n2b")
      graft.operators.SnapshotDiff.diff(
        graft.sources.VersionedTable.readAsOf(s, dir, 1L),
        graft.sources.VersionedTable.readAsOf(s, dir, 2L),
        "doc_id", "text")
    }),
    // D229: VERSIONED CDC MATERIALIZATION end-to-end — d12's merge
    // run through the StreamingMerge copy-on-write storage path:
    // init a bucketed VersionedTable snapshot, fold the changelog in
    // as two epoch-keyed batches (the second REPLAYED to prove
    // exactly-once), compact, and read the final snapshot back. The
    // oracle is the same latest-wins SQL as d12 — so the whole
    // bucket-pruned write→manifest-commit→read path sits under the
    // bit-exact gate, not just the merge arithmetic.
    "d121_versioned_merge" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_versioned_merge")
      graft.sources.VersionedTable.drop(s, dir)
      val docs = Tables.documents(s, d)
      val base = docs.filter(col("doc_id") % 10 =!= 0)
      graft.streaming.StreamingMerge.init(base, "doc_id", dir,
        nBuckets = 16)
      val upserts = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("text", concat(col("text"), lit(" [rev2]")))
        .withColumn("__seq", lit(1L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpUpsert))
      val deletes = docs.filter(col("doc_id") % 13 === 0)
        .withColumn("__seq", lit(2L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpDelete))
      graft.streaming.StreamingMerge.applyBatch(upserts, "doc_id",
        "__seq", "__op", dir, 16, Some("merge-epoch-0"))
      graft.streaming.StreamingMerge.applyBatch(deletes, "doc_id",
        "__seq", "__op", dir, 16, Some("merge-epoch-1"))
      // replay epoch 1: must be a version-level no-op
      graft.streaming.StreamingMerge.applyBatch(deletes, "doc_id",
        "__seq", "__op", dir, 16, Some("merge-epoch-1"))
      val vs = graft.sources.VersionedTable.versions(s, dir)
      require(vs == Seq(1L, 2L, 3L),
        s"versioned merge protocol drifted: $vs")
      // bound the accumulated per-batch file sets, then read back
      graft.streaming.StreamingMerge.compact(s, dir, "doc_id", 16)
      graft.streaming.StreamingMerge.snapshot(s, dir)
    }),
    // D237: ZONE-MAP FILE SKIPPING — per-file min/max recorded in the
    // manifest at publish (one narrow scan), range reads open ONLY
    // files whose band intersects the predicate. The require proves
    // skipping actually fired; the emitted rows are exactly the
    // full-scan filter, so the row sits under the bit-exact oracle.
    "d129_versioned_skipping" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_versioned_zonemap")
      graft.sources.VersionedTable.drop(s, dir)
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .repartitionByRange(16, col("o_totalprice"))
      graft.sources.VersionedTable.publish(orders, dir, "orders-cut",
        statsCols = Seq("o_totalprice"))
      val (df, opened, total) = graft.sources.VersionedTable
        .readLatestPruned(s, dir, "o_totalprice", 50000.0, 100000.0)
      require(opened < total,
        s"zone maps failed to skip: opened $opened of $total files")
      df
    }),
    // D252: METADATA-ONLY COUNT — `SELECT count(*)` as a metadata
    // operation: one manifest read + parquet FOOTER record counts
    // summed driver-side (no job, no data pages; exact by format
    // contract over immutable committed files). Emitted per VERSION
    // (full cut AND a CDC-advanced cut), so the oracle pins both the
    // footer arithmetic and version isolation.
    "d139_metadata_count" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_meta_count")
      graft.sources.VersionedTable.drop(s, dir)
      val docs = Tables.documents(s, d)
      graft.streaming.StreamingMerge.init(docs, "doc_id", dir,
        nBuckets = 16)
      val deletes = docs.filter(col("doc_id") % 503 === 0)
        .withColumn("__seq", lit(1L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpDelete))
      graft.streaming.StreamingMerge.applyBatch(deletes, "doc_id",
        "__seq", "__op", dir, 16, Some("count-epoch-0"))
      import s.implicits._
      Seq(
        (1L, graft.sources.VersionedTable.rowCountOf(s, dir, 1L)),
        (2L, graft.sources.VersionedTable.rowCountOf(s, dir, 2L)))
        .toDF("version", "n_rows")
    }),
    // d151_history (COVERAGE D272): DESCRIBE HISTORY — one row per
    // committed version (version, batch_id, n_rows), zero data I/O
    // (n_rows folds the manifest-carried counts). The batchIds ARE
    // the operations log: the restore commit's id names its source
    // and victim versions. Read through the SQL surface
    // (versioned_history) so auditors need no Scala.
    "d151_history" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_history")
      graft.sources.VersionedTable.drop(s, dir)
      val docs = Tables.documents(s, d)
      graft.sources.VersionedTable.publish(docs, dir, "cut-1")
      graft.sources.VersionedTable.publish(
        docs.filter(col("doc_id") % 3 === 0), dir, "cut-2")
      graft.sources.VersionedTable.restore(s, dir, 1L)
      graft.sources.VersionedSql.sql(s,
        s"SELECT version, batch_id, n_rows " +
          s"FROM versioned_history('$dir')")
    }),
    // d150_cdf_sql (COVERAGE D270): the row-level change feed through
    // the SQL surface — `versioned_cdf('<dir>', v1, v2, '<id>')` in
    // plain spark.sql text, so audit/sync consumers who write SQL (not
    // Scala) read "which rows changed, and how". Same CDC fixture as
    // d145; the oracle pins the per-class event counts and the exact
    // set of updated ids folded into one grid.
    "d150_cdf_sql" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_cdf_sql")
      graft.sources.VersionedTable.drop(s, dir)
      val docs = Tables.documents(s, d)
      graft.streaming.StreamingMerge.init(docs, "doc_id", dir,
        nBuckets = 16)
      val updates = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("text", concat(col("text"), lit(" [u]")))
        .withColumn("__seq", lit(1L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpUpsert))
      val deletes = docs.filter(col("doc_id") % 11 === 0)
        .withColumn("__seq", lit(2L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpDelete))
      graft.streaming.StreamingMerge.applyBatch(
        updates.unionByName(deletes), "doc_id", "__seq", "__op", dir,
        16, Some("cdfsql-epoch-0"))
      graft.sources.VersionedSql.sql(s, s"""
        SELECT __change_type,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(doc_id) AS BIGINT) AS id_sum
        FROM versioned_cdf('$dir', 1, 2, 'doc_id')
        GROUP BY __change_type""")
    }),
    // d148_optimize (COVERAGE D266): INCREMENTAL OPTIMIZE — bin-packing
    // compaction whose cost tracks the small-file DEBT: streaming
    // appends leave trigger-sized files next to one big base file;
    // compactIncremental rewrites ONLY the debt (the base file carries
    // by reference, byte-identical, keeping its metadata through the
    // sidecar refs). The requires prove the big file was never touched
    // and exactly the three appends were packed; rows ≡ the full
    // table, bit-exact.
    "d148_optimize" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_optimize")
      graft.sources.VersionedTable.drop(s, dir)
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      // the big base file: 3/4 of the table in ONE file
      graft.sources.VersionedTable.publish(
        orders.filter(col("o_orderkey") % 4 =!= 0).coalesce(1),
        dir, "base")
      val baseFile = graft.sources.VersionedTable.filesOf(s, dir, 1L)
      require(baseFile.size == 1, "base must be one file")
      val baseLen = fs.getFileStatus(new org.apache.hadoop.fs.Path(
        s"$dir/${baseFile.head}")).getLen
      val baseStamp = fs.getFileStatus(new org.apache.hadoop.fs.Path(
        s"$dir/${baseFile.head}")).getModificationTime
      // three small appends (the per-trigger debt)
      for (r <- 0 to 2) {
        val m = graft.sources.VersionedTable.latestManifest(s, dir).get
        val rel = s"data/app-$r"
        orders.filter(col("o_orderkey") % 12 === r.toLong * 4)
          .coalesce(1)
          .write.parquet(s"$dir/$rel")
        val fNew = fs.listStatus(new org.apache.hadoop.fs.Path(
          s"$dir/$rel")).toSeq
          .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
          .map(st => s"$rel/${st.getPath.getName}")
        graft.sources.VersionedTable.publishFilesIfUnchanged(s, dir,
          s"append-$r", m.schemaJson, m.files ++ fNew,
          expectedBaseVersion = m.version)
      }
      // pack the debt: everything STRICTLY below the base file's size
      val (rewritten, carried, after) = graft.sources.VersionedTable
        .compactIncremental(s, dir, targetBytes = 1L << 30,
          smallBytes = baseLen)
      require(rewritten == 3 && carried == 1 && after == 2,
        s"debt-only packing expected (3,1,2), got " +
          s"($rewritten, $carried, $after)")
      val mAfter = graft.sources.VersionedTable.latestManifest(s, dir).get
      require(mAfter.files.contains(baseFile.head) &&
        fs.getFileStatus(new org.apache.hadoop.fs.Path(
          s"$dir/${baseFile.head}")).getModificationTime == baseStamp,
        "the big file must carry by reference, bytes untouched")
      graft.sources.VersionedTable.readLatest(s, dir)
    }),
    // d149_rename_drop (COVERAGE D268): RENAME/DROP COLUMN EVOLUTION —
    // zero data I/O via per-file physical→logical column maps (the
    // field-id indirection Iceberg carries in data files, held in
    // table metadata here since stock-Spark parquet has no field ids):
    // rename serves old bytes under the new name, drop masks the
    // physical so a LATER re-add of the same name reads NULL from old
    // files (stale bytes can never leak), and old versions time-travel
    // under their own schema. Post-evolution appends interleave with
    // pre-evolution files in one logical schema — the oracle pins the
    // whole composition bit-exactly.
    "d149_rename_drop" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_rename_drop")
      graft.sources.VersionedTable.drop(s, dir)
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        s.sparkContext.hadoopConfiguration)
      val docs = Tables.documents(s, d)
        .select("doc_id", "text", "lang", "source", "n_chars")
      graft.sources.VersionedTable.publish(docs, dir, "docs-v1")
      graft.sources.VersionedTable.renameColumn(s, dir, "n_chars", "len")
      graft.sources.VersionedTable.dropColumn(s, dir, "source")
      // re-add the dropped name: old files must serve NULL, not the
      // masked bytes
      val cur = graft.sources.VersionedTable.readLatest(s, dir).schema
      graft.sources.VersionedTable.evolveSchema(s, dir,
        org.apache.spark.sql.types.StructType(cur.fields :+
          org.apache.spark.sql.types.StructField("source",
            org.apache.spark.sql.types.StringType, nullable = true)))
      // post-evolution append under the CURRENT logical schema
      val m = graft.sources.VersionedTable.latestManifest(s, dir).get
      val rel = "data/gen2"
      docs.filter(col("doc_id") % 13 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumnRenamed("n_chars", "len")
        .select("doc_id", "text", "lang", "len", "source")
        .coalesce(1).write.parquet(s"$dir/$rel")
      val fNew = fs.listStatus(new org.apache.hadoop.fs.Path(
        s"$dir/$rel")).toSeq
        .filter(st => st.isFile && !st.getPath.getName.startsWith("_"))
        .map(st => s"$rel/${st.getPath.getName}")
      graft.sources.VersionedTable.publishFilesIfUnchanged(s, dir,
        "gen2", m.schemaJson, m.files ++ fNew,
        expectedBaseVersion = m.version)
      // v1 still time-travels under its ORIGINAL names
      require(graft.sources.VersionedTable.readAsOf(s, dir, 1L)
        .schema.fieldNames.toSeq ==
        Seq("doc_id", "text", "lang", "source", "n_chars"),
        "pre-evolution version must keep its own schema")
      graft.sources.VersionedTable.readLatest(s, dir)
        .select("doc_id", "text", "lang", "len", "source")
    }),
    // d147_multi_point (COVERAGE D263): COMPOUND BLOOM POINT LOOKUP — `a = x AND b = y` opens
    // only files passing EVERY probed column's bloom (false-open rate
    // multiplies down, ~p^k), the conjunctive complement of d134's
    // single-column probe. The require proves the compound skip beats
    // the table; rows ≡ the conjunction filter, bit-exact.
    "d147_multi_point" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_multi_point")
      graft.sources.VersionedTable.drop(s, dir)
      val docs = Tables.documents(s, d)
      // cluster the layout on the lookup keys (the usage pattern any
      // point-read table wants) — a round-robin layout puts every key
      // in every file at scale and leaves blooms nothing to skip
      graft.sources.VersionedTable.publish(
        docs.repartition(16, col("source"), col("lang")), dir,
        "docs-cut", bloomCols = Seq("source", "lang"))
      val probeLang = docs.filter(col("source") === "src7")
        .agg(min("lang")).head.getString(0)
      val (df, opened, total) = graft.sources.VersionedTable
        .readAsOfPointMulti(s, dir, 1L,
          Map("source" -> "src7", "lang" -> probeLang))
      require(opened < total,
        s"compound bloom skip failed: opened $opened of $total")
      df
    }),
    // d146_restore (COVERAGE D261): RESTORE (rollback) — a bad cut shipped; `restore(v)`
    // commits v's exact file list as the new latest: readers flip
    // atomically back, zero bytes copied (the files are immutable and
    // shared), the bad cut stays in history for forensics. The
    // emitted latest ≡ the original table, bit-exact.
    "d146_restore" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_restore")
      graft.sources.VersionedTable.drop(s, dir)
      val docs = Tables.documents(s, d)
      graft.sources.VersionedTable.publish(docs, dir, "good-cut")
      // the bad release: truncated corpus with mangled text
      graft.sources.VersionedTable.publish(
        docs.filter(col("doc_id") % 3 === 0)
          .withColumn("text", upper(col("text"))), dir, "bad-cut")
      val v = graft.sources.VersionedTable.restore(s, dir, 1L)
      require(v == 3L && graft.sources.VersionedTable
        .versions(s, dir) == Seq(1L, 2L, 3L),
        "restore must append, not rewrite history")
      // replayed restore: version-level no-op
      require(graft.sources.VersionedTable.restore(s, dir, 1L) == 3L,
        "replayed restore must not append")
      graft.sources.VersionedTable.readLatest(s, dir)
    }),
    // d145_change_data_feed (COVERAGE D260): ROW-LEVEL CHANGE DATA FEED — "which rows changed, and
    // how" between two snapshot versions, derived from the changed
    // files only: updates emit pre+post images, deletes the old row,
    // inserts the new row, and the untouched same-bucket rows a
    // copy-on-write rewrite CARRIES emit nothing (the event a naive
    // file-delta consumer gets wrong). Bit-exact against a UNION twin.
    "d145_change_data_feed" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_cdf_rows")
      graft.sources.VersionedTable.drop(s, dir)
      val docs = Tables.documents(s, d)
      graft.streaming.StreamingMerge.init(docs, "doc_id", dir,
        nBuckets = 16)
      val updates = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("text", concat(col("text"), lit(" [u]")))
        .withColumn("__seq", lit(1L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpUpsert))
      val deletes = docs.filter(col("doc_id") % 11 === 0)
        .withColumn("__seq", lit(2L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpDelete))
      val inserts = docs.filter(col("doc_id") % 13 === 0)
        .withColumn("doc_id", col("doc_id") + lit(1000000L))
        .withColumn("text", concat(col("text"), lit(" [new]")))
        .withColumn("__seq", lit(1L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpUpsert))
      graft.streaming.StreamingMerge.applyBatch(
        updates.unionByName(deletes).unionByName(inserts), "doc_id",
        "__seq", "__op", dir, 16, Some("cdf-epoch-0"))
      graft.streaming.StreamingMerge.changeFeedRows(s, dir, 1L, 2L,
        "doc_id")
    }),
    // d144_zorder_skipping (COVERAGE D259): Z-ORDER CLUSTERING — multi-column data skipping: orders
    // is rewritten with the bits of (o_totalprice, o_orderkey)
    // interleaved, so zone-map pruning fires on BOTH columns at once
    // (single-column clustering leaves the other column's min/max
    // spanning every file). Both requires prove both prunings fired;
    // the emitted rows are the joint-predicate filter, bit-exact.
    "d144_zorder_skipping" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_zorder")
      graft.sources.VersionedTable.drop(s, dir)
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
      graft.sources.VersionedTable.publish(orders, dir, "orders-cut")
      graft.sources.ZOrder.compactZOrder(s, dir,
        Seq("o_totalprice", "o_orderkey"), minFiles = 16)
      val v = graft.sources.VersionedTable.latestVersion(s, dir).get
      val (byPrice, oP, tP) = graft.sources.VersionedTable
        .readAsOfPruned(s, dir, v, "o_totalprice", 50000.0, 100000.0)
      require(oP < tP, s"price pruning failed: opened $oP of $tP")
      val maxKey = orders.agg(max("o_orderkey")).head.getLong(0)
      val (_, oK, tK) = graft.sources.VersionedTable
        .readAsOfPruned(s, dir, v, "o_orderkey", 0.0, maxKey / 10.0)
      require(oK < tK, s"key pruning failed: opened $oK of $tK")
      byPrice.filter(col("o_orderkey") <= maxKey / 10)
    }),
    // d143_metadata_range (COVERAGE D257): METADATA-ONLY MIN/MAX — the zone maps recorded for file
    // skipping double as the answer to `SELECT min(x), max(x)`: the
    // global range is the fold of the per-file ranges, one manifest
    // read, zero data I/O (exact only when every non-empty file
    // recorded the stat — else None, fall back to the scan, never a
    // silently-wrong range).
    "d143_metadata_range" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_meta_range")
      graft.sources.VersionedTable.drop(s, dir)
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .repartitionByRange(16, col("o_totalprice"))
      graft.sources.VersionedTable.publish(orders, dir, "orders-cut",
        statsCols = Seq("o_totalprice"))
      val (mn, mx) = graft.sources.VersionedTable
        .statRangeOf(s, dir, 1L, "o_totalprice")
        .getOrElse(throw new IllegalStateException(
          "stat coverage incomplete — metadata range unavailable"))
      // a column never stat-tracked must answer None, not garbage
      require(graft.sources.VersionedTable
        .statRangeOf(s, dir, 1L, "o_orderkey").isEmpty,
        "untracked column must not produce a metadata range")
      import s.implicits._
      Seq((mn, mx)).toDF("min_price", "max_price")
    }),
    // d140_schema_evolution (COVERAGE D253): ADD-COLUMN SCHEMA EVOLUTION — a live CDC table widens
    // WITHOUT rewriting data: the snapshot starts WITHOUT n_chars, the
    // changelog starts carrying it (a superset batch), and the commit
    // widens the manifest schema in place. The final table is
    // two-schema-generation — untouched buckets still hold 4-column
    // files read with n_chars nulled, rewritten buckets hold 5-column
    // files — and the oracle pins the null-backfill semantics
    // bit-exactly against a CASE twin.
    "d140_schema_evolution" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_schema_evo")
      graft.sources.VersionedTable.drop(s, dir)
      val docs = Tables.documents(s, d)
      graft.streaming.StreamingMerge.init(
        docs.select("doc_id", "text", "lang", "source"), "doc_id", dir,
        nBuckets = 16)
      val upserts = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("text", concat(col("text"), lit(" [v2]")))
        .select("doc_id", "text", "lang", "source", "n_chars")
        .withColumn("__seq", lit(1L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpUpsert))
      graft.streaming.StreamingMerge.applyBatch(upserts, "doc_id",
        "__seq", "__op", dir, 16, Some("evo-epoch-0"))
      val out = graft.sources.VersionedTable.readLatest(s, dir)
      require(out.schema.fieldNames.contains("n_chars"),
        "schema evolution failed to widen the snapshot")
      // v1 must still read under its own narrow schema (time travel)
      require(graft.sources.VersionedTable.readAsOf(s, dir, 1L)
        .schema.fieldNames.length == 4,
        "the pre-evolution version's schema drifted")
      out
    }),
    // d141_rebucket (COVERAGE D254): VERSIONED RE-BUCKET — the escape hatch from the immutable
    // bucket pin: the 16-bucket CDC snapshot is rewritten into a fresh
    // dir at 64 buckets (one bounded rewrite + pointer-style swap by
    // the caller); a point lookup against the NEW table honors ITS pin
    // and opens ~1/64 instead of ~1/16, while the old dir's versions
    // are untouched. Probe id 33 is upserted by the changelog, so the
    // row also pins latest-wins survival across the rewrite.
    "d141_rebucket" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_rebucket_src")
      val (_, ndir) = indexScratch(d, "graft_rebucket_dst")
      graft.sources.VersionedTable.drop(s, dir)
      graft.sources.VersionedTable.drop(s, ndir)
      val docs = Tables.documents(s, d)
      graft.streaming.StreamingMerge.init(docs, "doc_id", dir,
        nBuckets = 16)
      val upserts = docs.filter(col("doc_id") % 11 === 0)
        .withColumn("text", concat(col("text"), lit(" [rev2]")))
        .withColumn("__seq", lit(1L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpUpsert))
      val deletes = docs.filter(col("doc_id") % 13 === 0)
        .withColumn("__seq", lit(2L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpDelete))
      graft.streaming.StreamingMerge.applyBatch(
        upserts.unionByName(deletes), "doc_id", "__seq", "__op", dir,
        16, Some("rb-epoch-0"))
      val vOld = graft.sources.VersionedTable.versions(s, dir)
      graft.streaming.StreamingMerge.rebucket(s, dir, ndir, 64, "doc_id")
      require(graft.sources.VersionedTable.versions(s, dir) == vOld,
        "rebucket must not touch the source table")
      val (df, opened, total) = graft.streaming.StreamingMerge.lookup(
        s, ndir, "doc_id", 33L, nBuckets = 64)
      require(opened < total && opened * 16 <= total,
        s"64-bucket lookup should open ~1/64: $opened of $total")
      df
    }),
    // d142_rollup_pruned (COVERAGE D255): SKIPPING METADATA ON THE ROLLUP'S OWN TABLE — the
    // maintained aggregate is itself a real table (|groups| can be
    // 10⁶), so "this group's current state" must not scan the state:
    // init/refresh record group-key bloom filters and the point read
    // opens only matching files. Same exact-state arithmetic as d137
    // (retraction through one CDC batch), restricted to one group.
    "d142_rollup_pruned" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_rollup_pruned")
      val (_, rdir) = indexScratch(d, "graft_rollup_pruned_state")
      graft.sources.VersionedTable.drop(s, dir)
      graft.sources.VersionedTable.drop(s, rdir)
      val docs = Tables.documents(s, d)
      graft.streaming.StreamingMerge.init(docs, "doc_id", dir,
        nBuckets = 16)
      graft.streaming.StreamingRollup.init(s, dir, rdir,
        Seq("source"), "n_chars", bloomCols = Seq("source"),
        statePartitions = Some(8))
      val deletes = docs.filter(col("doc_id") % 503 === 0)
        .withColumn("__seq", lit(1L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpDelete))
      graft.streaming.StreamingMerge.applyBatch(deletes, "doc_id",
        "__seq", "__op", dir, 16, Some("rp-epoch-0"))
      graft.streaming.StreamingRollup.refresh(s, dir, rdir,
        Seq("source"), "n_chars", bloomCols = Seq("source"),
        statePartitions = Some(8))
      val (hit, opened, total) = graft.sources.VersionedTable
        .readLatestPoint(s, rdir, "source", "src7")
      require(total > 1 && opened < total,
        s"rollup bloom skip failed to fire: opened $opened of $total")
      hit.select(col("source"), col("n"),
        col("sum_v").cast("double").as("sum_v"))
    }),
    // D250: STREAMING ROLLUP MAINTAINER — the materialized aggregate
    // FOLLOWING the CDC snapshot as its own VersionedTable: init at
    // v1, one merge batch advances the snapshot, refresh() walks the
    // change feed (reads only changed buckets; batchId rollup-of-v{N}
    // records the reflected version, so replays no-op). The REPLAYED
    // refresh in the query pins the exactly-once path; the emitted
    // state ≡ recomputing over the final snapshot (same SQL as d137).
    "d138_streaming_rollup" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_stream_rollup")
      val (_, rdir) = indexScratch(d, "graft_stream_rollup_state")
      graft.sources.VersionedTable.drop(s, dir)
      graft.sources.VersionedTable.drop(s, rdir)
      val docs = Tables.documents(s, d)
      graft.streaming.StreamingMerge.init(docs, "doc_id", dir,
        nBuckets = 16)
      graft.streaming.StreamingRollup.init(s, dir, rdir,
        Seq("source"), "n_chars")
      val upserts = docs.filter(col("doc_id") % 499 === 0)
        .withColumn("text", concat(col("text"), lit(" [rev2]")))
        .withColumn("__seq", lit(1L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpUpsert))
      val deletes = docs.filter(col("doc_id") % 503 === 0)
        .withColumn("__seq", lit(2L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpDelete))
      graft.streaming.StreamingMerge.applyBatch(
        upserts.unionByName(deletes), "doc_id", "__seq", "__op", dir,
        16, Some("rollup-epoch-0"))
      graft.streaming.StreamingRollup.refresh(s, dir, rdir,
        Seq("source"), "n_chars")
      // replayed refresh: must be a version-level no-op
      graft.streaming.StreamingRollup.refresh(s, dir, rdir,
        Seq("source"), "n_chars")
      require(graft.sources.VersionedTable.versions(s, rdir)
        == Seq(1L, 2L), "rollup replay idempotence drifted")
      // finish the exact-decimal state as DOUBLE at the query
      // boundary (package convention, Registry.scala: no DECIMAL in
      // emitted schemas — the sums are exact integers far below 2^53)
      graft.streaming.StreamingRollup.current(s, rdir)
        .withColumn("sum_v", col("sum_v").cast("double"))
    }),
    // D249: CHANGE-FEED AGGREGATE MAINTENANCE — a per-source rollup
    // follows its CDC table paying only for the CHANGED files: state
    // over v1, one batch of sparse upserts+deletes (untouched buckets
    // carried by reference), then state(v2) = state(v1) ⊖ state(rows
    // of removed files) ⊕ state(rows of added files) off the manifest
    // change feed — NEVER a history rescan. The emitted state is ≡
    // recomputing over all of v2, so the row sits under the bit-exact
    // oracle (exact bigint/decimal components only).
    "d137_changefeed_agg" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_changefeed_agg")
      graft.sources.VersionedTable.drop(s, dir)
      val docs = Tables.documents(s, d)
      graft.streaming.StreamingMerge.init(docs, "doc_id", dir,
        nBuckets = 16)
      val upserts = docs.filter(col("doc_id") % 499 === 0)
        .withColumn("text", concat(col("text"), lit(" [rev2]")))
        .withColumn("__seq", lit(1L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpUpsert))
      val deletes = docs.filter(col("doc_id") % 503 === 0)
        .withColumn("__seq", lit(2L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpDelete))
      graft.streaming.StreamingMerge.applyBatch(
        upserts.unionByName(deletes), "doc_id", "__seq", "__op", dir,
        16, Some("agg-epoch-0"))
      val v1State = graft.operators.IncrementalAgg.retractableState(
        graft.sources.VersionedTable.readAsOf(s, dir, 1L),
        Seq("source"), "n_chars")
      // finish the exact-decimal state as DOUBLE at the query boundary
      graft.operators.IncrementalAgg.maintainOverVersions(s, dir,
        1L, 2L, v1State, Seq("source"), "n_chars")
        .withColumn("sum_v", col("sum_v").cast("double"))
    }),
    // D248: CDC POINT LOOKUP — the snapshot's primary access ("the
    // current row for id X") via bucket-key skipping: the id's bucket
    // is pmod(xxhash64(id), n) evaluated DRIVER-side (no job), file
    // paths carry __bucket=N, so the read opens ~1/n of the snapshot
    // exactly (no bloom false-opens). Same d121 merge fixture; the
    // require proves the skip fired; rows ≡ the latest-wins SQL
    // filtered to the probe id.
    "d136_merge_lookup" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_merge_lookup")
      graft.sources.VersionedTable.drop(s, dir)
      val docs = Tables.documents(s, d)
      val base = docs.filter(col("doc_id") % 10 =!= 0)
      graft.streaming.StreamingMerge.init(base, "doc_id", dir,
        nBuckets = 16)
      val upserts = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("text", concat(col("text"), lit(" [rev2]")))
        .withColumn("__seq", lit(1L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpUpsert))
      val deletes = docs.filter(col("doc_id") % 13 === 0)
        .withColumn("__seq", lit(2L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpDelete))
      graft.streaming.StreamingMerge.applyBatch(
        upserts.unionByName(deletes), "doc_id", "__seq", "__op", dir,
        16, Some("lookup-epoch-0"))
      // probe a revised id (7: upserted, not deleted at any scale) —
      // the lookup must open only its bucket and return the merged row
      val (df, opened, total) = graft.streaming.StreamingMerge
        .lookup(s, dir, "doc_id", 7L, 16)
      require(opened < total,
        s"bucket skip failed: opened $opened of $total files")
      df
    }),
    // D247: MULTI-TABLE ATOMIC COMMIT — a corpus and its derived
    // lexicon (per-term document frequencies, the serving-index
    // shape) published as ONE visible unit through TableSet: members
    // commit first (invisible to set readers), one pointer swap names
    // the consistent pair, and the emitted row JOINS both members
    // READ THROUGH THE SET — so the oracle pins the whole
    // publish-members → swap → resolve-consistent-pair path, not just
    // the lexicon arithmetic. TableSetSpec pins the crash-between-
    // member-publishes atomicity.
    "d135_tableset" -> ((s, d) => {
      val (_, setDir) = indexScratch(d, "graft_tableset")
      val (_, cDir) = indexScratch(d, "graft_tableset_corpus")
      val (_, xDir) = indexScratch(d, "graft_tableset_lexicon")
      Seq(setDir, cDir, xDir).foreach(
        graft.sources.VersionedTable.drop(s, _))
      val corpus = Tables.documents(s, d).filter(col("doc_id") % 4 =!= 1)
      val lexicon = corpus
        .select(col("doc_id"),
          explode(graft.text.TextFunctions.tokens(col("text")))
            .as("term"))
        .groupBy(col("term"))
        .agg(count_distinct(col("doc_id")).as("df"))
      graft.sources.TableSet.publishAll(s, setDir, "cut-1", Seq(
        ("corpus", corpus, cDir), ("lexicon", lexicon, xDir)))
      // ONE assignment resolution for both members — two separate
      // read() calls could span a concurrent swap and mix generations
      val snap = graft.sources.TableSet.snapshot(s, setDir)
      snap("lexicon")
        .crossJoin(broadcast(
          snap("corpus").agg(count(lit(1)).as("corpus_docs"))))
        .select(col("term"), col("df"), col("corpus_docs"))
    }),
    // D246: BLOOM POINT-LOOKUP SKIPPING — the id-equality complement
    // of d129's zone maps: a hash-laid publish records per-file bloom
    // filters (4096 bits, 3 xxhash64 probes) in the manifest, and a
    // key probe opens only files whose bloom might hold it (~1 of 16
    // under the hash layout; zone maps can't skip here — every file
    // spans the whole key range). The require proves skipping fired;
    // the emitted rows are exactly the full-scan equality filter.
    "d134_versioned_point" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_versioned_bloom")
      graft.sources.VersionedTable.drop(s, dir)
      val orders = Tables.orders(s, d)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
        .repartition(16, col("o_orderkey"))
      graft.sources.VersionedTable.publish(orders, dir, "orders-cut",
        bloomCols = Seq("o_orderkey"))
      val (df, opened, total) = graft.sources.VersionedTable
        .readLatestPoint(s, dir, "o_orderkey", 7L)
      require(opened < total,
        s"bloom failed to skip: opened $opened of $total files")
      df
    }),
    // D244: MANIFEST-LEVEL CHANGE FEED — the incremental consumer's
    // complement of d116: a bucketed versioned table takes one CDC
    // batch (sparse upserts + deletes touching a few buckets; the
    // merge carries every untouched bucket BY REFERENCE), and the
    // diff v1→v2 is driven by changedFiles instead of a full-content
    // join — md5 only over removed/added files' rows, carried files
    // contribute `unchanged` from an id-column-only projection. The
    // require proves the feed actually skipped files; the output is
    // ≡ the full snapshot diff, so the row sits under the bit-exact
    // oracle.
    "d133_versioned_changefeed" -> ((s, d) => {
      val (_, dir) = indexScratch(d, "graft_versioned_feed")
      graft.sources.VersionedTable.drop(s, dir)
      val docs = Tables.documents(s, d)
      graft.streaming.StreamingMerge.init(docs, "doc_id", dir,
        nBuckets = 16)
      val upserts = docs.filter(col("doc_id") % 499 === 0)
        .withColumn("text", concat(col("text"), lit(" [rev2]")))
        .withColumn("__seq", lit(1L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpUpsert))
      val deletes = docs.filter(col("doc_id") % 503 === 0)
        .withColumn("__seq", lit(2L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpDelete))
      graft.streaming.StreamingMerge.applyBatch(
        upserts.unionByName(deletes), "doc_id", "__seq", "__op", dir,
        16, Some("feed-epoch-0"))
      val (added, removed) = graft.sources.VersionedTable
        .changedFiles(s, dir, 1L, 2L)
      val carried = graft.sources.VersionedTable.filesOf(s, dir, 2L)
        .toSet -- added
      require(carried.nonEmpty && (added.nonEmpty || removed.nonEmpty),
        s"change-feed fixture drifted: +${added.size} " +
          s"-${removed.size} =${carried.size}")
      graft.operators.SnapshotDiff.incremental(s, dir, 1L, 2L,
        "doc_id", "text")
    }),
    // D39: CDC merge — the write-side complement of d11: base snapshot
    // (90% of docs) + a changelog of upserts (every 7th doc re-crawled,
    // text revised, seq 1) and deletes (every 13th doc taken down,
    // seq 2, so a doc in both — id % 91 == 0 — resolves to DELETE by
    // latest-wins) → the next snapshot. Changelog collapses via hash
    // agg (max-struct arg-max, no window), then one full-outer join.
    "d12_merge_upsert" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val base = docs.filter(col("doc_id") % 10 =!= 0)
      val upserts = docs.filter(col("doc_id") % 7 === 0)
        .withColumn("text", concat(col("text"), lit(" [rev2]")))
        .withColumn("__seq", lit(1L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpUpsert))
      val deletes = docs.filter(col("doc_id") % 13 === 0)
        .withColumn("__seq", lit(2L))
        .withColumn("__op", lit(graft.operators.MergeUpsert.OpDelete))
      graft.operators.MergeUpsert.merge(
        base, upserts.unionByName(deletes), "doc_id", "__seq", "__op")
    }),
    // C2 (oracle-able slice): exact 3-gram Jaccard over a contiguous id
    // range (the generator plants near-dups at adjacent ids), all pairs.
    // The corpus's planted near-dups are token-shuffled (token-set
    // jaccard ≥ 0.8, 3-gram jaccard ≈ 0) → unigram shingles throughout.
    "c2_ngram_jaccard" -> ((s, d) => {
      val sample = Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), array_distinct(
          graft.text.TextFunctions.shingles(col("text"), 1)).as("__sh"))
      val l = sample.select(col("doc_id").as("a"), col("__sh").as("__sha"))
      val r = sample.select(col("doc_id").as("b"), col("__sh").as("__shb"))
      l.join(r, col("a") < col("b"))
        .withColumn("jaccard",
          MinHashDedup.jaccardFromShingles(col("__sha"), col("__shb")))
        .filter(col("jaccard") >= 0.6)
        .select("a", "b", "jaccard")
    }),
    // C2h: INCREMENTAL connected-components state — near-dup cluster
    // labels maintained under batched edges instead of recomputed per
    // run: edges = the oracle-able jaccard pairs (c2_ngram_jaccard's
    // slice) + deterministic bridge edges (so the batch genuinely
    // FUSES components, not just grows them), split 2:1 by (a+b)%3
    // into the persisted state's batch and the incoming batch. The
    // emitted labeling is merge(cc(batch1), batch2), which the
    // contract pins ≡ cc(all edges) — exactly what the DuckDB
    // recursive-reachability oracle computes on the union.
    "c2_incremental_cc" -> ((s, d) => {
      val sample = Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), array_distinct(
          graft.text.TextFunctions.shingles(col("text"), 1)).as("__sh"))
      val l = sample.select(col("doc_id").as("a"), col("__sh").as("__sha"))
      val r = sample.select(col("doc_id").as("b"), col("__sh").as("__shb"))
      val pairs = l.join(r, col("a") < col("b"))
        .withColumn("jaccard",
          MinHashDedup.jaccardFromShingles(col("__sha"), col("__shb")))
        .filter(col("jaccard") >= 0.6)
        .select(col("a"), col("b"))
      val bridges = s.range(0, 6)
        .select((col("id") * 10).as("a"), (col("id") * 10 + 40).as("b"))
      val edges = pairs.unionByName(bridges).localCheckpoint()
      val batch1 = edges.filter((col("a") + col("b")) % 3 =!= 0)
      val batch2 = edges.filter((col("a") + col("b")) % 3 === 0)
      graft.dedup.IncrementalCC.merge(
        graft.dedup.IncrementalCC.cc(batch1), batch2)
    }),
    // C2g: DIRECTIONAL containment pairs — |A∩B|/|A| ≥ 0.8 over the
    // same oracle-able slice as c2_ngram_jaccard: catches the
    // quote-expansion duplicate (short doc swallowed by a longer one)
    // whose symmetric Jaccard is diluted below any sane threshold.
    // Ordered pairs (a≠b) because containment is asymmetric.
    "c2_containment" -> ((s, d) => {
      val sample = Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), array_distinct(
          graft.text.TextFunctions.shingles(col("text"), 1)).as("__sh"))
      val l = sample.select(col("doc_id").as("a"), col("__sh").as("__sha"))
      val r = sample.select(col("doc_id").as("b"), col("__sh").as("__shb"))
      l.join(r, col("a") =!= col("b"))
        .withColumn("containment",
          MinHashDedup.containmentFromShingles(col("__sha"), col("__shb")))
        .filter(col("containment") >= 0.8)
        .select("a", "b", "containment")
    }),
    // C1g: frequency-based BOILERPLATE removal — spans appearing in
    // ≥ minDf distinct docs of one source are template chrome and are
    // stripped from EVERY doc (no surviving copy — unlike span/
    // substring dedup, which keep the first). Fixture plants a
    // per-source 8-token banner (one exact span) on every doc, so the
    // banner's df = the source's doc count and each doc loses exactly
    // that span while its own content spans (df 1–2) survive.
    "c1_boilerplate_strip" -> ((s, d) => {
      val fixture = Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          concat_ws(" ",
            lit("news update bulletin from source channel feed"),
            col("source"), col("text")).as("text"))
      graft.text.Boilerplate.stripFrequentSpans(fixture,
          "doc_id", "text", "source", spanTokens = 8, minDf = 3)
        .select(col("doc_id"), col("n_spans"), col("n_kept"),
          md5(col("clean_text")).as("clean_md5"))
    }),
    // C2: MinHash LSH near-dup pairs confirmed by exact Jaccard.
    "c2_minhash_pairs" -> ((s, d) =>
      MinHashDedup.confirmedPairs(Tables.documents(s, d), "doc_id", "text",
        threshold = 0.7, shingleSize = 1)
        .orderBy(col("a"), col("b"))),
    // C2: full near-dup removal (LSH → components → keep one per cluster).
    "c2_minhash_dedup" -> ((s, d) =>
      MinHashDedup.dedup(Tables.documents(s, d), "doc_id", "text",
        threshold = 0.7, shingleSize = 1)
        .select(docCols.map(col): _*)),
    // C2: winnowing overlap detector (MOSS) — doc pairs sharing at
    // least Winnowing.overlapPairs' default minShared selected
    // fingerprints after the document-frequency cap. The
    // fingerprint arithmetic is engine-portable (see TextQueries
    // sqlWinnowFps) so unlike MinHash this near-dup path IS oracled.
    "c2_winnow_overlap" -> ((s, d) =>
      graft.text.Winnowing.overlapPairs(Tables.documents(s, d), "doc_id", "text")
        .select(col("a"), col("b"), col("shared"))),
    // C2: SimHash fingerprints + near pairs at Hamming ≤ 6.
    "c2_simhash_pairs" -> ((s, d) =>
      SimHash.nearPairs(Tables.documents(s, d), "doc_id", "text", maxDistance = 6)
        .orderBy(col("a"), col("b"))),
    // C2: the portable-hash MinHash LSH pipeline — Horner shingle
    // hashing + value-keyed band buckets, so signature computation,
    // banding and candidate generation (not just the Jaccard confirm)
    // sit under the exact DuckDB oracle.
    "c2_minhash_portable_pairs" -> ((s, d) =>
      MinHashDedup.portableCandidatePairs(Tables.documents(s, d),
        "doc_id", "text", shingleSize = 1)
        .orderBy(col("a"), col("b"))),
    // C2: batch twin of the ONLINE (streaming first-wins) dedup —
    // kept = docs that are the min doc_id of every band bucket they
    // land in. Same portable banding as the pairs query, so the
    // greedy-ingestion semantics themselves sit under the exact
    // oracle; StreamingNearDedupSpec asserts stream == this twin.
    "c2_online_dedup_twin" -> ((s, d) =>
      graft.streaming.StreamingNearDedup.keptBatch(
        Tables.documents(s, d), "doc_id", "text")),
    // C2e: incremental NEAR-dup — the nightly batch (doc_id >= 250)
    // dropped against the reference corpus's band buckets, then
    // first-wins within the batch; equals the online machine streamed
    // reference-then-batch (spec-pinned to keptBatch on the union).
    "c2_incremental_neardup" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      graft.streaming.StreamingNearDedup.incrementalKept(
        docs.filter(col("doc_id") >= 250),
        docs.filter(col("doc_id") < 250), "doc_id", "text")
    }),
    // C2e': the SAME nightly batch served from the PERSISTED reference
    // bucket index — the reference is banded ONCE at write time and
    // never re-scanned at serve time; the serve path is shared with
    // c2_incremental_neardup, so the persisted variant sits under the
    // identical exact oracle. Build cost deliberately inside the timed
    // query (c3_ivf_serve's convention — the bench row carries the
    // full build+serve story).
    "c2_incremental_persisted" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val (tbl, tmp) = indexScratch(d, "graft_mh_buckets")
      MinHashIndex.write(docs.filter(col("doc_id") < 250), "doc_id",
        "text", table = tbl, path = tmp)
      MinHashIndex.incrementalKept(s, tbl,
        docs.filter(col("doc_id") >= 250), "doc_id", "text")
    }),
    // C2e'': INCREMENTAL maintenance of the persisted bucket index —
    // build on the first 150 docs, MERGE the next 100 (batch banding +
    // anti-join + bucketed append: cost scales with the batch, never
    // the reference), then serve tonight's batch. The merged bucket
    // set equals a one-shot write of doc_id < 250 EXACTLY (banding is
    // per-document), so this row shares c2_incremental_persisted's
    // exact DuckDB oracle.
    "c2_incremental_merged" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val (tbl, tmp) = indexScratch(d, "graft_mh_buckets_incr")
      MinHashIndex.write(docs.filter(col("doc_id") < 150), "doc_id",
        "text", table = tbl, path = tmp)
      MinHashIndex.merge(s, tbl,
        docs.filter(col("doc_id") >= 150 && col("doc_id") < 250),
        "doc_id", "text")
      MinHashIndex.incrementalKept(s, tbl,
        docs.filter(col("doc_id") >= 250), "doc_id", "text")
    }),
    // C2: benchmark decontamination — docs below id 100 play the EVAL
    // set (id-less: only the text column is handed over), the rest is
    // the TRAIN corpus; survivors share no word 8-gram with eval. The
    // exact string-matching path is engine-portable → DuckDB oracle;
    // the xxhash64 production path (rows-only) is asserted equal to it
    // in DecontaminateSpec.
    "c2_decontaminate" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Decontaminate.decontaminateExact(
        docs.filter(col("doc_id") >= 100),
        docs.filter(col("doc_id") < 100).select(col("text")),
        "doc_id", "text")
        .select(docCols.map(col): _*)
    }),
    "c2_decontaminate_hashed" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Decontaminate.decontaminate(
        docs.filter(col("doc_id") >= 100),
        docs.filter(col("doc_id") < 100).select(col("text")),
        "doc_id", "text")
        .select(docCols.map(col): _*)
    }),
    // C2d: graded contamination — per-doc fraction of distinct 8-grams
    // shared with the eval slice (what pipelines threshold on when
    // binary any-overlap is too blunt). Exact string matching → oracle;
    // the hashed production path is asserted equal in DecontaminateSpec.
    "c2_contamination_score" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      Decontaminate.contaminationScoreExact(
        docs.filter(col("doc_id") >= 100),
        docs.filter(col("doc_id") < 100).select(col("text")),
        "doc_id", "text")
    }),
    // C1d: SUB-document exact dedup (C4/RefinedWeb span removal) —
    // consecutive 8-token spans, corpus-wide first-occurrence-wins,
    // docs reassembled from surviving spans (empty docs drop). The
    // whole op — span split, first-occurrence agg+re-join, ordered
    // reassembly — sits under one oracle row.
    "c1_span_dedup" -> ((s, d) =>
      graft.text.SpanDedup.dedupSpans(Tables.documents(s, d),
          "doc_id", "text", spanTokens = 8)
        .select(col("doc_id"), col("n_spans"), col("n_kept"),
          md5(col("clean_text")).as("clean_md5"))),
    // C1f: EXACT-SUBSTRING dedup (Lee et al. 2022 semantics, windowed
    // form) on a planted MISALIGNED-shared-paragraph fixture: every
    // doc carries the same 10-token paragraph behind a unique prefix
    // whose length varies with doc_id (so the paragraph never aligns
    // with c1_span_dedup's fixed 8-token span grid — the approximate
    // span form misses it; the stride-1 exact form excises it from
    // every doc but the global first). Whole pipeline — window
    // explode, first-occurrence agg, covered-position union, ordered
    // reassembly — under one oracle row.
    "c1_exact_substring" -> ((s, d) => {
      val toksOf = graft.text.TextFunctions.tokens(col("text"))
      val shared = "alpha beta gamma delta epsilon zeta eta theta " +
        "iota kappa"
      val fixture = Tables.documents(s, d).filter(col("doc_id") < 60)
        .select(col("doc_id"), concat_ws(" ",
          array_join(slice(toksOf, lit(1),
            lit(5) + pmod(col("doc_id"), lit(3L)).cast("int")), " "),
          lit(shared),
          array_join(slice(toksOf, lit(12), lit(8)), " ")).as("text"))
      graft.text.ExactSubstring.dedupSubstrings(fixture,
        "doc_id", "text", n = 8)
    }),
    // C1f-corpus: the same exact-substring dedup over the RAW
    // documents table — the real corpus shape (271k tokens at sf0.1)
    // for bench and the 10x probe; output text md5-compacted like
    // c1_span_dedup.
    "c1_exact_substring_corpus" -> ((s, d) =>
      graft.text.ExactSubstring.dedupSubstrings(Tables.documents(s, d),
          "doc_id", "text", n = 8)
        .select(col("doc_id"), col("n_tokens"), col("n_kept"),
          md5(col("clean_text")).as("clean_md5"))),
    // C1e: fuzzy record linkage via symmetric deletes (graft.dedup.
    // SymSpell) — customer names matched against a deterministically
    // corrupted twin (one digit deleted at a key-derived position, the
    // same substring surgery in both engines), edit distance ≤ 1. The
    // oracle is the naive all-pairs levenshtein filter, so blocking
    // losslessness itself sits under the hash check.
    "c1_fuzzy_pairs" -> ((s, d) => {
      val cust = Tables.customer(s, d)
      val orig = cust.select(col("c_custkey").as("orig_key"),
        col("c_name").as("orig_name"))
      val corrupted = cust.select(col("c_custkey").as("cand_key"),
        concat(
          expr("substring(c_name, 1, 9 + cast(c_custkey % 9 as int))"),
          expr("substring(c_name, 11 + cast(c_custkey % 9 as int), 100)"))
          .as("cand_name"))
      graft.dedup.SymSpell.fuzzyJoin(
        orig, "orig_key", "orig_name",
        corrupted, "cand_key", "cand_name", maxDist = 1)
    }),
    // C1f: entity resolution — fuzzy pairs → connected components →
    // canonical min-id, composed end-to-end (graft.dedup.
    // EntityResolution). Records = part names (64 distinct values over
    // 2000 rows at sf0.01 — real duplication) plus a corrupted twin
    // (one char deleted at a key-derived position); typo chains
    // canonicalize transitively. Oracle: naive all-pairs edges + a
    // recursive-CTE reachability closure, so the WHOLE chain —
    // blocking, closure, canonical pick — is hash-checked.
    "c1_entity_resolution" -> ((s, d) => {
      val part = Tables.part(s, d)
      val records = part.select((col("p_partkey") * 2).as("id"),
          col("p_name").as("s"))
        .unionByName(part.select((col("p_partkey") * 2 + 1).as("id"),
          concat(
            expr("substring(p_name, 1, 3 + cast(p_partkey % 7 as int))"),
            expr("substring(p_name, 5 + cast(p_partkey % 7 as int), 1000)"))
            .as("s")))
      graft.dedup.EntityResolution.resolve(records, "id", "s", maxDist = 1)
    }),
  )

  private def toks = TextQueries.sqlToks("text")

  /** Shared by c2_incremental_neardup and c2_incremental_persisted —
    * same portable banding CTEs as c2_online_dedup_twin, split at
    * doc_id 250 into reference bucket set and batch claims. The
    * persisted variant reads the bucket set from a bucketed table
    * instead of re-banding, through the same serve path, so its
    * results are identical by construction (MinHashIndexSpec pins it). */
  private lazy val incrementalNeardupSql: String = {
    val (pa, pb) = MinHashDedup.permutationParams(16, 42L)
    val aList = pa.mkString("[", ",", "]")
    val bList = pb.mkString("[", ",", "]")
    s"""
      WITH hs AS (
        SELECT doc_id, list_transform($toks, x ->
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(1, len(x) + 1),
              j -> CAST(ascii(x[j:j]) AS BIGINT))),
          (a, c) -> (a * 31 + c) % 1000000007)) AS h
        FROM documents
      ), sig AS (
        SELECT doc_id, list_transform(range(0, 16), i ->
          list_min(list_transform(h,
            v -> (($aList)[i+1] * v + ($bList)[i+1]) % 2147483647))) AS s
        FROM hs WHERE len(h) > 0
      ), banded AS (
        SELECT doc_id, CAST(t.b AS VARCHAR) || ':' ||
          array_to_string(s[t.b*4+1 : t.b*4+4], ',') AS bucket
        FROM sig, LATERAL unnest(range(0, 4)) AS t(b)
      ), ref AS (
        SELECT DISTINCT bucket FROM banded WHERE doc_id < 250
      ), k AS (
        SELECT b.doc_id,
          min(b.doc_id) OVER (PARTITION BY b.bucket) AS keeper,
          (r.bucket IS NOT NULL) AS hit
        FROM (SELECT * FROM banded WHERE doc_id >= 250) b
        LEFT JOIN ref r ON b.bucket = r.bucket)
      SELECT doc_id FROM k
      GROUP BY doc_id
      HAVING bool_and(doc_id = keeper) AND NOT bool_or(hit)"""
  }

  /** The portable MinHash-LSH candidate-pair pipeline as DuckDB SQL —
    * SAME permutation constants as the Spark plan (seed 42, k 16,
    * 4 bands, unigram shingles, bucket cap 64). Shared by the
    * c2_minhash_portable_pairs oracle and the near-dup leakage-safe
    * split (TextQueries), which closes these pairs transitively. */
  private[queries] lazy val sqlPortablePairs: String = {
    val (pa, pb) = MinHashDedup.permutationParams(16, 42L)
    val aList = pa.mkString("[", ",", "]")
    val bList = pb.mkString("[", ",", "]")
    s"""
      WITH hs AS (
        SELECT doc_id, list_transform($toks, x ->
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(1, len(x) + 1),
              j -> CAST(ascii(x[j:j]) AS BIGINT))),
          (a, c) -> (a * 31 + c) % 1000000007)) AS h
        FROM documents
      ), sig AS (
        SELECT doc_id, list_transform(range(0, 16), i ->
          list_min(list_transform(h,
            v -> (($aList)[i+1] * v + ($bList)[i+1]) % 2147483647))) AS s
        FROM hs WHERE len(h) > 0
      ), banded AS (
        SELECT doc_id, t.b AS band,
          array_to_string(s[t.b*4+1 : t.b*4+4], ',') AS bucket
        FROM sig, LATERAL unnest(range(0, 4)) AS t(b)
      ), sized AS (
        SELECT band, bucket FROM (
          SELECT band, bucket, count(*) AS c FROM banded GROUP BY 1, 2)
        WHERE c BETWEEN 2 AND 64
      ), kept AS (
        SELECT x.band, x.bucket, x.doc_id
        FROM banded x JOIN sized USING (band, bucket)
      )
      SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
      FROM kept x JOIN kept y
        ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id"""
  }

  val oracle: Map[String, String] = Map(
    "d11_snapshot_diff" -> """
      WITH old AS (
        SELECT doc_id, md5(text) AS ofp FROM documents
        WHERE doc_id % 10 <> 0
      ), new AS (
        SELECT doc_id,
          md5(CASE WHEN doc_id % 3 = 0 THEN text || ' [rev2]'
                   ELSE text END) AS nfp
        FROM documents WHERE doc_id % 7 <> 0)
      SELECT doc_id,
        CASE WHEN ofp IS NULL THEN 'added'
             WHEN nfp IS NULL THEN 'removed'
             WHEN ofp = nfp THEN 'unchanged'
             ELSE 'changed' END AS status
      FROM old FULL JOIN new USING (doc_id)""",
    "d116_versioned_diff" -> """
      WITH old AS (
        SELECT doc_id, md5(text) AS ofp FROM documents
        WHERE doc_id % 4 <> 1
      ), new AS (
        SELECT doc_id,
          md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [v2]'
                   ELSE text END) AS nfp
        FROM documents WHERE doc_id % 6 <> 2)
      SELECT doc_id,
        CASE WHEN ofp IS NULL THEN 'added'
             WHEN nfp IS NULL THEN 'removed'
             WHEN ofp = nfp THEN 'unchanged'
             ELSE 'changed' END AS status
      FROM old FULL JOIN new USING (doc_id)""",
    "d129_versioned_skipping" -> """
      SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders
      WHERE CAST(o_totalprice AS DOUBLE) >= 50000.0e0
        AND CAST(o_totalprice AS DOUBLE) <= 100000.0e0""",
    "d134_versioned_point" -> """
      SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders WHERE o_orderkey = 7""",
    "d139_metadata_count" -> """
      SELECT CAST(1 AS BIGINT) AS version,
             CAST(count(*) AS BIGINT) AS n_rows FROM documents
      UNION ALL
      SELECT CAST(2 AS BIGINT),
             CAST(count(*) AS BIGINT) FROM documents
      WHERE doc_id % 503 <> 0""",
    // the operations log ≡ the three commits' (version, batchId,
    // metadata-only count) rows
    "d151_history" -> """
      SELECT CAST(1 AS BIGINT) AS version, 'cut-1' AS batch_id,
        (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_rows
      UNION ALL
      SELECT CAST(2 AS BIGINT), 'cut-2',
        (SELECT CAST(count(*) AS BIGINT) FROM documents
         WHERE doc_id % 3 = 0)
      UNION ALL
      SELECT CAST(3 AS BIGINT), 'restore-v1-over-v2',
        (SELECT CAST(count(*) AS BIGINT) FROM documents)""",
    // the SQL-surface feed ≡ per-class counts over the same event
    // algebra as d145 (update∧delete ids resolve latest-wins delete)
    "d150_cdf_sql" -> """
      SELECT __change_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(doc_id) AS BIGINT) AS id_sum
      FROM (
        SELECT 'update_preimage' AS __change_type, doc_id
        FROM documents WHERE doc_id % 7 = 0 AND doc_id % 11 <> 0
        UNION ALL
        SELECT 'update_postimage', doc_id
        FROM documents WHERE doc_id % 7 = 0 AND doc_id % 11 <> 0
        UNION ALL
        SELECT 'delete', doc_id FROM documents WHERE doc_id % 11 = 0)
      GROUP BY __change_type""",
    // debt-only packing ≡ the untouched full table
    "d148_optimize" -> """
      SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders""",
    // rename serves old bytes under the new name; the dropped-then-
    // re-added column is NULL for pre-evolution rows, filled by the
    // post-evolution append
    "d149_rename_drop" -> """
      SELECT doc_id, text, lang, n_chars AS len,
             CAST(NULL AS VARCHAR) AS source
      FROM documents
      UNION ALL
      SELECT doc_id + 1000000, text, lang, n_chars AS len, source
      FROM documents WHERE doc_id % 13 = 0""",
    // the compound pruned read ≡ the conjunction filter
    "d147_multi_point" -> """
      SELECT doc_id, text, lang, source, n_chars FROM documents
      WHERE source = 'src7'
        AND lang = (SELECT min(lang) FROM documents
                    WHERE source = 'src7')""",
    // the restored latest ≡ the original cut
    "d146_restore" -> """
      SELECT doc_id, text, lang, source, n_chars FROM documents""",
    // the row-level feed ≡ the UNION of its four event classes; an id
    // hit by both an update and a delete resolves latest-wins (delete,
    // seq 2), so updates exclude the %11 ids
    "d145_change_data_feed" -> """
      SELECT 'update_preimage' AS __change_type,
             doc_id, text, lang, source, n_chars
      FROM documents WHERE doc_id % 7 = 0 AND doc_id % 11 <> 0
      UNION ALL
      SELECT 'update_postimage', doc_id, text || ' [u]',
             lang, source, n_chars
      FROM documents WHERE doc_id % 7 = 0 AND doc_id % 11 <> 0
      UNION ALL
      SELECT 'delete', doc_id, text, lang, source, n_chars
      FROM documents WHERE doc_id % 11 = 0
      UNION ALL
      SELECT 'insert', doc_id + 1000000, text || ' [new]',
             lang, source, n_chars
      FROM documents WHERE doc_id % 13 = 0""",
    // the z-ordered pruned read ≡ the joint-predicate filter
    "d144_zorder_skipping" -> """
      SELECT o_orderkey, o_totalprice, o_orderstatus
      FROM orders
      WHERE CAST(o_totalprice AS DOUBLE) >= 50000.0e0
        AND CAST(o_totalprice AS DOUBLE) <= 100000.0e0
        AND o_orderkey <=
          (SELECT max(o_orderkey) // 10 FROM orders)""",
    // the manifest-fold range ≡ the scan aggregate (decimal→double is
    // exact on the 2-dp money grid, and min/max commute with the cast)
    "d143_metadata_range" -> """
      SELECT CAST(min(CAST(o_totalprice AS DOUBLE)) AS DOUBLE)
               AS min_price,
             CAST(max(CAST(o_totalprice AS DOUBLE)) AS DOUBLE)
               AS max_price
      FROM orders""",
    // the two-schema-generation read ≡ the CASE twin: pre-evolution
    // rows carry NULL in the added column, upserted rows fill it
    "d140_schema_evolution" -> """
      SELECT doc_id,
        CASE WHEN doc_id % 7 = 0 THEN text || ' [v2]'
             ELSE text END AS text,
        lang, source,
        CASE WHEN doc_id % 7 = 0 THEN n_chars END AS n_chars
      FROM documents""",
    // the post-rebucket point lookup ≡ the latest-wins filter
    "d141_rebucket" -> """
      SELECT doc_id, text || ' [rev2]' AS text, lang, source, n_chars
      FROM documents WHERE doc_id = 33""",
    // one group's maintained state ≡ recomputing it over the final
    // snapshot (same arithmetic as d137, restricted to the probe)
    "d142_rollup_pruned" -> """
      SELECT source, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(n_chars AS DECIMAL(32,6))) AS DOUBLE) AS sum_v
      FROM documents WHERE doc_id % 503 <> 0 AND source = 'src7'
      GROUP BY source""",
    // stream-maintained rollup ≡ the same full-v2 recompute
    "d138_streaming_rollup" -> """
      SELECT source, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(n_chars AS DECIMAL(32,6))) AS DOUBLE)
          AS sum_v
      FROM documents WHERE doc_id % 503 <> 0
      GROUP BY source""",
    // recompute over the full v2 content — the engine maintains the
    // state off the change feed; equality proves the retraction exact
    "d137_changefeed_agg" -> """
      SELECT source, CAST(count(*) AS BIGINT) AS n,
        CAST(sum(CAST(n_chars AS DECIMAL(32,6))) AS DOUBLE)
          AS sum_v
      FROM documents WHERE doc_id % 503 <> 0
      GROUP BY source""",
    "d136_merge_lookup" -> """
      SELECT doc_id, text || ' [rev2]' AS text, lang, source, n_chars
      FROM documents WHERE doc_id = 7""",
    "d135_tableset" -> """
      WITH corpus AS (
        SELECT * FROM documents WHERE doc_id % 4 <> 1
      ), lex AS (
        SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
        FROM (SELECT doc_id,
                unnest(list_filter(
                  string_split_regex(lower(text), '\s+'),
                  x -> len(x) > 0)) AS term
              FROM corpus)
        GROUP BY term)
      SELECT term, df,
        (SELECT CAST(count(*) AS BIGINT) FROM corpus) AS corpus_docs
      FROM lex""",
    // the FULL snapshot diff of the planted two-version table — the
    // engine side computes it incrementally off the manifest change
    // feed; equality proves the incremental path exact
    "d133_versioned_changefeed" -> """
      SELECT doc_id,
        CASE WHEN doc_id % 503 = 0 THEN 'removed'
             WHEN doc_id % 499 = 0 THEN 'changed'
             ELSE 'unchanged' END AS status
      FROM documents""",
    // identical latest-wins arithmetic as d12 — the query differs only
    // in the storage path (versioned bucketed snapshot vs one merge)
    "d121_versioned_merge" -> """
      WITH base AS (
        SELECT doc_id, text, lang, source, n_chars FROM documents
        WHERE doc_id % 10 <> 0
      ), changes AS (
        SELECT doc_id, text || ' [rev2]' AS text, lang, source, n_chars,
               1 AS seq, 'upsert' AS op
        FROM documents WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id, text, lang, source, n_chars, 2, 'delete'
        FROM documents WHERE doc_id % 13 = 0
      ), latest AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY seq DESC) AS rn
          FROM changes) WHERE rn = 1)
      SELECT coalesce(b.doc_id, l.doc_id) AS doc_id,
        CASE WHEN l.op = 'upsert' THEN l.text ELSE b.text END AS text,
        CASE WHEN l.op = 'upsert' THEN l.lang ELSE b.lang END AS lang,
        CASE WHEN l.op = 'upsert' THEN l.source ELSE b.source END AS source,
        CASE WHEN l.op = 'upsert' THEN l.n_chars ELSE b.n_chars END AS n_chars
      FROM base b FULL JOIN latest l ON b.doc_id = l.doc_id
      WHERE l.op IS NULL OR l.op = 'upsert'""",
    "d12_merge_upsert" -> """
      WITH base AS (
        SELECT doc_id, text, lang, source, n_chars FROM documents
        WHERE doc_id % 10 <> 0
      ), changes AS (
        SELECT doc_id, text || ' [rev2]' AS text, lang, source, n_chars,
               1 AS seq, 'upsert' AS op
        FROM documents WHERE doc_id % 7 = 0
        UNION ALL
        SELECT doc_id, text, lang, source, n_chars, 2, 'delete'
        FROM documents WHERE doc_id % 13 = 0
      ), latest AS (
        SELECT * FROM (
          SELECT *, row_number() OVER (
            PARTITION BY doc_id ORDER BY seq DESC) AS rn
          FROM changes) WHERE rn = 1)
      SELECT coalesce(b.doc_id, l.doc_id) AS doc_id,
        CASE WHEN l.op = 'upsert' THEN l.text ELSE b.text END AS text,
        CASE WHEN l.op = 'upsert' THEN l.lang ELSE b.lang END AS lang,
        CASE WHEN l.op = 'upsert' THEN l.source ELSE b.source END AS source,
        CASE WHEN l.op = 'upsert' THEN l.n_chars ELSE b.n_chars END AS n_chars
      FROM base b FULL JOIN latest l ON b.doc_id = l.doc_id
      WHERE l.op IS NULL OR l.op = 'upsert'""",
    "c1_exact_dedup" -> s"""
      SELECT doc_id, text, lang, source, n_chars FROM documents
      WHERE doc_id IN (
        SELECT min(doc_id) FROM documents
        GROUP BY md5(array_to_string($toks, ' ')))""",
    "c1_dup_stats" -> s"""
      SELECT md5(array_to_string($toks, ' ')) AS fingerprint,
             count(*) AS n_copies, min(doc_id) AS keeper_id
      FROM documents
      GROUP BY 1 HAVING count(*) > 1""",
    "c1_tokenset_dedup" -> s"""
      SELECT doc_id, text, lang, source, n_chars FROM documents
      WHERE doc_id IN (
        SELECT min(doc_id) FROM documents
        GROUP BY md5(array_to_string(list_sort(list_distinct($toks)), ' ')))""",
    "c1_keep_best" -> s"""
      SELECT doc_id, text, lang, source, n_chars FROM documents
      WHERE doc_id IN (
        SELECT doc_id FROM (
          SELECT doc_id, row_number() OVER (
            PARTITION BY md5(array_to_string(list_sort(list_distinct($toks)), ' '))
            ORDER BY CAST(len($toks) AS BIGINT) DESC, doc_id ASC) AS r
          FROM documents) WHERE r = 1)""",
    "c1_tokenset_dup_stats" -> s"""
      SELECT md5(array_to_string(list_sort(list_distinct($toks)), ' ')) AS fingerprint,
             count(*) AS n_copies, min(doc_id) AS keeper_id
      FROM documents
      GROUP BY 1 HAVING count(*) > 1""",
    "c1_incremental_dedup" -> s"""
      WITH f AS (
        SELECT doc_id, text, lang, source, n_chars,
          md5(array_to_string(list_sort(list_distinct($toks)), ' ')) AS fp
        FROM documents
      ), batch AS (
        SELECT * FROM f WHERE doc_id >= 250
          AND fp NOT IN (SELECT fp FROM f WHERE doc_id < 250)
      ), keep AS (
        SELECT *, min(doc_id) OVER (PARTITION BY fp) AS keeper FROM batch)
      SELECT doc_id, text, lang, source, n_chars
      FROM keep WHERE doc_id = keeper""",
    "c2_ngram_jaccard" -> {
      val sh = TextQueries.sqlShingles("toks", 1)
      s"""
      WITH s AS (
        SELECT doc_id, list_distinct($sh) AS sh
        FROM (SELECT doc_id, $toks AS toks FROM documents WHERE doc_id < 100)
      ), j AS (
        SELECT l.doc_id AS a, r.doc_id AS b,
          CASE WHEN len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh)) = 0 THEN 0.0e0
               ELSE CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE)
                    / CAST(len(l.sh) + len(r.sh) - len(list_intersect(l.sh, r.sh)) AS DOUBLE)
          END AS jaccard
        FROM s l JOIN s r ON l.doc_id < r.doc_id)
      SELECT a, b, jaccard FROM j WHERE jaccard >= 0.6e0"""
    },
    "c2_incremental_cc" -> {
      val sh = TextQueries.sqlShingles("toks", 1)
      s"""
      WITH RECURSIVE s AS (
        SELECT doc_id, list_distinct($sh) AS sh
        FROM (SELECT doc_id, $toks AS toks FROM documents WHERE doc_id < 100)
      ), jp AS (
        SELECT l.doc_id AS a, r.doc_id AS b
        FROM s l JOIN s r ON l.doc_id < r.doc_id
        WHERE CASE WHEN len(l.sh) + len(r.sh)
                     - len(list_intersect(l.sh, r.sh)) = 0 THEN 0.0e0
              ELSE CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE)
                   / CAST(len(l.sh) + len(r.sh)
                     - len(list_intersect(l.sh, r.sh)) AS DOUBLE)
              END >= 0.6e0
      ), bridges AS (
        SELECT CAST(t.i * 10 AS BIGINT) AS a,
               CAST(t.i * 10 + 40 AS BIGINT) AS b
        FROM unnest(range(0, 6)) AS t(i)
      ), edges AS (
        SELECT a, b FROM jp UNION ALL SELECT a, b FROM bridges
      ), sym AS (
        SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges
      ), nodes AS (SELECT DISTINCT a AS node FROM sym),
      reach(node, root) AS (
        SELECT node, node FROM nodes
        UNION
        SELECT sym.b, reach.root FROM reach JOIN sym ON sym.a = reach.node)
      SELECT node AS id, min(root) AS component
      FROM reach GROUP BY node"""
    },
    "c2_containment" -> {
      val sh = TextQueries.sqlShingles("toks", 1)
      s"""
      WITH s AS (
        SELECT doc_id, list_distinct($sh) AS sh
        FROM (SELECT doc_id, $toks AS toks FROM documents WHERE doc_id < 100)
      ), c AS (
        SELECT l.doc_id AS a, r.doc_id AS b,
          CASE WHEN len(l.sh) = 0 THEN 0.0e0
               ELSE floor(CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE)
                    / CAST(len(l.sh) AS DOUBLE) * 1e6 + 0.5e0) / 1e6
          END AS containment
        FROM s l JOIN s r ON l.doc_id <> r.doc_id)
      SELECT a, b, containment FROM c WHERE containment >= 0.8e0"""
    },
    "c1_boilerplate_strip" -> s"""
      SELECT doc_id, n_spans, n_kept, md5(clean_text) AS clean_md5
      FROM (${graft.text.Boilerplate.sqlStripFrequentSpans(
        """SELECT doc_id, source AS g,
             concat_ws(' ',
               'news update bulletin from source channel feed',
               source, text) AS text
           FROM documents""",
        spanTokens = 8, minDf = 3)})""",
    "c2_winnow_overlap" -> s"""
      WITH ${TextQueries.sqlWinnowFps(8, 4)},
      rare AS (
        SELECT fp FROM (SELECT fp, count(*) AS df FROM winnow_f GROUP BY fp)
        WHERE df BETWEEN 2 AND 16
      ), kept AS (
        SELECT f.doc_id, f.fp FROM winnow_f f JOIN rare USING (fp)
      )
      SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS shared
      FROM kept x JOIN kept y ON x.fp = y.fp AND x.doc_id < y.doc_id
      GROUP BY x.doc_id, y.doc_id HAVING count(*) >= 3""",
    "c2_minhash_portable_pairs" -> sqlPortablePairs,
    "c2_online_dedup_twin" -> {
      // SAME portable signature pipeline as c2_minhash_portable_pairs
      // (seed 42, k 16, 4 bands, unigram shingles); kept = min of every
      // bucket. Bucket string embeds the band index exactly as
      // MinHashDedup.portableBandedDocs builds it.
      val (pa, pb) = MinHashDedup.permutationParams(16, 42L)
      val aList = pa.mkString("[", ",", "]")
      val bList = pb.mkString("[", ",", "]")
      s"""
      WITH hs AS (
        SELECT doc_id, list_transform($toks, x ->
          list_reduce(list_prepend(CAST(0 AS BIGINT),
            list_transform(range(1, len(x) + 1),
              j -> CAST(ascii(x[j:j]) AS BIGINT))),
          (a, c) -> (a * 31 + c) % 1000000007)) AS h
        FROM documents
      ), sig AS (
        SELECT doc_id, list_transform(range(0, 16), i ->
          list_min(list_transform(h,
            v -> (($aList)[i+1] * v + ($bList)[i+1]) % 2147483647))) AS s
        FROM hs WHERE len(h) > 0
      ), banded AS (
        SELECT doc_id, CAST(t.b AS VARCHAR) || ':' ||
          array_to_string(s[t.b*4+1 : t.b*4+4], ',') AS bucket
        FROM sig, LATERAL unnest(range(0, 4)) AS t(b)
      ), k AS (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY bucket) AS keeper
        FROM banded)
      SELECT doc_id FROM k GROUP BY doc_id HAVING bool_and(doc_id = keeper)"""
    },
    "c2_incremental_neardup" -> incrementalNeardupSql,
    // identical results by construction: the persisted index serves
    // the same bucket set through the same shared serve path
    "c2_incremental_persisted" -> incrementalNeardupSql,
    // the merged index's bucket set ≡ the one-shot set ⇒ same oracle
    "c2_incremental_merged" -> incrementalNeardupSql,
    "c2_decontaminate" -> {
      val sh = TextQueries.sqlShingles("toks", 8)
      s"""
      WITH t AS (
        SELECT doc_id, $toks AS toks FROM documents
      ), ev AS (
        SELECT DISTINCT sh FROM (
          SELECT unnest($sh) AS sh FROM t WHERE doc_id < 100)
        WHERE len(sh) > 0
      ), contam AS (
        SELECT DISTINCT doc_id FROM (
          SELECT doc_id, unnest($sh) AS sh FROM t WHERE doc_id >= 100) g
        WHERE len(sh) > 0 AND sh IN (SELECT sh FROM ev)
      )
      SELECT doc_id, text, lang, source, n_chars FROM documents
      WHERE doc_id >= 100 AND doc_id NOT IN (SELECT doc_id FROM contam)"""
    },
    "c2_contamination_score" -> {
      val sh = TextQueries.sqlShingles("toks", 8)
      s"""
      WITH t AS (
        SELECT doc_id, $toks AS toks FROM documents
      ), ev AS (
        SELECT DISTINCT sh FROM (
          SELECT unnest($sh) AS sh FROM t WHERE doc_id < 100)
        WHERE len(sh) > 0
      ), dg AS (
        SELECT DISTINCT doc_id, sh FROM (
          SELECT doc_id, unnest($sh) AS sh FROM t WHERE doc_id >= 100)
        WHERE len(sh) > 0
      )
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams,
        CAST(sum(CASE WHEN sh IN (SELECT sh FROM ev) THEN 1 ELSE 0 END)
          AS BIGINT) AS n_overlap,
        round(CAST(sum(CASE WHEN sh IN (SELECT sh FROM ev) THEN 1 ELSE 0 END)
          AS DOUBLE) / count(*), 6) AS contamination
      FROM dg GROUP BY doc_id"""
    },
    "c1_span_dedup" -> s"""
      WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
      s AS (
        SELECT doc_id, CAST(u.i AS BIGINT) AS span_idx,
          array_to_string(toks[u.i*8+1 : least(u.i*8+8, len(toks))], ' ') AS span
        FROM t, LATERAL unnest(range(0,
          CASE WHEN len(toks) = 0 THEN 0
               ELSE 1 + (greatest(len(toks) - 8, 0) + 7) // 8 END)) AS u(i)
      ),
      k AS (
        SELECT doc_id, span_idx, span FROM (
          SELECT doc_id, span_idx, span, row_number()
            OVER (PARTITION BY span ORDER BY doc_id, span_idx) AS rn
          FROM s) WHERE rn = 1
      ),
      tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans
              FROM s GROUP BY doc_id)
      SELECT k.doc_id, tot.n_spans, CAST(count(*) AS BIGINT) AS n_kept,
        md5(string_agg(k.span, ' ' ORDER BY k.span_idx)) AS clean_md5
      FROM k JOIN tot ON k.doc_id = tot.doc_id
      GROUP BY k.doc_id, tot.n_spans""",
    // c2_minhash_pairs / c2_minhash_dedup / c2_simhash_pairs /
    // c2_decontaminate_hashed: xxhash64-based — no engine-portable SQL;
    // covered by ScalaTest invariants (the hashed decontamination path
    // is asserted row-identical to the oracled exact path).
    "c1_exact_substring" -> graft.text.ExactSubstring.sqlDedupSubstrings(
      s"""SELECT doc_id,
            concat_ws(' ',
              array_to_string(($toks)[1 : 5 + CAST(doc_id % 3 AS INT)],
                ' '),
              'alpha beta gamma delta epsilon zeta eta theta iota kappa',
              array_to_string(($toks)[12 : 19], ' ')) AS text
          FROM documents WHERE doc_id < 60""", n = 8),
    "c1_exact_substring_corpus" -> s"""
      SELECT doc_id, n_tokens, n_kept, md5(clean_text) AS clean_md5
      FROM (${graft.text.ExactSubstring.sqlDedupSubstrings(
        "SELECT doc_id, text FROM documents", n = 8)})""",
    "c1_fuzzy_pairs" -> """
      WITH corr AS (
        SELECT c_custkey AS cand_key,
          substring(c_name, 1, CAST(9 + c_custkey % 9 AS INT))
            || substring(c_name, CAST(11 + c_custkey % 9 AS INT), 100)
            AS cand_name
        FROM customer)
      SELECT a.c_custkey AS orig_key, corr.cand_key,
        CAST(levenshtein(a.c_name, corr.cand_name) AS BIGINT) AS dist
      FROM customer a CROSS JOIN corr
      WHERE levenshtein(a.c_name, corr.cand_name) <= 1""",
    "c1_entity_resolution" -> """
      WITH RECURSIVE recs AS (
        SELECT p_partkey * 2 AS id, p_name AS s FROM part
        UNION ALL
        SELECT p_partkey * 2 + 1,
          substring(p_name, 1, CAST(3 + p_partkey % 7 AS INT))
            || substring(p_name, CAST(5 + p_partkey % 7 AS INT), 1000)
        FROM part),
      edges AS (
        SELECT a.id AS a, b.id AS b FROM recs a JOIN recs b
        ON a.id < b.id AND abs(length(a.s) - length(b.s)) <= 1
           AND levenshtein(a.s, b.s) <= 1),
      sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
      reach(node, root) AS (
        SELECT id, id FROM recs
        UNION
        SELECT sym.b, reach.root FROM reach JOIN sym ON sym.a = reach.node)
      SELECT node AS id, min(root) AS canonical
      FROM reach GROUP BY node""",
  )
}
