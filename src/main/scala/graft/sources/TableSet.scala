package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MULTI-TABLE ATOMIC COMMIT — the missing unit over per-directory
  * [[VersionedTable]] commits: curation publishes a corpus AND its
  * serving artifacts (postings, IVF cells, lexicons) as separate
  * single-table commits, so a reader between the two sees a new
  * corpus with a stale index. The fix is the catalog-pointer pattern
  * (Iceberg's catalog commit): member tables publish their versions
  * FIRST — new versions exist at table level but nothing resolves
  * them — and then ONE [[AtomicPointer]] swap names the consistent
  * `(member → (dir, version))` assignment. Readers resolve every
  * member through the pointer ([[current]]/[[read]]), so they see the
  * OLD assignment or the NEW assignment, never a mix; a writer
  * crashing between member publishes leaves the pointer — and every
  * reader — on the old consistent set.
  *
  * Idempotence: [[publishAll]] publishes members with batchIds
  * derived from the set batchId (member replays are version-level
  * no-ops) and skips the pointer swap when the current assignment
  * already equals the target — a replayed publishAll changes nothing.
  *
  * GC contract: a member table's [[VersionedTable.gc]] must retain
  * the versions the set (and any still-served older set) references —
  * run member gc with `keepLast` covering the set history you keep,
  * or gc only after [[history]] shows no assignment naming the
  * version.
  *
  * Scale: the pointer value is one line naming |members| (dir,
  * version) pairs — commit cost is one small-file write regardless of
  * member sizes; reads add one pointer resolution to the ordinary
  * O(1) versioned read. */
object TableSet {

  private val EntrySep = "\u0002"
  private val FieldSep = "\u0001"

  private def encode(members: Map[String, (String, Long)]): String = {
    require(members.nonEmpty, "a table set needs at least one member")
    members.foreach { case (n, (d, v)) =>
      require(n.nonEmpty && !n.contains("\n") && !n.contains(EntrySep) &&
        !n.contains(FieldSep), s"bad member name '$n'")
      require(!d.contains("\n") && !d.contains(EntrySep) &&
        !d.contains(FieldSep), s"bad member dir '$d'")
      require(v > 0, s"bad member version $v for '$n'")
    }
    members.toSeq.sortBy(_._1).map { case (n, (d, v)) =>
      s"$n$FieldSep$d$FieldSep$v"
    }.mkString(EntrySep)
  }

  private def decode(value: String): Map[String, (String, Long)] =
    value.split(EntrySep, -1).toSeq.flatMap { e =>
      e.split(FieldSep, -1) match {
        case Array(n, d, v) =>
          scala.util.Try(n -> (d, v.toLong)).toOption
        case _ => None
      }
    }.toMap

  /** Commit an explicit member assignment as the set's next version
    * (each member version must already be committed at its table). */
  def commit(spark: SparkSession, setDir: String,
             members: Map[String, (String, Long)]): Long = {
    members.foreach { case (n, (d, v)) =>
      require(VersionedTable.versions(spark, d).contains(v),
        s"member '$n': version $v is not committed at $d")
    }
    AtomicPointer.publish(spark, setDir, encode(members))
  }

  /** The current consistent assignment (empty before any commit). */
  def current(spark: SparkSession,
              setDir: String): Map[String, (String, Long)] =
    AtomicPointer.current(spark, setDir).map(decode).getOrElse(Map.empty)

  /** Assignment history, ascending by set version. */
  def history(spark: SparkSession, setDir: String)
      : Seq[(Long, Map[String, (String, Long)])] =
    AtomicPointer.history(spark, setDir).map { case (v, s) =>
      (v, decode(s))
    }

  /** The consistent assignment current "as of" a wall-clock instant —
    * CROSS-TABLE time travel: every member resolves to the exact
    * version it served at that moment, so "re-run yesterday's job
    * against yesterday's corpus AND yesterday's index" is one call.
    * Member version reads stay valid as long as [[gcMembers]] retains
    * the assignment. Advisory-timestamp contract as everywhere
    * (pointer order is the truth). */
  def currentAsOf(spark: SparkSession, setDir: String,
                  tsMillis: Long): Map[String, (String, Long)] =
    AtomicPointer.valueAsOfTimestamp(spark, setDir, tsMillis)
      .map(decode).getOrElse(Map.empty)

  /** [[snapshot]] of the assignment as of `tsMillis` — every member
    * pinned to the version it served then. */
  def snapshotAsOf(spark: SparkSession, setDir: String,
                   tsMillis: Long): Map[String, DataFrame] = {
    val m = currentAsOf(spark, setDir, tsMillis)
    require(m.nonEmpty, s"no assignment committed at or before " +
      s"ts=$tsMillis at $setDir")
    m.map { case (n, (d, v)) =>
      n -> VersionedTable.readAsOf(spark, d, v)
    }
  }

  /** Read one member's snapshot through the CURRENT assignment.
    * CONSISTENCY NOTE: two separate `read` calls can span a pointer
    * swap and observe members of DIFFERENT assignments — a consumer
    * needing a consistent pair must resolve the assignment ONCE:
    * use [[snapshot]]. */
  def read(spark: SparkSession, setDir: String, name: String): DataFrame = {
    val m = current(spark, setDir)
    val (d, v) = m.getOrElse(name, throw new NoSuchElementException(
      s"no member '$name' in the set at $setDir " +
        s"(members: ${m.keys.toSeq.sorted.mkString(",")})"))
    VersionedTable.readAsOf(spark, d, v)
  }

  /** EVERY member of ONE assignment (the current one, resolved with a
    * single pointer read) as dataframes — the consistent-set read
    * path: no concurrent swap can mix generations across the returned
    * members, because each is pinned to the assignment's exact
    * version (committed versions are immutable). */
  def snapshot(spark: SparkSession,
               setDir: String): Map[String, DataFrame] = {
    val m = current(spark, setDir)
    require(m.nonEmpty, s"no committed assignment at $setDir")
    m.map { case (n, (d, v)) =>
      n -> VersionedTable.readAsOf(spark, d, v)
    }
  }

  /** SET-AWARE RETENTION: gc every member table keeping exactly the
    * versions the newest `keepSets` assignments reference (plus each
    * member's own latest — a table must stay readable), then prune
    * the pointer history to the same depth — so no retained
    * assignment can ever dangle on a GC'd member version, closing
    * the GC contract mechanically instead of by discipline. Returns
    * per member dir the (manifests, data dirs) deleted. */
  def gcMembers(spark: SparkSession, setDir: String, keepSets: Int,
                orphanGraceMs: Long = 3600000L)
      : Map[String, (Int, Int)] = {
    require(keepSets >= 1, "keepSets must be >= 1")
    val hist = history(spark, setDir)
    if (hist.isEmpty) return Map.empty
    val retained = hist.takeRight(keepSets)
    val byDir = retained.flatMap(_._2.values)
      .groupBy(_._1).map { case (d, vs) => d -> vs.map(_._2).toSet }
    val out = byDir.map { case (d, refs) =>
      d -> VersionedTable.gcKeeping(spark, d, refs, orphanGraceMs)
    }
    AtomicPointer.gc(spark, setDir, keepSets)
    out
  }

  /** Publish EVERY member dataframe as a new version of its table,
    * then swap the assignment in ONE atomic pointer commit. Returns
    * the committed (member → version) map. Crash-safe: members first
    * (invisible to set readers), pointer last; replaying the same
    * `batchId` re-resolves the member versions (publish replay
    * no-ops) and skips the swap. The swap is recorded with the set
    * batchId as the pointer TAG and skipped whenever that batchId
    * appears ANYWHERE in the retained pointer history — a replay
    * delayed past a NEWER assignment must change nothing, and the
    * old head-value-equality check would have re-published the stale
    * assignment as a fresh version, rolling the set back. (Replay
    * detection is bounded by pointer retention, the same contract as
    * version-level batchId replay under [[VersionedTable.gc]].) */
  def publishAll(spark: SparkSession, setDir: String, batchId: String,
                 tables: Seq[(String, DataFrame, String)])
      : Map[String, Long] = {
    require(tables.nonEmpty, "publishAll needs at least one member")
    require(!batchId.contains("\n") && batchId.nonEmpty,
      "batchId must be a non-empty single-line string")
    val versions = tables.map { case (name, df, dir) =>
      name -> (dir, VersionedTable.publish(df, dir, s"$batchId:$name"))
    }.toMap
    val target = encode(versions)
    // one history read serves BOTH the tag-replay scan and the
    // head-value check (each taggedHistory/current call re-lists and
    // re-parses every retained slot — per-trigger cost in runWithSet)
    val hist = AtomicPointer.taggedHistory(spark, setDir)
    val replayed = hist.exists(_._3.contains(batchId))
    if (!replayed && !hist.lastOption.map(_._2).contains(target))
      AtomicPointer.publish(spark, setDir, target, tag = Some(batchId))
    versions.map { case (n, (_, v)) => n -> v }
  }

  /** STREAMING MULTI-TABLE COMMIT — the exactly-once twin of
    * [[publishAll]]: each micro-batch derives the set's member
    * dataframes (`derive(batch, epochId)` returns the same
    * `(name, df, dir)` triples publishAll takes — e.g. curation v4's
    * corpus cut AND its lexicon) and lands them as ONE consistent
    * assignment per trigger. Exactly-once across restarts composes
    * from the batch pieces: member publishes are idempotent on
    * `set-epoch-{id}:{name}`, the pointer swap on the `set-epoch-{id}`
    * tag — so a replayed trigger re-publishes nothing and re-swaps
    * nothing, and a crash BETWEEN a member publish and the swap heals
    * on replay (the committed members no-op, the missing swap
    * completes; readers meanwhile stayed on the previous consistent
    * assignment). A `derive` returning Nil skips the trigger (no
    * empty assignments). */
  def runWithSet(changeStream: DataFrame, checkpointDir: String,
                 setDir: String,
                 derive: (DataFrame, Long) => Seq[(String, DataFrame, String)])
      : org.apache.spark.sql.streaming.StreamingQuery =
    changeStream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epochId: Long) =>
        val tables = derive(batch, epochId)
        if (tables.nonEmpty) {
          publishAll(batch.sparkSession, setDir, s"set-epoch-$epochId",
            tables)
          ()
        }
      }
      .start()
}
