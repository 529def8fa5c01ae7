package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL SURFACE FOR VERSIONED TABLES — before round 16 the whole
  * lakehouse layer (time travel, change feeds, point reads) was
  * Scala-method-only: the engine's SQL front end (b16) could not see a
  * [[VersionedTable]] at all. This closes the gap two ways:
  *
  *  1. VIEW REGISTRATION: [[register]] / [[registerAsOf]] /
  *     [[registerAsOfTimestamp]] resolve a manifest ONCE and register
  *     the exact committed file set as a temp view over the NATIVE
  *     parquet source — deliberately not a custom relation, so every
  *     Catalyst capability (predicate pushdown into the parquet scan,
  *     column pruning, whole-stage codegen, AQE) applies untouched.
  *     The view is a SNAPSHOT by construction: later publishes change
  *     nothing until re-registered (exactly the semantics `VERSION AS
  *     OF` promises — a manifest, once resolved, is immutable).
  *
  *  2. INLINE TABLE FUNCTIONS: [[sql]] accepts standard SQL extended
  *     with `versioned('<dir>')` (latest), `versioned('<dir>', N)`
  *     (version as of N) and `versioned_ts('<dir>', millis)`
  *     (timestamp as of) wherever a table name can appear, registers
  *     each referenced snapshot under a stable digest-derived view
  *     name, rewrites the text, and hands it to `spark.sql` — the
  *     same preprocessing shape Delta used for `table@v123` before
  *     SQL-standard time travel landed. The rewrite only touches the
  *     `versioned(...)` call sites (single-quoted path, no embedded
  *     quotes); everything else is Spark SQL, parsed by Spark.
  *
  * MANIFEST-LEVEL FILE SKIPPING meets SQL through
  * [[registerPruned]] / [[registerPoint]]: the zone-map / bloom file
  * prune happens at registration (the view's scan lists ONLY the
  * surviving files; the residual predicate keeps results exact), so
  * `spark.sql` over the view reads the same handful of files the
  * Scala API would — at 10⁶ files the prune must happen before the
  * scan is planned, not in it. */
object VersionedSql {

  /** Register the LATEST committed snapshot as temp view `name`. */
  def register(spark: SparkSession, name: String, dir: String): Long = {
    val v = VersionedTable.latestVersion(spark, dir).getOrElse(
      throw new NoSuchElementException(s"no committed version at $dir"))
    registerAsOf(spark, name, dir, v)
  }

  /** Register committed `version` as temp view `name` (VERSION AS OF). */
  def registerAsOf(spark: SparkSession, name: String, dir: String,
                   version: Long): Long = {
    VersionedTable.readAsOf(spark, dir, version)
      .createOrReplaceTempView(name)
    version
  }

  /** Register the newest version committed at or before `tsMillis`
    * (TIMESTAMP AS OF). */
  def registerAsOfTimestamp(spark: SparkSession, name: String,
                            dir: String, tsMillis: Long): Unit =
    VersionedTable.readAsOfTimestamp(spark, dir, tsMillis)
      .createOrReplaceTempView(name)

  /** Register a ZONE-MAP PRUNED snapshot (`column ∈ [lo, hi]`) — the
    * view's scan lists only the surviving files; the residual filter
    * keeps it exactly equal to the full-scan filter. Returns (files
    * opened, files in the version). */
  def registerPruned(spark: SparkSession, name: String, dir: String,
                     version: Long, column: String, lo: Double,
                     hi: Double): (Int, Int) = {
    val (df, opened, total) =
      VersionedTable.readAsOfPruned(spark, dir, version, column, lo, hi)
    df.createOrReplaceTempView(name)
    (opened, total)
  }

  /** Register a BLOOM-PRUNED point lookup (`column = value`) as a
    * view. Returns (files opened, files in the version). */
  def registerPoint(spark: SparkSession, name: String, dir: String,
                    version: Long, column: String, value: Any)
      : (Int, Int) = {
    val (df, opened, total) =
      VersionedTable.readAsOfPoint(spark, dir, version, column, value)
    df.createOrReplaceTempView(name)
    (opened, total)
  }

  /** Register the table's HISTORY (`DESCRIBE HISTORY` shape — one row
    * per committed version: version, ts_millis, batch_id, n_files,
    * n_rows, zero data I/O) as a temp view. */
  def registerHistory(spark: SparkSession, name: String,
                      dir: String): Unit =
    VersionedTable.history(spark, dir).createOrReplaceTempView(name)

  /** Register the ROW-LEVEL CHANGE FEED between two committed versions
    * as a temp view — downstream SQL consumers (sync jobs, audit
    * queries) read "which rows changed, and how" without the Scala
    * API. Cost ∝ the change (derived from the changed files only,
    * [[graft.streaming.StreamingMerge.changeFeedRows]]). */
  def registerChangeFeed(spark: SparkSession, name: String, dir: String,
                         vOld: Long, vNew: Long, idCol: String): Unit =
    graft.streaming.StreamingMerge
      .changeFeedRows(spark, dir, vOld, vNew, idCol)
      .createOrReplaceTempView(name)

  // left boundary: only whole-word call sites match — an identifier
  // merely ENDING in the function name (e.g. a UDF `unversioned('/p')`)
  // must not be partially rewritten into a spurious snapshot view
  private val VersionedRe =
    raw"(?<![A-Za-z0-9_])versioned\(\s*'([^']+)'(?:\s*,\s*(\d+))?\s*\)".r
  private val VersionedTsRe =
    raw"(?<![A-Za-z0-9_])versioned_ts\(\s*'([^']+)'\s*,\s*(\d+)\s*\)".r
  private val VersionedCdfRe =
    raw"(?<![A-Za-z0-9_])versioned_cdf\(\s*'([^']+)'\s*,\s*(\d+)\s*,\s*(\d+)\s*,\s*'([^']+)'\s*\)".r
  private val VersionedHistoryRe =
    raw"(?<![A-Za-z0-9_])versioned_history\(\s*'([^']+)'\s*\)".r

  /** Full SHA-1 of `dir@tag` — a 32-bit hash here risked silent view
    * replacement (createOrReplaceTempView) on a collision between two
    * distinct snapshots referenced in one session, i.e. wrong data
    * with no error. 160 bits makes that impossible in practice. */
  private def viewName(dir: String, tag: String): String = {
    val digest = java.security.MessageDigest.getInstance("SHA-1")
      .digest(s"$dir@$tag".getBytes(StandardCharsets.UTF_8))
    s"__graft_versioned_${digest.map("%02x".format(_)).mkString}"
  }

  /** Character spans of single-quoted SQL string literals (`''`
    * escapes read as two adjacent literals, which is equivalent for
    * span membership). The rewrite must not fire on `versioned(...)`
    * TEXT inside a literal — a raw regex pass would register views
    * for, and splice view names into, quoted data. */
  private def quotedSpans(text: String): Seq[(Int, Int)] = {
    val spans = Seq.newBuilder[(Int, Int)]
    var i = 0
    var open = -1
    while (i < text.length) {
      if (text.charAt(i) == '\'') {
        if (open < 0) open = i
        else { spans += ((open, i)); open = -1 }
      }
      i += 1
    }
    spans.result()
  }

  private def rewriteOutsideLiterals(text: String,
                                     re: scala.util.matching.Regex)(
      f: scala.util.matching.Regex.Match => String): String = {
    val spans = quotedSpans(text)
    def inLiteral(pos: Int): Boolean =
      spans.exists { case (a, b) => pos > a && pos < b }
    re.replaceAllIn(text, m =>
      scala.util.matching.Regex.quoteReplacement(
        if (inLiteral(m.start)) m.matched else f(m)))
  }

  /** Run SQL whose FROM clauses may reference versioned tables via
    * `versioned('<dir>')`, `versioned('<dir>', N)` and
    * `versioned_ts('<dir>', millis)`. Each distinct reference resolves
    * its manifest once, registers the snapshot view, and the rewritten
    * text runs through the ordinary `spark.sql` front end. References
    * that START inside a single-quoted string literal are left alone
    * (data, not a call site). */
  def sql(spark: SparkSession, text: String): DataFrame = {
    var rewritten = rewriteOutsideLiterals(text, VersionedHistoryRe) { m =>
      val dir = m.group(1)
      val name = viewName(dir, "history")
      registerHistory(spark, name, dir)
      name
    }
    rewritten = rewriteOutsideLiterals(rewritten, VersionedCdfRe) { m =>
      val (dir, vOld, vNew, idCol) =
        (m.group(1), m.group(2).toLong, m.group(3).toLong, m.group(4))
      val name = viewName(dir, s"cdf$vOld-$vNew-$idCol")
      registerChangeFeed(spark, name, dir, vOld, vNew, idCol)
      name
    }
    rewritten = rewriteOutsideLiterals(rewritten, VersionedTsRe) { m =>
      val (dir, ts) = (m.group(1), m.group(2).toLong)
      val name = viewName(dir, s"ts$ts")
      registerAsOfTimestamp(spark, name, dir, ts)
      name
    }
    rewritten = rewriteOutsideLiterals(rewritten, VersionedRe) { m =>
      val dir = m.group(1)
      Option(m.group(2)) match {
        case Some(v) =>
          val n = viewName(dir, s"v$v")
          registerAsOf(spark, n, dir, v.toLong)
          n
        case None =>
          val n = viewName(dir, "latest")
          register(spark, n, dir)
          n
      }
    }
    spark.sql(rewritten)
  }
}
