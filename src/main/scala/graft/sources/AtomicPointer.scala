package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** ATOMIC VERSIONED POINTER — the catalog-swap half of
  * [[VersionedTable]]'s protocol for state that is NOT a plain file
  * set: bucketed catalog tables (bucket specs live in the catalog, so
  * a manifest of parquet paths would drop the zero-Exchange join),
  * model directories, serving endpoints. The pointer history is a
  * sequence of committed versions each naming one single-line VALUE;
  * `current` is the highest committed version. Writers publish a new
  * value with the same three-step protocol (slot claim via POSIX
  * O_CREAT|O_EXCL on file:// / atomic create elsewhere, terminator
  * commit, read-back ownership verify), so a reader never observes a
  * torn swap and a crashed writer leaves an invisible stub.
  *
  * The hazard this closes is documented at the serving indexes' call
  * sites (`Registry.indexScratch`: "lazy reads racing an Overwrite"):
  * a rebuild now writes a FRESH versioned table/path and swaps the
  * pointer atomically — in-flight readers keep the old version's
  * table, new readers resolve the new one, and retention GC drops old
  * versions once drained. */
object AtomicPointer {

  private val Terminator = "committed"

  private def fsOf(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def slotDir(dir: String) = new Path(dir, "_pointer")

  /** One committed pointer slot: (version, value, writer tag, commit
    * wall clock — 0 for slots predating the ts field). */
  private[graft] case class Slot(version: Long, value: String,
                                 tag: Option[String], ts: Long)

  private def readSlot(fs: FileSystem, p: Path): Option[Slot] = {
    val in = fs.open(p)
    val txt = try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
      new String(out.toByteArray, StandardCharsets.UTF_8)
    } finally in.close()
    val lines = txt.split("\n", -1).toSeq
    if (!lines.contains(Terminator)) return None
    for {
      v <- lines.find(_.startsWith("version=")).map(_.drop(8).toLong)
      value <- lines.find(_.startsWith("value=")).map(_.drop(6))
    } yield Slot(v, value,
      lines.find(_.startsWith("tag=")).map(_.drop(4)),
      lines.find(_.startsWith("ts=")).flatMap(l =>
        scala.util.Try(l.drop(3).toLong).toOption).getOrElse(0L))
  }

  private def committed(fs: FileSystem, dir: String): Seq[Slot] = {
    val sd = slotDir(dir)
    if (!fs.exists(sd)) return Seq.empty
    fs.listStatus(sd).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("."))
      .flatMap(s => readSlot(fs, s.getPath))
      .sortBy(_.version)
  }

  /** All committed (version, value) pairs, ascending. */
  def history(spark: SparkSession, dir: String): Seq[(Long, String)] =
    committed(fsOf(spark, dir), dir).map(s => (s.version, s.value))

  /** [[history]] with each version's writer TAG (the replay-identity
    * line [[TableSet.publishAll]] records its set batchId under) —
    * bounded by retention like the history itself. */
  def taggedHistory(spark: SparkSession, dir: String)
      : Seq[(Long, String, Option[String])] =
    committed(fsOf(spark, dir), dir).map(s => (s.version, s.value, s.tag))

  /** The value current "as of" `tsMillis` (newest version committed at
    * or before it — same advisory-timestamp contract as
    * [[VersionedTable.readAsOfTimestamp]]: version order is the truth,
    * pre-ts-field slots never qualify). */
  def valueAsOfTimestamp(spark: SparkSession, dir: String,
                         tsMillis: Long): Option[String] =
    committed(fsOf(spark, dir), dir)
      .filter(s => s.ts > 0L && s.ts <= tsMillis)
      .sortBy(_.version).lastOption.map(_.value)

  /** The current value (highest committed version), if any. */
  def current(spark: SparkSession, dir: String): Option[String] =
    history(spark, dir).lastOption.map(_._2)

  /** Value at a specific committed version. */
  def valueAsOf(spark: SparkSession, dir: String, version: Long): String =
    history(spark, dir).find(_._1 == version).map(_._2)
      .getOrElse(throw new NoSuchElementException(
        s"pointer version $version is not committed at $dir"))

  /** Publish `value` as the next version. Returns the committed
    * version number. Single-line values only. `tag` (optional,
    * single-line) records the writer's replay identity in the slot —
    * [[taggedHistory]] surfaces it so a caller can make its own
    * publish batchId-idempotent against the WHOLE retained history,
    * not just the current head value. */
  def publish(spark: SparkSession, dir: String, value: String,
              maxRetries: Int = 20, tag: Option[String] = None): Long = {
    require(!value.contains("\n"), "pointer values must be single-line")
    require(tag.forall(t => t.nonEmpty && !t.contains("\n")),
      "pointer tags must be non-empty single-line strings")
    val fs = fsOf(spark, dir)
    fs.mkdirs(slotDir(dir))
    def maxSlot(): Long =
      fs.listStatus(slotDir(dir)).toSeq
        .flatMap(s => scala.util.Try(s.getPath.getName.toLong).toOption)
        .foldLeft(0L)(math.max)
    def claim(p: Path): Option[java.io.OutputStream] = {
      val uri = fs.getUri
      if (uri.getScheme == null || uri.getScheme == "file") {
        val f = new java.io.File(p.toUri.getPath)
        if (f.createNewFile()) Some(new java.io.FileOutputStream(f))
        else None
      } else {
        try Some(fs.create(p, false))
        catch { case _: java.io.IOException => None }
      }
    }
    val token = java.util.UUID.randomUUID().toString
    var attempt = 0
    while (attempt < maxRetries) {
      val next = maxSlot() + 1L
      val p = new Path(slotDir(dir), next.toString)
      claim(p) match {
        case Some(o) =>
          try o.write(
            (Seq(s"version=$next", s"token=$token",
              s"ts=${System.currentTimeMillis()}", s"value=$value") ++
              tag.map(t => s"tag=$t") :+ Terminator :+ "").mkString("\n")
              .getBytes(StandardCharsets.UTF_8))
          finally o.close()
          // ownership verify for FSes with non-atomic create
          val in = fs.open(p)
          val ok = try scala.io.Source.fromInputStream(in, "UTF-8")
            .getLines().contains(s"token=$token") finally in.close()
          if (ok) return next
          attempt += 1
        case None => attempt += 1
      }
    }
    throw new IllegalStateException(
      s"AtomicPointer.publish($dir): lost the slot $maxRetries times")
  }

  /** Drop history older than the newest `keepLast` versions (the
    * values' underlying resources are the caller's to GC — this only
    * trims the pointer log). Returns versions dropped. */
  def gc(spark: SparkSession, dir: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1)
    val fs = fsOf(spark, dir)
    val keep = committed(fs, dir).takeRight(keepLast).map(_.version).toSet
    val sd = slotDir(dir)
    if (!fs.exists(sd)) return Seq.empty
    fs.listStatus(sd).toSeq.flatMap { s =>
      val v = readSlot(fs, s.getPath).map(_.version)
      val stale = v.forall(!keep(_)) // uncommitted stubs also drop
      if (stale) { fs.delete(s.getPath, false); v.orElse(Some(-1L)) }
      else None
    }.filter(_ >= 0).sorted
  }
}
