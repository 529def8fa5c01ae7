package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-ORDER CLUSTERING — multi-column data skipping, the reason Delta
  * ships `OPTIMIZE ZORDER BY`: single-column range clustering
  * ([[VersionedTable.compact]]'s sortCol) makes ONE column's zone maps
  * selective and leaves every other column's min/max spanning the
  * whole table. Interleaving the bits of each column's normalized
  * value puts rows close in EVERY dimension into the same files, so a
  * range predicate on ANY of the z columns prunes ~n^((k-1)/k) of the
  * files from k-dimensional clustering.
  *
  * The z-value here is the standard value-range construction: each
  * column is affinely mapped onto `bits`-bit integers using its OWN
  * min/max (one narrow aggregate — no rank window, so the layout pass
  * is a scan + range-repartition at any scale; heavy skew degrades
  * pruning selectivity, never correctness, since pruned reads always
  * apply the residual filter). Bit interleaving is a fixed unrolled
  * shift/mask expression — whole-stage-codegen friendly, no UDF.
  */
object ZOrder {

  /** The interleaved z-value of `cols` (numeric/orderable-scalar) as a
    * codegen-able LONG column. `ranges` supplies each column's
    * (min, max) — from [[VersionedTable.statRangeOf]] or one agg.
    * Nulls and constant columns map to 0 (clustered together — the
    * residual filter keeps results exact). `bits` per column;
    * `bits × cols.size` must fit a long (≤ 62). */
  def zValue(cols: Seq[String], ranges: Map[String, (Double, Double)],
             bits: Int = 16): Column = {
    require(cols.nonEmpty, "z-order needs at least one column")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits per column × columns must fit a long: $bits × ${cols.size}")
    val k = cols.size
    val maxCell = (1L << bits) - 1
    val normed = cols.map { c =>
      val (mn, mx) = ranges.getOrElse(c,
        throw new IllegalArgumentException(s"no range for z column '$c'"))
      if (mx > mn)
        least(lit(maxCell), greatest(lit(0L),
          ((coalesce(col(c).cast("double"), lit(mn)) - lit(mn)) /
            lit(mx - mn) * lit(maxCell.toDouble)).cast("long")))
      else lit(0L)
    }
    (0 until bits).flatMap { i =>
      normed.zipWithIndex.map { case (n, j) =>
        shiftleft(shiftright(n, i).bitwiseAND(lit(1L)), i * k + j)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** Rewrite the latest version into a Z-ORDERED layout: rows sorted
    * by the interleaved key, range-repartitioned into
    * `max(minFiles, ceil(bytes / targetBytes))` files, committed as a
    * new version with zone maps recorded FOR EVERY Z COLUMN — after
    * which [[VersionedTable.readAsOfPruned]] on any of `cols` opens a
    * subset of the files. Idempotent per source version (batchId
    * `zorder-of-v{N}`); optimistic against concurrent commits, like
    * [[VersionedTable.compact]]. Returns (filesBefore, filesAfter). */
  def compactZOrder(spark: SparkSession, dir: String, cols: Seq[String],
                    targetBytes: Long = 256L << 20, minFiles: Int = 1,
                    bits: Int = 16,
                    bloomCols: Seq[String] = Nil): (Int, Int) = {
    require(targetBytes > 0 && minFiles >= 1)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val m = VersionedTable.latestManifest(spark, dir).getOrElse(
      throw new NoSuchElementException(s"no committed version at $dir"))
    val batchId = s"zorder-of-v${m.version}"
    if (VersionedTable.committedVersionOf(spark, dir, batchId).isDefined)
      return (m.files.size, m.files.size) // replayed
    val df = VersionedTable.readAsOf(spark, dir, m.version)
    // one narrow agg for every column's range (drives the affine map)
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast("double")).as(s"__mn_$c"),
      max(col(c).cast("double")).as(s"__mx_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    val ranges = cols.map { c =>
      val (iMn, iMx) = (r.fieldIndex(s"__mn_$c"), r.fieldIndex(s"__mx_$c"))
      c -> (if (r.isNullAt(iMn)) (0.0, 0.0)
            else (r.getDouble(iMn), r.getDouble(iMx)))
    }.toMap
    val bytes = VersionedTable.tableBytesOf(spark, dir, m.version)
    val nOut = math.max(minFiles,
      math.ceil(bytes.toDouble / targetBytes).toInt)
    val z = zValue(cols, ranges, bits)
    val laid = df.withColumn("__z", z)
      .repartitionByRange(nOut, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
    val uuid = java.util.UUID.randomUUID().toString
    val dataRel = s"data/$uuid"
    laid.write.parquet(new Path(dir, dataRel).toString)
    val files = fs.listStatus(new Path(dir, dataRel)).toSeq
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
      .map(s => s"$dataRel/${s.getPath.getName}").sorted
    VersionedTable.publishFilesIfUnchanged(spark, dir, batchId,
      m.schemaJson, files, expectedBaseVersion = m.version,
      stats = VersionedTable.fileStats(spark, dir, files, cols),
      blooms = VersionedTable.fileBlooms(spark, dir, files, bloomCols))
    (m.files.size, files.size)
  }
}
