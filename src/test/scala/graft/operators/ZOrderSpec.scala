package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  import spark.implicits._

  test("zValue interleaves bits (known values)") {
    val df = Seq((3L, 0L), (0L, 3L), (1L, 1L), (5L, 2L), (7L, 7L))
      .toDF("x", "y")
    val got = df.select(ZOrder.zValue(col("x"), col("y"), 3)).as[Long]
      .collect().toSeq
    // x bits at even positions, y bits at odd:
    // (3,0)=0b0101=5, (0,3)=0b1010=10, (1,1)=0b11=3,
    // (5,2)=x101/y010 -> 0b010011? x:1@0,0@1,1@2 -> bits0,4; y:0@0,1@1,0@2 -> bit3
    //   = 1 + 16 + 8 = 25, (7,7)=0b111111=63
    assert(got === Seq(5L, 10L, 3L, 25L, 63L))
  }

  test("bucketize clamps and spreads the domain") {
    val df = Seq(-5.0, 0.0, 24.9, 50.0, 99.9, 100.0, 250.0).toDF("v")
    val got = df.select(ZOrder.bucketize(col("v"), 0, 100, 2)).as[Long]
      .collect().toSeq
    assert(got === Seq(0L, 0L, 0L, 2L, 3L, 3L, 3L))
  }

  test("z-layout files cover compact boxes in BOTH dims; row layout does not") {
    // 64×64 grid of points, 16 output partitions. Under z-order each
    // partition's (x, y) envelope is a compact square ~16×16; under an
    // x-sorted layout each partition spans the FULL y domain. Envelope
    // area is the file-skipping currency: a y-range predicate prunes
    // z-files but cannot prune x-sorted files.
    val pts = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    def envelopes(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.withColumn("p", spark_partition_id())
        .groupBy("p")
        .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
        .select("dx", "dy").as[(Long, Long)].collect().toSeq
    val z = envelopes(ZOrder.layout(pts, col("x"), col("y"), 6, 16))
    val rowwise = envelopes(pts.repartitionByRange(16, col("x")))
    // every z-partition is a compact box: both spans ≤ 1/4 of the domain
    assert(z.size === 16)
    assert(z.forall { case (dx, dy) => dx <= 16 && dy <= 16 })
    // the x-sorted layout can never prune on y: every partition spans it all
    assert(rowwise.forall { case (_, dy) => dy === 63L })
  }

  test("quantile bucketize spreads a power-law column; linear does not") {
    // heavy tail: value = 2^(i/100) — linear bucketize at [0, max]
    // crams ~94% of rows into bucket 0; quantile buckets equalize.
    val vals = (0 until 1000).map(i => math.pow(2.0, i / 100.0)).toDF("v")
    val mx = math.pow(2.0, 9.99)
    val linCounts = vals.select(ZOrder.bucketize(col("v"), 0, mx, 2).as("b"))
      .groupBy("b").count().as[(Long, Long)].collect().toMap
    assert(linCounts(0L) > 700L) // degenerate: most rows in one bucket
    val (q, bounds) = ZOrder.bucketizeByQuantiles(vals, col("v"), 2)
    val qCounts = vals.select(q.as("b"))
      .groupBy("b").count().as[(Long, Long)].collect().toMap
    assert(qCounts.keySet === Set(0L, 1L, 2L, 3L))
    assert(qCounts.values.forall(n => n > 200 && n < 300))
    assert(bounds.size === 3 && bounds === bounds.sorted)
  }

  test("quantile bucketize on empty/all-null input fails with a clear message") {
    val empty = Seq.empty[Double].toDF("v")
    val ex = intercept[IllegalArgumentException] {
      ZOrder.bucketizeByQuantiles(empty, col("v"), 2)
    }
    assert(ex.getMessage.contains("no non-null values"))
  }

  test("written z-files carry prunable footer stats on both columns") {
    // Write the layout, then recompute each FILE's x/y envelope via
    // input_file_name — the parquet footer min/max a reader would skip
    // on. A box predicate touching one z-quadrant must leave most
    // files' envelopes disjoint from it.
    val pts = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("zorder").toString
    ZOrder.layout(pts, col("x"), col("y"), 6, 16)
      .write.mode("overwrite").parquet(dir)
    val files = spark.read.parquet(dir)
      .withColumn("f", input_file_name())
      .groupBy("f")
      .agg(min("x").as("x0"), max("x").as("x1"),
           min("y").as("y0"), max("y").as("y1"))
      .select("x0", "x1", "y0", "y1").as[(Long, Long, Long, Long)]
      .collect().toSeq
    assert(files.size === 16)
    // box query x∈[0,15], y∈[0,15]: files whose envelope intersects it
    val touched = files.count { case (x0, _, y0, _) => x0 <= 15 && y0 <= 15 }
    assert(touched <= 4, s"expected ≤4 files touched, got $touched")
  }
}
