package graft.operators

import graft.SparkSpec

class HistogramSpec extends SparkSpec {

  import spark.implicits._

  test("bucket placement, under/overflow, empty buckets, edges") {
    val df = Seq(-5.0, 0.0, 4.9, 5.0, 9.9, 25.0, 30.0, 100.0)
      .toDF("x")
    // [0,30) in 6 buckets of width 5
    val rows = Histogram.equiWidth(df, "x", 0.0, 30.0, 6)
      .orderBy("bucket").collect()
    assert(rows.length === 8) // -1 .. 6
    val counts = rows.map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(counts === Map(-1L -> 1L, 0L -> 2L, 1L -> 2L, 2L -> 0L,
      3L -> 0L, 4L -> 0L, 5L -> 1L, 6L -> 2L))
    // boundary value 5.0 lands in bucket 1; 30.0 overflows (hi-exclusive)
    val b1 = rows.find(_.getLong(0) == 1L).get
    assert(b1.getDouble(1) === 5.0 && b1.getDouble(2) === 10.0)
    // under/overflow edges are null
    assert(rows.head.isNullAt(1) && rows.head.isNullAt(2))
    assert(rows.last.isNullAt(1) && rows.last.isNullAt(2))
  }

  test("nulls are excluded; total count preserved") {
    val df = Seq(Some(1.0), None, Some(2.0), Some(50.0)).toDF("x")
    val rows = Histogram.equiWidth(df, "x", 0.0, 10.0, 2).collect()
    assert(rows.map(_.getLong(3)).sum === 3L)
  }

  test("lineitem histogram: mass conservation and monotone edges") {
    val li = graft.Tables.lineitem(spark, sf0001)
    val hist = Histogram.equiWidth(li, "l_extendedprice", 0.0, 110000.0, 22)
      .orderBy("bucket").collect()
    assert(hist.map(_.getLong(3)).sum === li.count())
    val interior = hist.filter(r => !r.isNullAt(1))
    assert(interior.length === 22)
    interior.sliding(2).foreach { w =>
      assert(w(0).getDouble(2) === w(1).getDouble(1)) // contiguous edges
    }
  }
}
