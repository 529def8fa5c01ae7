package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

class DiscontinuitySpec extends SparkSpec {

  import spark.implicits._

  private def dec(rows: Seq[(Double, Double)]) =
    rows.map { case (r, y) => (BigDecimal(r), BigDecimal(y)) }
      .toDF("r", "y")
      .select(col("r").cast("decimal(12,2)").as("r"),
        col("y").cast("decimal(12,2)").as("y"))

  test("hand-computed jump: same slope, intercept shifted by 10") {
    // left of 5: y = 2r (r = 1..4); right: y = 2r + 10 (r = 5..8).
    // perfect fits → se 0 → t null; effect = (right b0 at r=5: 20)
    // − (left extrapolated to r=5: 10) = 10
    val df = dec(Seq((1.0, 2.0), (2.0, 4.0), (3.0, 6.0), (4.0, 8.0),
      (5.0, 20.0), (6.0, 22.0), (7.0, 24.0), (8.0, 26.0)))
    val x = Regression.discontinuity(df, "r", "y", cutoff = 5.0,
      bandwidth = 10.0).head
    assert(x.getLong(0) === 4L && x.getLong(1) === 4L)
    assert(math.abs(x.getDouble(2) - 10.0) < 1e-9, x.toString) // b0_l
    assert(math.abs(x.getDouble(3) - 20.0) < 1e-9)             // b0_r
    assert(math.abs(x.getDouble(4) - 2.0) < 1e-9)
    assert(math.abs(x.getDouble(5) - 2.0) < 1e-9)
    assert(math.abs(x.getDouble(6) - 10.0) < 1e-9, "effect = the jump")
    assert(x.getDouble(7) === 0.0 && x.isNullAt(8))
  }

  test("no discontinuity reads an effect near zero with honest se") {
    // smooth y = 3r + noise-free: both sides extrapolate to the same
    // cutoff value → effect exactly 0
    val df = dec((1 to 20).map(i => (i.toDouble, 3.0 * i)))
    val x = Regression.discontinuity(df, "r", "y", cutoff = 10.5,
      bandwidth = 20.0).head
    assert(math.abs(x.getDouble(6)) < 1e-9, x.toString)
  }

  test("bandwidth excludes far rows; cutoff row belongs to the right") {
    val df = dec(Seq((0.0, 100.0), (4.0, 1.0), (4.5, 2.0), (4.9, 3.0),
      (5.0, 50.0), (5.5, 51.0), (6.0, 52.0), (99.0, 7.0)))
    val x = Regression.discontinuity(df, "r", "y", cutoff = 5.0,
      bandwidth = 1.0).head
    // rows 0.0 and 99.0 are outside the band: n = 3 + 3
    assert(x.getLong(0) === 3L && x.getLong(1) === 3L)
    assert(x.getDouble(6) > 40, s"jump detected: ${x.getDouble(6)}")
  }

  test("too few points on a side yields no row, not garbage") {
    val df = dec(Seq((4.0, 1.0), (4.5, 2.0), (5.0, 9.0), (5.5, 9.5)))
    assert(Regression.discontinuity(df, "r", "y", 5.0, 2.0)
      .collect().isEmpty)
  }

  test("a zero-x-variance side yields no row instead of an ANSI error") {
    // left side: three rows all at r = 4.0 — no local line exists
    val df = dec(Seq((4.0, 1.0), (4.0, 2.0), (4.0, 3.0),
      (5.0, 9.0), (5.5, 9.5), (6.0, 10.0)))
    assert(Regression.discontinuity(df, "r", "y", 5.0, 2.0)
      .collect().isEmpty)
  }
}
