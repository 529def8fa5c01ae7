package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CalibrationSpec extends SparkSpec {

  import spark.implicits._

  test("perfectly calibrated scores give ECE ≈ 0") {
    // bin b: all scores at the bin center, positives at exactly the
    // center rate → every bin's gap is 0
    val exact = for {
      b <- 0 until 10
      center = 0.05 + b / 10.0
      nPos = math.round(center * 20).toInt
      i <- 0 until 20
    } yield (center, if (i < nPos) 1 else 0)
    val out = Calibration.reliability(exact.toDF("score", "label"),
      "score", "label")
    val ece = out.select("ece").head().getDouble(0)
    assert(ece <= 0.011, s"calibrated fixture ECE $ece")  // rounding only
  }

  test("systematic overconfidence shows up as the exact gap") {
    // all scores 0.95, true rate 0.5 → one bin, gap 0.45, ECE 0.45
    val rows = (0 until 100).map(i => (0.95, i % 2)).toDF("score", "label")
    val r = Calibration.reliability(rows, "score", "label").collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getLong(row.fieldIndex("bin")) === 9L)
    assert(row.getDouble(row.fieldIndex("conf")) === 0.95)
    assert(row.getDouble(row.fieldIndex("acc")) === 0.5)
    assert(row.getDouble(row.fieldIndex("gap")) === 0.45)
    assert(row.getDouble(row.fieldIndex("ece")) === 0.45)
  }

  test("score 1.0 clamps into the top bin; ece weights by bin mass") {
    val rows = ((0 until 90).map(_ => (1.0, 1)) ++
      (0 until 10).map(_ => (0.05, 1))).toDF("score", "label")
    val out = Calibration.reliability(rows, "score", "label")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out.keySet === Set(0L, 9L))
    val top = out(9L)
    assert(top.getLong(1) === 90L)
    assert(top.getDouble(top.fieldIndex("gap")) === 0.0) // conf 1, acc 1
    // bin 0: conf .05, acc 1 → gap .95, weighted 10/100
    val ece = top.getDouble(top.fieldIndex("ece"))
    assert(ece === 0.095)
  }

  test("layout determinism") {
    val df = graft.Tables.documents(spark, sf0001)
      .select(graft.text.TextFunctions.qualityScore(col("text")).as("score"),
        (col("n_chars") >= 200).cast("int").as("label"))
    val a = Calibration.reliability(df, "score", "label")
      .collect().map(_.toSeq).toSet
    val b = Calibration.reliability(df.repartition(11), "score", "label")
      .collect().map(_.toSeq).toSet
    assert(a === b)
  }
}
