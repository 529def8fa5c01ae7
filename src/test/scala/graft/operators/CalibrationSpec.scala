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

  test("pav: hand-computed violator pooling") {
    // means .2, .8, .4 → the (.8, .4) violation pools to 12/20 = .6
    val blocks = Array((10L, 2L), (10L, 8L), (10L, 4L))
    assert(Calibration.pav(blocks).toSeq === Seq(0.2, 0.6, 0.6))
    // cascade: pooling can trigger an earlier violation
    // means .9, .5, .1 → all pool to 15/30 = .5
    assert(Calibration.pav(Array((10L, 9L), (10L, 5L), (10L, 1L)))
      .toSeq === Seq(0.5, 0.5, 0.5))
    // already monotone → untouched
    assert(Calibration.pav(Array((10L, 1L), (10L, 5L), (10L, 9L)))
      .toSeq === Seq(0.1, 0.5, 0.9))
  }

  test("isotonic: monotone, mass-preserving, idempotent on clean data") {
    // a miscalibrated middle: scores near .5 are actually BETTER than
    // scores near .7
    val rows = ((0 until 40).map(i => (0.05 + (i % 4) * 0.01, if (i % 10 == 0) 1 else 0)) ++
      (0 until 40).map(i => (0.45 + (i % 4) * 0.01, if (i % 10 != 9) 1 else 0)) ++
      (0 until 40).map(i => (0.65 + (i % 4) * 0.01, if (i % 2 == 0) 1 else 0)) ++
      (0 until 40).map(i => (0.95 + (i % 4) * 0.01, 1))).toDF("score", "label")
    val out = Calibration.isotonic(rows, "score", "label", nBins = 10)
      .orderBy("bin").collect()
    val cal = out.map(_.getDouble(3))
    assert(cal.zip(cal.tail).forall { case (x, y) => y >= x }, // monotone
      cal.mkString(","))
    // mass preservation: Σ n·calibrated == Σ labels (pooled ratios)
    val mass = out.map(r => r.getLong(1) * r.getDouble(3)).sum
    assert(math.abs(mass - 40 * (4 + 36 + 20 + 40) / 40.0) < 1e-3,
      s"mass $mass")
    // the .45 vs .65 inversion is pooled: their calibrated values equal
    val byBin = out.map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(byBin(4L) === byBin(6L), byBin.toString)
    // idempotence: calibrating already-monotone bins changes nothing
    val clean = ((0 until 50).map(i => (0.1, if (i < 5) 1 else 0)) ++
      (0 until 50).map(i => (0.9, if (i < 45) 1 else 0))).toDF("score", "label")
    val c = Calibration.isotonic(clean, "score", "label", nBins = 10)
      .orderBy("bin").collect()
    assert(c.map(r => (r.getDouble(2), r.getDouble(3)))
      .forall { case (raw, cal2) => raw === cal2 })
  }

  test("brier decomposition: hand-computed two-bin case") {
    // bin .0x: scores .05, labels (0,0,0,1) → conf .05, acc .25
    // bin .9x: scores .95, labels (1,1,1,0) → conf .95, acc .75
    val df = (Seq.fill(3)((0.05, 0)) ++ Seq((0.05, 1)) ++
      Seq.fill(3)((0.95, 1)) ++ Seq((0.95, 0)))
      .toDF("score", "label")
    val r = Calibration.brierDecomposition(df, "score", "label").head
    assert(r.getLong(0) === 8L)
    // direct: Σ(s−y)²/8 = (3·.0025 + .9025 + 3·.0025 + .9025)/8 = .2275
    assert(math.abs(r.getDouble(1) - 0.2275) < 1e-6, r.toString)
    // REL = ½(.05−.25)² + ½(.95−.75)² = .04
    assert(math.abs(r.getDouble(2) - 0.04) < 1e-6, r.toString)
    // ō = .5; RES = ½(.25−.5)² + ½(.75−.5)² = .0625; UNC = .25
    assert(math.abs(r.getDouble(3) - 0.0625) < 1e-6)
    assert(math.abs(r.getDouble(4) - 0.25) < 1e-6)
    // within-bin-constant scores → the identity is exact
    assert(math.abs(r.getDouble(5) - r.getDouble(1)) < 1e-6,
      s"decomp ${r.getDouble(5)} vs direct ${r.getDouble(1)}")
  }

  test("brier: a perfect hard classifier scores 0 everywhere it can") {
    val df = (Seq.fill(5)((0.0, 0)) ++ Seq.fill(5)((1.0, 1)))
      .toDF("score", "label")
    val r = Calibration.brierDecomposition(df, "score", "label").head
    assert(r.getDouble(1) === 0.0 && r.getDouble(2) === 0.0)
    assert(math.abs(r.getDouble(3) - 0.25) < 1e-6, "RES = UNC")
    assert(math.abs(r.getDouble(5)) < 1e-6)
  }
}
