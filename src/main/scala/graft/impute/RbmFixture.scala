package graft.impute

import graft.Tables
import graft.functions.Noise
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §5.4: the one trick that puts RBM imputation itself under the
  * DuckDB oracle. `RbmModel.transform` is deterministic given frozen
  * weights, so with a small checked-in fixture weight matrix the whole
  * deterministic tail of the pipeline — encode (A5–A8), up-down pass
  * (A11), merge (A12), inverse-scale (A13), argmax decode (A14), schema
  * restore (A15) — unrolls into pure arithmetic that Spark evaluates as
  * Column expressions and DuckDB as generated SQL, bit-near-identically
  * (the only libm calls are sin/exp, ≤1 ulp apart across engines).
  *
  * Columns: customer.c_acctbal (numeric) + c_mktsegment (categorical,
  * 5 fixed values — verified stable across SFs). n_vis=6, n_hid=4.
  */
object RbmFixture {

  val segments: Seq[String] =
    Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  val nVis: Int = 1 + segments.size
  val nHid = 4

  private def r6(x: Double): Double = math.rint(x * 1e6) / 1e6

  /** Fixture weights: seeded, rounded to 6 dp so their decimal string
    * form parses back to the identical double in both engines. */
  val (w, vBias, hBias) = {
    val rng = new scala.util.Random(7)
    val w = Array.fill(nVis, nHid)(r6(rng.nextGaussian() * 0.8))
    val vb = Array.fill(nVis)(r6(rng.nextGaussian() * 0.3))
    val hb = Array.fill(nHid)(r6(rng.nextGaussian() * 0.3))
    (w, vb, hb)
  }

  val saltA = 11   // missingness salt for c_acctbal
  val saltS = 12   // missingness salt for c_mktsegment
  val noiseBase = 100 // per-unit noise-fill salts
  val frac = 0.10

  // ---------------- Spark side ----------------

  private def sigmoidC(x: Column): Column = lit(1.0) / (lit(1.0) + exp(-x))

  def query(s: SparkSession, d: String): DataFrame = {
    val key = col("c_custkey")
    val masked = Tables.customer(s, d)
      .withColumn("__missA", Noise.missingMask(key, saltA, frac))
      .withColumn("__missS", Noise.missingMask(key, saltS, frac))
      .withColumn("c_acctbal",
        when(col("__missA"), lit(null)).otherwise(col("c_acctbal")))
      .withColumn("c_mktsegment",
        when(col("__missS"), lit(null)).otherwise(col("c_mktsegment")))
    val stats = masked.agg(min("c_acctbal").as("__mn"), max("c_acctbal").as("__mx"))
    val mn = col("__mn"); val mx = col("__mx")

    val units: Seq[Column] =
      when(col("__missA"), Noise.hashNoise(key, noiseBase))
        .otherwise(Scaling.scale(col("c_acctbal"), mn, mx)) +:
      segments.zipWithIndex.map { case (seg, k) =>
        when(col("__missS"), Noise.hashNoise(key, noiseBase + 1 + k))
          .otherwise(when(col("c_mktsegment") === lit(seg), lit(1.0)).otherwise(lit(0.0)))
      }
    val withV = masked.crossJoin(broadcast(stats))
      .withColumns((0 until nVis).map(i => s"__u$i" -> units(i)).toMap)

    val hidden: Seq[Column] = (0 until nHid).map { j =>
      sigmoidC((0 until nVis).map(i => col(s"__u$i") * lit(w(i)(j)))
        .reduce(_ + _) + lit(hBias(j)))
    }
    val withH = withV.withColumns((0 until nHid).map(j => s"__h$j" -> hidden(j)).toMap)

    val recon: Seq[Column] = (0 until nVis).map { i =>
      sigmoidC((0 until nHid).map(j => col(s"__h$j") * lit(w(i)(j)))
        .reduce(_ + _) + lit(vBias(i)))
    }
    val withR = withH.withColumns((0 until nVis).map(i => s"__r$i" -> recon(i)).toMap)

    // argmax decode with ties-to-first, mirrored verbatim in the SQL
    val gm = greatest((1 to segments.size).map(k => col(s"__r$k")): _*)
    val decoded = segments.zipWithIndex.tail.foldLeft(
      when(col("__r1") === gm, lit(segments.head))) { case (acc, (seg, k)) =>
        acc.when(col(s"__r${k + 1}") === gm, lit(seg))
    }
    // round imputed money to its natural 2-decimal grid — also absorbs
    // the ≤1-ulp libm exp() drift between engines, keeping the oracle
    // compare bit-exact
    withR.select(
      col("c_custkey"), col("c_name"), col("c_nationkey"),
      when(col("__missA"), round(Scaling.unscale(col("__r0"), mn, mx), 2))
        .otherwise(col("c_acctbal")).as("c_acctbal"),
      when(col("__missS"), decoded).otherwise(col("c_mktsegment")).as("c_mktsegment"))
  }

  // ---------------- DuckDB oracle side ----------------

  def oracleSql: String = {
    val missA = Noise.sqlMissing("c_custkey", saltA, frac)
    val missS = Noise.sqlMissing("c_custkey", saltS, frac)
    def d(v: Double) = Noise.sqlDouble(v)
    def sig(x: String) = s"1.0e0/(1.0e0 + exp(-($x)))"
    val units =
      (s"CASE WHEN missa THEN ${Noise.sqlNoise("c_custkey", noiseBase)} " +
        s"ELSE (CASE WHEN mx = mn THEN 0.0e0 ELSE (c_acctbal - mn)/(mx - mn) END) END AS u0") +:
      segments.zipWithIndex.map { case (seg, k) =>
        s"CASE WHEN misss THEN ${Noise.sqlNoise("c_custkey", noiseBase + 1 + k)} " +
          s"ELSE (CASE WHEN c_mktsegment = '$seg' THEN 1.0e0 ELSE 0.0e0 END) END AS u${k + 1}"
      }
    val hidden = (0 until nHid).map { j =>
      val terms = (0 until nVis).map(i => s"u$i * ${d(w(i)(j))}").mkString(" + ")
      s"${sig(s"$terms + ${d(hBias(j))}")} AS h$j"
    }
    val recon = (0 until nVis).map { i =>
      val terms = (0 until nHid).map(j => s"h$j * ${d(w(i)(j))}").mkString(" + ")
      s"${sig(s"$terms + ${d(vBias(i))}")} AS r$i"
    }
    val gm = s"greatest(${(1 to segments.size).map(k => s"r$k").mkString(", ")})"
    val decode = segments.zipWithIndex
      .map { case (seg, k) => s"WHEN r${k + 1} = $gm THEN '$seg'" }
      .mkString("CASE ", " ", " END")
    s"""WITH masked AS (
       |  SELECT c_custkey, c_name, c_nationkey,
       |         CASE WHEN $missA THEN NULL ELSE c_acctbal END AS c_acctbal,
       |         CASE WHEN $missS THEN NULL ELSE c_mktsegment END AS c_mktsegment,
       |         $missA AS missa, $missS AS misss
       |  FROM customer),
       |stat AS (SELECT min(c_acctbal) AS mn, max(c_acctbal) AS mx FROM masked),
       |u AS (SELECT masked.*, stat.mn, stat.mx, ${units.mkString(", ")} FROM masked, stat),
       |h AS (SELECT u.*, ${hidden.mkString(", ")} FROM u),
       |r AS (SELECT h.*, ${recon.mkString(", ")} FROM h)
       |SELECT c_custkey, c_name, c_nationkey,
       |       CASE WHEN missa THEN round(r0 * (mx - mn) + mn, 2) ELSE c_acctbal END AS c_acctbal,
       |       CASE WHEN misss THEN $decode ELSE c_mktsegment END AS c_mktsegment
       |FROM r""".stripMargin
  }
}
