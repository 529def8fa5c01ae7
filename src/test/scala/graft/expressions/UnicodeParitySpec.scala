package graft.expressions

import graft.SparkSpec
import graft.text.{TextFunctions, Winnowing}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Astral-plane parity: the native expressions iterate CODE POINTS; the
  * compositions they replaced go through Spark's split-by-"" and
  * per-character functions. Surrogate-pair inputs (emoji, musical
  * symbols) are where those two views of a string can disagree — pin
  * them to each other. */
class UnicodeParitySpec extends SparkSpec {

  import spark.implicits._

  private val texts = Seq(
    "plain ascii words",
    "café naïve straße",          // BMP accents
    "🎉 party 🎉 time",      // emoji (surrogate pairs)
    "mix😀ed to𝔬ken",       // pairs inside tokens
    "𝔬𝔮𝔯",      // all-astral token
    "")

  private def df = texts.toDF("text")

  test("Shingles: native == composition on astral-plane text") {
    def composed(text: Column, n: Int): Column = {
      val toks = TextFunctions.tokens(text)
      when(size(toks) < n, array(concat_ws(" ", toks)))
        .otherwise(transform(sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
    }
    for (n <- Seq(2, 3)) {
      val bad = df.select(TextFunctions.shingles(col("text"), n).as("a"),
          composed(col("text"), n).as("b"))
        .filter(not(col("a") <=> col("b")))
      assert(bad.count() === 0, s"n=$n")
    }
  }

  test("HornerHash: native == split+ascii composition on astral text") {
    def composed(s: Column): Column =
      aggregate(filter(split(s, ""), c => length(c) > 0),
        lit(0L), (acc, c) => (acc * lit(31L) + ascii(c).cast("long")) % lit(1000000007L))
    val bad = df.select(
        graft.dedup.MinHashDedup.portableShingleHash(col("text")).as("a"),
        composed(col("text")).as("b"))
      .filter(not(col("a") <=> col("b")))
    assert(bad.count() === 0)
  }

  test("GramHashes: native == fold composition on astral text") {
    val withCodes = df
      .withColumn("__norm", Winnowing.normalize(col("text")))
      .withColumn("__codes", Winnowing.charCodes(col("__norm")))
    for (k <- Seq(2, 4)) {
      val bad = withCodes.select(
          Winnowing.gramHashes(col("__norm"), k).as("a"),
          Winnowing.gramHashesComposed(col("__codes"), k).as("b"))
        .filter(not(col("a") <=> col("b")))
      assert(bad.count() === 0, s"k=$k")
    }
  }

  test("CharNgrams: native == substring composition on astral text") {
    def composed(s: Column, n: Int): Column =
      when(length(s) < n, array())
        .otherwise(transform(sequence(lit(1), length(s) - (n - 1)),
          i => substring(s, i.cast("int"), lit(n))))
    for (n <- Seq(2, 3)) {
      val bad = df.select(TextFunctions.charNgrams(lower(col("text")), n).as("a"),
          composed(lower(col("text")), n).as("b"))
        .filter(not(col("a") <=> col("b")))
      assert(bad.count() === 0, s"n=$n")
    }
  }
}
