package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SymSpellSpec extends SparkSpec {

  import spark.implicits._

  private def variants(s: String, d: Int): Set[String] =
    Seq(s).toDF("s")
      .select(SymSpell.deleteVariants(col("s"), d).as("v"))
      .collect().head.getSeq[String](0).toSet

  test("deletion variants: known small cases") {
    assert(variants("abc", 0) === Set("abc"))
    assert(variants("abc", 1) === Set("abc", "bc", "ac", "ab"))
    assert(variants("abc", 2) === Set("abc", "bc", "ac", "ab", "a", "b", "c"))
    assert(variants("aaa", 1) === Set("aaa", "aa")) // runs dedupe
    assert(variants("", 1) === Set(""))
    assert(variants("x", 1) === Set("x", ""))
  }

  test("unsupported distance throws") {
    intercept[IllegalArgumentException] { SymSpell.deleteVariants(col("s"), 3) }
  }

  private def naivePairs(df: org.apache.spark.sql.DataFrame, d: Int) = {
    val a = df.select(col("id").as("id_a"), col("s").as("sa"))
    val b = df.select(col("id").as("id_b"), col("s").as("sb"))
    a.crossJoin(b)
      .where(col("id_a") < col("id_b") && levenshtein(col("sa"), col("sb")) <= d)
      .select(col("id_a"), col("id_b"),
        levenshtein(col("sa"), col("sb")).cast("long").as("dist"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  private val mixed = Seq(
    1L -> "kitten", 2L -> "sitten", 3L -> "sittin", 4L -> "sitting",
    5L -> "kitten",               // exact dup of 1 → dist 0
    6L -> "mitten", 7L -> "bitten", 8L -> "it", 9L -> "kit",
    10L -> "completely-different").toDF("id", "s")

  test("fuzzyPairs == naive all-pairs filter, d=1 and d=2") {
    for (d <- Seq(1, 2)) {
      val got = SymSpell.fuzzyPairs(mixed, "id", "s", d)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === naivePairs(mixed, d), s"mismatch at d=$d")
    }
  }

  test("fuzzyPairs on real customer names == naive (sf0.001)") {
    val cust = graft.Tables.customer(spark, sf0001)
      .select(col("c_custkey").as("id"),
        // corrupt half the names with one digit deleted so true pairs exist
        when(col("c_custkey") % 2 === 0,
          concat(expr("substring(c_name, 1, 12)"), expr("substring(c_name, 14, 100)")))
          .otherwise(col("c_name")).as("s"))
    val got = SymSpell.fuzzyPairs(cust, "id", "s", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === naivePairs(cust, 1))
    assert(got.nonEmpty, "corrupted corpus produced no near pairs")
  }

  test("fuzzyJoin R-S == naive cross filter; null and empty inputs safe") {
    val left = Seq(1L -> "alpha", 2L -> "beta", 3L -> "").toDF("lid", "ls")
    val right = Seq(10L -> "alpa", 11L -> "betas", 12L -> "x",
      13L -> "gamma").toDF("rid", "rs")
    val got = SymSpell.fuzzyJoin(left, "lid", "ls", right, "rid", "rs", 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val naive = left.crossJoin(right)
      .where(levenshtein(col("ls"), col("rs")) <= 1)
      .select(col("lid"), col("rid"),
        levenshtein(col("ls"), col("rs")).cast("long").as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === naive)
    assert(got.contains((1L, 10L, 1L)) && got.contains((3L, 12L, 1L)))
    // null strings produce no pairs and no crash
    val withNull = Seq((1L, Option("abc")), (2L, Option.empty[String]))
      .toDF("id", "s")
    assert(SymSpell.fuzzyPairs(withNull, "id", "s", 1).count() === 0L)
  }
}
