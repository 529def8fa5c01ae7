package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class GopherRulesSpec extends SparkSpec {

  import spark.implicits._

  private def reportOf(text: String) =
    GopherRules.report(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", minWords = 5L).collect().head

  private val goodDoc = "the quick brown fox jumps over and over " +
    "with plenty of plain words that have normal shape to them"

  test("a plain prose document passes every rule") {
    val r = reportOf(goodDoc)
    assert(r.getAs[Boolean]("pass"),
      s"good doc must pass: $r")
  }

  test("each rule fires on its own pathology") {
    // too short
    assert(!reportOf("tiny doc").getAs[Boolean]("r_word_count"))
    // degenerate word length (single-char tokens)
    val short = ("a b c d e f g h i j " * 3) + "the of and to be"
    assert(!reportOf(short).getAs[Boolean]("r_word_len"))
    // symbol spam: many # marks per word
    val hashy = goodDoc + (" #" * 30)
    assert(!reportOf(hashy).getAs[Boolean]("r_symbols"))
    assert(reportOf(goodDoc).getAs[Boolean]("r_symbols"))
    // bullet wall: every line a bullet
    val bullets = (1 to 10).map(i => s"- item $i").mkString("\n")
    assert(!reportOf(bullets).getAs[Boolean]("r_bullets"))
    // ellipsis-ended lines — BOTH spellings (Rae et al. A1.1 names
    // the Unicode "…"; round-13 ADVICE fix)
    val dots = (1 to 10).map(i => s"thought $i...").mkString("\n")
    assert(!reportOf(dots).getAs[Boolean]("r_ellipsis"))
    val uniDots = (1 to 10).map(i => s"thought $i…").mkString("\n")
    assert(!reportOf(uniDots).getAs[Boolean]("r_ellipsis"))
    // unicode ellipsis also counts as a symbol mark
    val uniHashy = goodDoc + (" …" * 30)
    assert(!reportOf(uniHashy).getAs[Boolean]("r_symbols"))
    // numeric soup: words without letters
    val numeric = goodDoc + (" 123 456 789 000 111 222 333 444" * 10)
    assert(!reportOf(numeric).getAs[Boolean]("r_alpha"))
    // missing required stop words
    val noStops = "lorem ipsum dolor sit amet consectetur adipiscing " +
      "elit sed eiusmod tempor incididunt labore dolore magna aliqua"
    assert(!reportOf(noStops).getAs[Boolean]("r_stopwords"))
  }

  test("ratios are exact and bounded; empty doc yields zero signals " +
    "and fails") {
    val r = reportOf("")
    assert(r.getAs[Long]("n_words") === 0L)
    assert(r.getAs[Double]("symbol_ratio") === 0.0)
    assert(!r.getAs[Boolean]("pass"))
    val g = reportOf(goodDoc)
    assert(g.getAs[Double]("alpha_word_ratio") === 1.0)
    assert(g.getAs[Long]("stop_word_hits") >= 2L)
  }

  test("corpus sanity: every doc reported once; pass is the AND of " +
    "the rule columns") {
    val docs = Tables.documents(spark, sf0001)
    val r = GopherRules.report(docs, "doc_id", "text", minWords = 20L)
    assert(r.count() === docs.count())
    val bad = r.filter(col("pass") =!= (col("r_word_count") &&
      col("r_word_len") && col("r_symbols") && col("r_bullets") &&
      col("r_ellipsis") && col("r_alpha") && col("r_stopwords")))
    assert(bad.count() === 0)
  }
}
