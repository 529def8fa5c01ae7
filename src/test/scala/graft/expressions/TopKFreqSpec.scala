package graft.expressions

import graft.{SparkSpec, Tables}
import graft.text.TextFunctions
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class TopKFreqSpec extends SparkSpec {

  private def tokens(sf: String) =
    Tables.documents(spark, sf)
      .select(explode(TextFunctions.tokens(col("text"))).as("token"))

  private def exactTopK(sf: String, k: Int): Seq[(String, Long)] =
    tokens(sf).groupBy(col("token")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc).limit(k)
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))

  private def sketchTopK(sf: String, k: Int, capacity: Int): Seq[(String, Long)] =
    tokens(sf)
      .agg(expr(s"graft_topk_freq(token, $k, $capacity)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))

  test("exact regime: capacity above distinct count reproduces groupBy exactly") {
    val distinct = tokens(sf0001).distinct().count().toInt
    val got = sketchTopK(sf0001, 30, distinct + 100)
    assert(got === exactTopK(sf0001, 30))
  }

  test("exact regime survives partition merges") {
    val distinct = tokens(sf0001).distinct().count().toInt
    val got = tokens(sf0001).repartition(8)
      .agg(expr(s"graft_topk_freq(token, 30, ${distinct + 100})").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
    assert(got === exactTopK(sf0001, 30))
  }

  test("sketch regime: undercounts bounded by n/(capacity+1), heavy hitter found") {
    import spark.implicits._
    // zipf-ish stream: item i appears ~ 4000/i times, i in 1..200
    val data = (1 to 200).flatMap(i => Seq.fill(4000 / i)(s"item$i"))
    val n = data.size
    val capacity = 32
    val df = data.toDF("token").repartition(4)
    val got = df.agg(expr(s"graft_topk_freq(token, 10, $capacity)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item"), col("e.cnt"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // MG reported counts never overcount and undercount at most n/(cap+1)
    got.foreach { case (item, cnt) =>
      assert(cnt <= truth(item), s"$item overcounted")
      assert(cnt >= truth(item) - n / (capacity + 1), s"$item undercounted past bound")
    }
    // the dominant item is guaranteed present (freq 4000 > n/(cap+1))
    assert(got.contains("item1"))
  }

  test("bench-scale guard: capacity 65536 keeps every graft_topk_freq query exact at sf0.1") {
    // c5_frequent_tokens / c5_topk_per_lang / c5_heavy_hitter_shingles
    // route through graft_topk_freq(…, 65536) and claim EXACT counts —
    // true only while distinct items stay below capacity (no decrement
    // ever fires). The bench runs at sf0.1 WITHOUT the DuckDB oracle,
    // so this spec pins the assumption at that scale factor: if corpus
    // growth ever saturates the summary, this fails loudly instead of
    // the bench silently reporting approximate counts as exact.
    val sf01 = "/root/testdata/sf0.1"
    assume(new java.io.File(sf01).isDirectory, "sf0.1 testdata not mounted")
    val cap = 65536
    val distinctTokens = tokens(sf01).distinct().count()
    assert(distinctTokens <= cap,
      s"distinct unigrams $distinctTokens exceed capacity $cap — " +
        "c5_frequent_tokens/c5_topk_per_lang are no longer exact")
    val distinctShingles = Tables.documents(spark, sf01)
      .select(explode(TextFunctions.shingles(col("text"), 3)).as("sh"))
      .distinct().count()
    assert(distinctShingles <= cap,
      s"distinct 3-shingles $distinctShingles exceed capacity $cap — " +
        "c5_heavy_hitter_shingles is no longer exact")
    // per-lang groups see a subset of the corpus-wide distinct set, so
    // the corpus-wide checks above cover the grouped query too; close
    // the loop end-to-end on the corpus-wide top-50
    assert(sketchTopK(sf01, 50, cap) === exactTopK(sf01, 50))
  }

  test("group-by integration and null handling") {
    import spark.implicits._
    val df = Seq(("a", Some("x")), ("a", Some("x")), ("a", Some("y")),
        ("a", None), ("b", Some("z")), ("b", None))
      .toDF("g", "token")
    val got = df.groupBy(col("g"))
      .agg(expr("graft_topk_freq(token, 2, 16)").as("tk"))
      .orderBy(col("g"))
      .collect().map(r => (r.getString(0),
        r.getSeq[Row](1).map(e => (e.getString(0), e.getLong(1)))))
    assert(got(0) === ("a", Seq(("x", 2L), ("y", 1L))))
    assert(got(1) === ("b", Seq(("z", 1L))))
  }
}
