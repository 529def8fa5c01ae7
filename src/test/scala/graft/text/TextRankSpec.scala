package graft.text

import graft.SparkSpec

class TextRankSpec extends SparkSpec {

  import spark.implicits._

  test("a hub word adjacent to everything outranks the periphery") {
    // star-shaped adjacency: "hub" neighbors every spoke; spokes only
    // ever neighbor the hub
    val docs = Seq("hub one", "hub two", "hub three", "hub four",
      "hub five").toDF("text")
    val r = TextRank.keywords(docs, "text", k = 10, iterations = 3)
      .collect().map(x => x.getString(0) -> x.getLong(1))
    assert(r.head._1 === "hub", s"expected hub first, got ${r.toSeq}")
    assert(r.map(_._1).toSet ===
      Set("hub", "one", "two", "three", "four", "five"))
    // spokes are symmetric — identical ranks, tie-broken by word
    val spokes = r.filter(_._1 != "hub").map(_._2).toSet
    assert(spokes.size === 1, s"spokes must tie: ${r.toSeq}")
    assert(r.head._2 > spokes.head)
  }

  test("k truncates the total order; repeated-token self-loops are " +
    "excluded; one-token docs carry no edges") {
    val docs = Seq("a b c", "a b", "solo", "dup dup dup").toDF("text")
    val r = TextRank.keywords(docs, "text", k = 2, iterations = 2)
      .collect()
    assert(r.length === 2)
    // "solo" never appears: no adjacency; "dup" only self-loops
    val all = TextRank.keywords(docs, "text", k = 100, iterations = 2)
      .collect().map(_.getString(0)).toSet
    assert(all === Set("a", "b", "c"))
  }
}
