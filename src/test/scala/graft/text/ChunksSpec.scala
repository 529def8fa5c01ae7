package graft.text

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class ChunksSpec extends SparkSpec {

  import spark.implicits._

  private def chunksOf(text: String, size: Int, stride: Int): Seq[String] =
    Seq(text).toDF("text")
      .withColumn("__toks", TextFunctions.tokens(col("text")))
      .select(TextFunctions.chunks(col("__toks"), size, stride))
      .head().getSeq[String](0)

  test("windows, stride, and the shorter tail chunk") {
    val c = chunksOf("a b c d e f g", 3, 2)
    assert(c === Seq("a b c", "c d e", "e f g"))
    val tail = chunksOf("a b c d e f g h", 3, 2)
    assert(tail === Seq("a b c", "c d e", "e f g", "g h"))
  }

  test("short and empty docs") {
    assert(chunksOf("a b", 32, 24) === Seq("a b"))
    assert(chunksOf("", 32, 24) === Seq.empty)
    assert(chunksOf("   ", 32, 24) === Seq.empty)
  }

  test("every corpus token lands in at least one chunk (stride <= size)") {
    val docs = Tables.documents(spark, sf0001)
      .withColumn("__toks", TextFunctions.tokens(col("text")))
    val covered = docs.select(
        size(col("__toks")).as("k"),
        aggregate(TextFunctions.chunks(col("__toks"), 32, 24), lit(0),
          (acc, ch) => acc + size(split(ch, " "))).as("chunk_tokens"))
    // with 8-token overlap, chunk tokens >= k (tokens counted >= once)
    assert(covered.filter(col("chunk_tokens") < col("k")).count() === 0)
    // and reassembling stride-covered prefixes reproduces the doc:
    // chunk c starts at token c*24+1, so concatenating each chunk's
    // FIRST 24 tokens (plus the last chunk's tail) equals the doc
    val recon = docs.filter(size(col("__toks")) > 40).limit(50)
      .select(concat_ws(" ", col("__toks")).as("doc"),
        concat_ws(" ", flatten(transform(
          TextFunctions.chunks(col("__toks"), 32, 24),
          ch => slice(split(ch, " "), 1, 24)))).as("prefix_concat"))
    val bad = recon.filter(
      not(col("doc") === col("prefix_concat")) &&
        not(col("prefix_concat").startsWith(col("doc"))) &&
        not(col("doc").startsWith(col("prefix_concat"))))
    assert(bad.count() === 0)
  }
}
