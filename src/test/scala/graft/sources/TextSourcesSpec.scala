package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

class TextSourcesSpec extends SparkSpec {

  private def docs = Tables.documents(spark, sf0001)
  private def dataSchema: StructType = docs.schema

  private def assertSameRows(a: org.apache.spark.sql.DataFrame,
                             b: org.apache.spark.sql.DataFrame): Unit = {
    assert(a.count() === b.count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("documents round-trip through JSON lines bit-exactly") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl").toString
    TextSources.writeJsonLines(docs, s"$dir/docs")
    val back = TextSources.readJsonLines(spark, s"$dir/docs", dataSchema)
      .select(docs.columns.map(col): _*)
    assertSameRows(docs, back)
  }

  test("documents round-trip through CSV (free text with commas/quotes/newlines)") {
    val dir = java.nio.file.Files.createTempDirectory("csv").toString
    TextSources.writeCsv(docs, s"$dir/docs")
    val back = TextSources.readCsv(spark, s"$dir/docs", dataSchema)
      .select(docs.columns.map(col): _*)
    assertSameRows(docs, back)
  }

  test("documents round-trip through ORC bit-exactly; pushdown reaches the scan") {
    val dir = java.nio.file.Files.createTempDirectory("orc").toString
    TextSources.writeOrc(docs, s"$dir/docs")
    val back = TextSources.readOrc(spark, s"$dir/docs", dataSchema)
      .select(docs.columns.map(col): _*)
    assertSameRows(docs, back)
    // lineitem through ORC: a filtered two-column projection must push
    // the predicate and prune the schema exactly as on parquet
    val li = Tables.lineitem(spark, sf0001)
    TextSources.writeOrc(li, s"$dir/li")
    val filtered = TextSources.readOrc(spark, s"$dir/li", li.schema)
      .filter(col("l_quantity") >= 45)
      .select("l_orderkey", "l_quantity")
    assert(filtered.count() ===
      li.filter(col("l_quantity") >= 45).count())
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") &&
      plan.contains("GreaterThanOrEqual(l_quantity"),
      s"ORC scan did not push the predicate:\n${plan.take(1500)}")
    assert("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>".r
      .findFirstIn(plan).isDefined,
      s"ORC scan did not prune columns:\n${plan.take(1500)}")
  }

  test("malformed JSON lines are quarantined, not fatal, and clean rows survive") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_bad").toString
    TextSources.writeJsonLines(docs.limit(10), s"$dir/docs")
    // splice garbage lines into the data directory
    val bad = java.nio.file.Paths.get(s"$dir/docs/zz_bad.json")
    java.nio.file.Files.writeString(bad,
      "{\"doc_id\": oops}\nnot json at all\n")
    assert(TextSources.readJsonLines(spark, s"$dir/docs", dataSchema)
      .count() === 10)
    val corrupt = TextSources.corruptJsonLines(spark, s"$dir/docs", dataSchema)
      .collect().map(_.getString(0)).sorted
    assert(corrupt.length === 2)
    assert(corrupt.contains("not json at all"))
  }

  test("schema evolution: mergeSchema unifies old and new parquet drops") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("evolve").toString
    // v1 drop: (doc_id, text); v2 drop adds a quality column
    Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
      .write.parquet(s"$dir/docs/batch=1")
    Seq((3L, "e f", 0.9), (4L, "g h", 0.4)).toDF("doc_id", "text", "quality")
      .write.parquet(s"$dir/docs/batch=2")
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$dir/docs")
    assert(merged.columns.toSet === Set("doc_id", "text", "quality", "batch"))
    assert(merged.count() === 4)
    // pre-evolution rows surface the new column as null — downstream
    // gates must coalesce, never assume presence
    assert(merged.filter(col("quality").isNull).count() === 2)
    assert(merged.filter(col("batch") === 1 && col("quality").isNotNull)
      .count() === 0)
  }

  test("downstream operators run unchanged on a JSONL-sourced frame") {
    val dir = java.nio.file.Files.createTempDirectory("jsonl_ops").toString
    TextSources.writeJsonLines(docs, s"$dir/docs")
    val back = TextSources.readJsonLines(spark, s"$dir/docs", dataSchema)
    val fromJson = graft.dedup.Dedup.exact(back, "doc_id", "text").count()
    val fromParquet = graft.dedup.Dedup.exact(docs, "doc_id", "text").count()
    assert(fromJson === fromParquet)
  }
}
