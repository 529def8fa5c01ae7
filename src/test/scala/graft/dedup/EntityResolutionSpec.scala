package graft.dedup

import graft.SparkSpec

class EntityResolutionSpec extends SparkSpec {

  import spark.implicits._

  test("typo chains canonicalize transitively; singletons self-resolve") {
    // cluster 1: "kitten" ~ "sitten" ~ "sitted" — a chain where the
    // endpoints are distance 2 apart (only transitivity links them);
    // cluster 2: two identical names (distance 0); singleton: far away
    val df = Seq(
      1L -> "kitten", 2L -> "sitten", 3L -> "sitted",
      10L -> "widget", 11L -> "widget",
      99L -> "completely-unrelated").toDF("id", "s")
    val got = EntityResolution.resolve(df, "id", "s", maxDist = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("canonical ids form a valid assignment on real part names") {
    import org.apache.spark.sql.functions._
    val part = graft.Tables.part(spark, sf0001)
    val records = part.select((col("p_partkey") * 2).as("id"),
        col("p_name").as("s"))
      .unionByName(part.select((col("p_partkey") * 2 + 1).as("id"),
        concat(expr("substring(p_name, 1, 3 + cast(p_partkey % 7 as int))"),
          expr("substring(p_name, 5 + cast(p_partkey % 7 as int), 1000)"))
          .as("s")))
    val out = EntityResolution.resolve(records, "id", "s", 1)
    val rows = out.collect().map(r => r.getLong(0) -> r.getLong(1))
    // total: every record resolved exactly once
    assert(rows.length === records.count())
    val canon = rows.toMap
    // canonical is a fixpoint: the canonical record maps to itself
    canon.values.toSet.foreach { (c: Long) => assert(canon(c) === c) }
    // canonical ≤ id (min-id convention)
    rows.foreach { case (id, c) => assert(c <= id) }
    // duplication actually collapsed something
    assert(canon.values.toSet.size < rows.length)
  }
}
