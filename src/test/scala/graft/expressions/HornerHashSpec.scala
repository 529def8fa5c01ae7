package graft.expressions

import graft.{SparkSpec, Tables}
import graft.text.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class HornerHashSpec extends SparkSpec {

  /** The built-in composition the native expression replaced. */
  private def composed(s: Column): Column =
    aggregate(filter(split(s, ""), c => length(c) > 0),
      lit(0L), (acc, c) => (acc * lit(31L) + ascii(c).cast("long")) % lit(1000000007L))

  private def native(s: Column): Column =
    graft.dedup.MinHashDedup.portableShingleHash(s)

  test("native hash matches the composition over all corpus shingles") {
    val docs = Tables.documents(spark, sf0001)
    val bad = docs
      .select(explode(TextFunctions.shingles(col("text"), 2)).as("sh"))
      .select(native(col("sh")).as("n"), composed(col("sh")).as("c"))
      .filter(not(col("n") <=> col("c")))
    assert(bad.count() === 0)
  }

  test("edge cases: empty, unicode, single char, null") {
    import spark.implicits._
    val df = Seq(Some(""), Some("a"), Some("straße"), Some("ÄÖÜ é"),
        Some("hello world"), None).toDF("s")
    val rows = df.select(native(col("s")).as("n"), composed(col("s")).as("c"))
      .collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(r.isNullAt(0) === r.isNullAt(1), s"null parity row $i")
      if (!r.isNullAt(0)) assert(r.getLong(0) === r.getLong(1), s"row $i")
    }
    assert(rows(0).getLong(0) === 0L, "empty string hashes to 0")
  }

  test("matches DuckDB's list_reduce arithmetic for a known value") {
    // 'ab' = (0*31+97)%p = 97; (97*31+98)%p = 3105 — the value the
    // oracle SQL's list_reduce produces (verified against DuckDB)
    import spark.implicits._
    val h = Seq("ab").toDF("s").select(native(col("s"))).head().getLong(0)
    assert(h === 3105L)
  }

  test("graft_horner_hash is SQL-callable via GraftExtensions") {
    val r = spark.sql("SELECT graft_horner_hash('ab') AS h").head().getLong(0)
    assert(r === 3105L)
  }
}
