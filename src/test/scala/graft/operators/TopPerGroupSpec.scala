package graft.operators

import graft.SparkSpec
import graft.functions.Noise
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class TopPerGroupSpec extends SparkSpec {

  test("salted two-level top-N equals the naive single window exactly") {
    // skewed groups: group g0 holds ~70% of rows (the hot domain the
    // salting exists for), plus score ties to exercise the tie-break
    val df = spark.range(0, 5000).toDF("id")
      .withColumn("grp", when(pmod(col("id"), lit(10)) < 7, lit("g0"))
        .otherwise(concat(lit("g"), pmod(col("id"), lit(10)))))
      .withColumn("score", round(Noise.hashNoise(col("id"), 11) * 10, 1))
      .localCheckpoint()
    val naive = df.withColumn("rank", row_number().over(
        Window.partitionBy(col("grp"))
          .orderBy(col("score").desc, col("id").asc)).cast("bigint"))
      .filter(col("rank") <= 25)
    val salted = TopPerGroup.topN(df, "grp", "score", "id", n = 25)
    assert(naive.exceptAll(salted).isEmpty && salted.exceptAll(naive).isEmpty,
      "salted top-N diverged from the naive window")
    // and with salts = 1 it degenerates to the naive computation
    val one = TopPerGroup.topN(df, "grp", "score", "id", n = 25, salts = 1)
    assert(naive.exceptAll(one).isEmpty && one.exceptAll(naive).isEmpty)
  }

  test("idCol uniqueness precondition holds for the shipped c7_domain_cap key") {
    // topN's exactness proof requires idCol unique per group (total
    // order). The operator does not pay a runtime distinct-count for
    // it, so pin it here for the one shipped call site: c7_domain_cap
    // caps documents per domain keyed on doc_id.
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
    val dupIds = docs.groupBy(col("doc_id")).count()
      .filter(col("count") > 1).count()
    assert(dupIds === 0, s"doc_id not unique: $dupIds duplicated ids")
  }

  test("groups smaller than N keep all rows, ranked") {
    import spark.implicits._
    val df = Seq(("a", 1L, 0.9), ("a", 2L, 0.5), ("b", 3L, 0.1))
      .toDF("grp", "id", "score")
    val got = TopPerGroup.topN(df, "grp", "score", "id", n = 10)
      .orderBy("grp", "rank")
      .select("grp", "id", "rank").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got === Seq(("a", 1L, 1L), ("a", 2L, 2L), ("b", 3L, 1L)))
  }
}
