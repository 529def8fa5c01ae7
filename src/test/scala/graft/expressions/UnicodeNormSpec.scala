package graft.expressions

import graft.SparkSpec
import graft.text.TextFunctions
import org.apache.spark.sql.functions._

class UnicodeNormSpec extends SparkSpec {

  import spark.implicits._

  test("NFC: precomposed and decomposed arrivals normalize to equal bytes") {
    val df = Seq(
      ("pre", "café"), // é precomposed
      ("dec", "café"), // e + combining acute
      ("ascii", "cafe")).toDF("k", "s")
      .select(col("k"), TextFunctions.unicodeNorm(col("s"),
        stripAccents = false).as("n"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(df("pre") === df("dec"), "NFC must unify the two forms")
    assert(df("pre") === "café")
    assert(df("ascii") === "cafe")
  }

  test("accent folding drops diacritics, leaves non-decomposables") {
    val out = Seq("café", "café", "Åland", "straße",
        "Łódź", "plain")
      .toDF("s")
      .select(TextFunctions.unicodeNorm(col("s"), stripAccents = true))
      .collect().map(_.getString(0)).toSeq
    assert(out(0) === "cafe" && out(1) === "cafe")
    assert(out(2) === "Aland")
    assert(out(3) === "straße", "no decomposition for sharp s")
    assert(out(4) === "Łodz", "Ł has no decomposition; ó/ź fold")
    assert(out(5) === "plain")
  }

  test("null safety, SQL registration, and dedup-key use") {
    val withNull = Seq(Some("café"), None).toDF("s")
      .select(TextFunctions.unicodeNorm(col("s"), stripAccents = false))
      .collect()
    assert(!withNull(0).isNullAt(0) && withNull(1).isNullAt(0))
    // SQL-side registration
    val viaSql = spark.sql(
      "SELECT graft_unicode_norm('café', false) AS n").head().getString(0)
    assert(viaSql === "café")
    // the dedup-key claim: distinct byte forms, one group after norm
    val groups = Seq((1L, "café menu"), (2L, "café menu"))
      .toDF("id", "s")
      .groupBy(TextFunctions.unicodeNorm(col("s"), stripAccents = false))
      .count().collect()
    assert(groups.length === 1 && groups(0).getLong(1) === 2L)
  }
}
