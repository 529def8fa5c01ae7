package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltedSpec extends SparkSpec {

  import spark.implicits._

  // 90% of rows on one hot key, the rest spread out
  private lazy val skewed = spark.range(10000)
    .select(
      when(col("id") % 10 =!= 0, lit(7L)).otherwise(col("id")).as("key"),
      (col("id") * 3 % 100).cast("double").as("v"))

  test("saltedAgg equals plain aggregation") {
    val plain = skewed.groupBy("key")
      .agg(sum("v").as("sv"), count(lit(1)).as("n"), max("v").as("mx"))
    val salted = Salted.saltedAgg(skewed, Seq("key"), saltFactor = 16,
      partial = Seq(sum("v").as("sv"), count(lit(1)).as("n"), max("v").as("mx")),
      merge = Seq(sum("sv").as("sv"), sum("n").as("n"), max("mx").as("mx")))
    assert(salted.orderBy("key").collect().toSeq ===
      plain.orderBy("key").collect().toSeq)
    // the hot key really was spread: phase 1 produced multiple partials
    val phase1Groups = skewed
      .withColumn("__s", Salted.salt(16, Nil))
      .filter(col("key") === 7L).select("__s").distinct().count()
    assert(phase1Groups > 1)
  }

  test("byte-identical duplicate rows still spread across salts") {
    // the degenerate hot key: every row identical in every column — a
    // row-content-only hash would collapse all of them onto one salt
    val dups = spark.range(10000).select(lit(7L).as("key"), lit(1.0).as("v"))
    val spread = dups.withColumn("__s", Salted.salt(16, Nil))
      .select("__s").distinct().count()
    assert(spread > 1)
    val plain = dups.groupBy("key").agg(sum("v").as("sv"), count(lit(1)).as("n"))
    val salted = Salted.saltedAgg(dups, Seq("key"), 16,
      partial = Seq(sum("v").as("sv"), count(lit(1)).as("n")),
      merge = Seq(sum("sv").as("sv"), sum("n").as("n")))
    assert(salted.collect().toSeq === plain.collect().toSeq)
  }

  test("saltedJoin equals plain join") {
    val dim = Seq((7L, "hot"), (10L, "cold"), (999L, "nokey"))
      .toDF("key", "label")
    val plain = skewed.join(dim, Seq("key"))
      .select("key", "v", "label")
    val salted = Salted.saltedJoin(skewed, dim, Seq("key"), saltFactor = 8)
      .select("key", "v", "label")
    assert(salted.orderBy("key", "v").collect().toSeq ===
      plain.orderBy("key", "v").collect().toSeq)
    assert(salted.count() === plain.count())
  }

  test("keyed salt is deterministic across runs and spreads a hot " +
    "group keyed on a unique row id") {
    val withId = skewed.withColumn("rid", monotonically_increasing_id())
      .localCheckpoint() // pin rid so both evaluations see one value
    val s1 = withId.withColumn("__s", Salted.salt(16, Seq(col("rid"))))
      .select("rid", "__s").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val s2 = withId.withColumn("__s", Salted.salt(16, Seq(col("rid"))))
      .select("rid", "__s").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s1 === s2, "keyed salt must be a pure function of the key")
    val hotSpread = withId.filter(col("key") === 7L)
      .withColumn("__s", Salted.salt(16, Seq(col("rid"))))
      .select("__s").distinct().count()
    assert(hotSpread > 1, "unique key must spread the hot group")
    // and the keyed variants still equal the plain results
    val plain = skewed.groupBy("key").agg(sum("v").as("sv"))
    val salted = Salted.saltedAgg(skewed, Seq("key"), 16,
      partial = Seq(sum("v").as("sv")), merge = Seq(sum("sv").as("sv")),
      saltKey = Seq(col("key"), col("v")))
    assert(salted.orderBy("key").collect().toSeq ===
      plain.orderBy("key").collect().toSeq)
  }
}
