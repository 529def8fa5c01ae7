package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RedactSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures = Seq(
    (1L, "mail me at alice.smith+news@sub.example.co.uk today"),
    (2L, "server 192.168.0.1 and 10.0.255.7 are up"),
    (3L, "both bob@x.io at 8.8.8.8 thanks"),
    (4L, "no pii here just words"),
    (5L, "version 1.2 costs 3.50 not an ip"),       // too few octets
    (6L, "a@b.c is not an email (single-letter tld)")
  ).toDF("id", "text")

  test("planted emails and IPs are fully scrubbed; clean text untouched") {
    val out = fixtures.select($"id",
      Redact.redactPii($"text").as("clean"),
      Redact.countEmails($"text").as("ne"),
      Redact.countIps($"text").as("ni"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(2), r.getInt(3))).toMap
    assert(out(1L)._1 === "mail me at <EMAIL> today")
    assert(out(1L)._2 === 1)
    assert(out(2L)._1 === "server <IP> and <IP> are up")
    assert(out(2L)._3 === 2)
    assert(out(3L)._1 === "both <EMAIL> at <IP> thanks")
    assert(out(4L)._1 === "no pii here just words")
    assert(out(5L)._1 === "version 1.2 costs 3.50 not an ip",
      "short dotted numbers must not match the IPv4 pattern")
    assert(out(6L)._2 === 0, "single-letter TLD must not match")
  }

  test("redaction is idempotent (placeholders never re-match)") {
    val once = fixtures.select($"id", Redact.redactPii($"text").as("t"))
    val twice = once.select($"id", Redact.redactPii($"t").as("t"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty)
  }

  test("no residual pii shape survives in the scrubbed corpus fixture") {
    // mirror the c7_pii_redact planting over real docs, then assert the
    // scrubbed text matches neither pattern anywhere
    val docs = graft.Tables.documents(spark, sf0001)
      .withColumn("__txt", concat(col("text"),
        lit(" contact user"), col("doc_id").cast("string"),
        lit("@example.com from 10.0."),
        pmod(col("doc_id"), lit(256)).cast("string"), lit(".7")))
    val residual = docs
      .select(Redact.redactPii(col("__txt")).as("clean"))
      .filter(Redact.countEmails(col("clean")) > 0 ||
              Redact.countIps(col("clean")) > 0)
    assert(residual.count() === 0)
  }
}
