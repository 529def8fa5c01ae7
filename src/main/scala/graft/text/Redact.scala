package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII redaction — the corpus-hygiene pass every training pipeline runs
  * before text leaves the ingest zone: replace e-mail addresses and
  * IPv4 literals with typed placeholder tokens, and count what was
  * removed (the redaction-rate metric compliance dashboards track).
  *
  * Pure `regexp_replace` projections — narrow, codegen'd, scales with
  * the scan; no shuffle, no UDF. The patterns deliberately stick to the
  * regex subset with identical semantics in Java's engine (Spark) and
  * RE2 (DuckDB) — character classes, bounded repetition, `\b` — so the
  * exact redacted text sits under the DuckDB oracle. Order matters and
  * is fixed: e-mails first (an e-mail can contain digit runs an IP
  * pattern would mangle), then IPs.
  */
object Redact {

  /** Matches the user@host.tld shape (ASCII pragmatic form, not full
    * RFC 5322 — the standard corpus-scrubbing tradeoff). */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (no octet-range check — scrubbing favors recall). */
  val Ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  val EmailToken = "<EMAIL>"
  val IpToken = "<IP>"

  def countEmails(text: Column): Column = regexp_count(text, lit(EmailPattern))
  def countIps(text: Column): Column = regexp_count(text, lit(Ipv4Pattern))

  /** Both patterns replaced, e-mails first. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, EmailToken),
      Ipv4Pattern, IpToken)

  // ---- DuckDB twins (RE2: same pattern text, 'g' flag for global) ----

  private def sqlQuote(pattern: String): String =
    "'" + pattern.replace("'", "''") + "'"

  def sqlCount(textExpr: String, pattern: String): String =
    s"CAST(len(regexp_extract_all($textExpr, ${sqlQuote(pattern)})) AS BIGINT)"

  def sqlRedact(textExpr: String): String =
    s"""regexp_replace(regexp_replace($textExpr,
       |  ${sqlQuote(EmailPattern)}, '$EmailToken', 'g'),
       |  ${sqlQuote(Ipv4Pattern)}, '$IpToken', 'g')""".stripMargin
}
