package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-side dedup key. Two fetches of the
  * same page rarely carry byte-identical URLs (case-shifted hosts,
  * default ports, tracking params, fragments, trailing slashes), so
  * content-level dedup alone over-counts "distinct" pages and a
  * frontier keyed on raw URLs re-crawls what it already has. The
  * canonical form:
  *
  *   - scheme and host lowercased; path case PRESERVED (case-sensitive
  *     by spec);
  *   - default ports stripped (`:80` for http, `:443` for https);
  *   - a leading `www.` dropped;
  *   - the fragment dropped;
  *   - tracking params (`utm_*`, `gclid`, `fbclid`) dropped, the
  *     remaining query params SORTED (binary order — identical in
  *     Spark and DuckDB for the ASCII param space);
  *   - trailing path slashes stripped, empty path normalized to `/`.
  *
  * Built as a pure expression chain (regexp over the Java/RE2-common
  * subset — no lookaround, no backrefs — plus split/filter/array_sort/
  * array_join): codegen'd, no UDF, scales with the scan, and every
  * step has an exact DuckDB twin. An input without a `scheme://` is
  * returned trimmed-but-unchanged (not a parseable absolute URL — the
  * caller's quarantine problem, not silent mangling); NULL propagates.
  */
object UrlNormalize {

  /** Params dropped before sorting (anchored find, RE2-safe). */
  val TrackingParamRegex = "^(utm_[^=]*|gclid|fbclid)(=|$)"

  def canonical(url: Column): Column = {
    val u = trim(url)
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    val hostport = lower(regexp_extract(rest, "^([^/?]*)", 1))
    val noPort = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val host = regexp_replace(noPort, "^www\\.", "")
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val rawPath = regexp_extract(pathq, "^([^?]*)", 1)
    val trimmed = regexp_replace(rawPath, "/+$", "")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    val query = regexp_extract(pathq, "[?](.*)$", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRegex)))
    val qstr = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), host, path, qstr))
  }

  /** DuckDB twin of [[canonical]] over `urlExpr` — same regex subset,
    * same branch order, term-for-term. */
  def sqlCanonical(urlExpr: String): String = {
    val u = s"trim($urlExpr)"
    val noFrag = s"regexp_replace($u, '#.*$$', '')"
    val scheme = s"lower(regexp_extract($noFrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val rest = s"regexp_replace($noFrag, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    val hostport = s"lower(regexp_extract($rest, '^([^/?]*)', 1))"
    val noPort = s"""(CASE WHEN $scheme = 'http'
         THEN regexp_replace($hostport, ':80$$', '')
         WHEN $scheme = 'https'
         THEN regexp_replace($hostport, ':443$$', '')
         ELSE $hostport END)"""
    val host = s"regexp_replace($noPort, '^www\\.', '')"
    val pathq = s"regexp_replace($rest, '^[^/?]*', '')"
    val rawPath = s"regexp_extract($pathq, '^([^?]*)', 1)"
    val trimmed = s"regexp_replace($rawPath, '/+$$', '')"
    val path = s"(CASE WHEN $trimmed = '' THEN '/' ELSE $trimmed END)"
    val query = s"regexp_extract($pathq, '[?](.*)$$', 1)"
    val params = s"""list_sort(list_filter(string_split($query, '&'),
         p -> p <> '' AND NOT regexp_matches(p, '$TrackingParamRegex')))"""
    val qstr = s"""(CASE WHEN len($params) > 0
         THEN '?' || array_to_string($params, '&') ELSE '' END)"""
    s"""(CASE WHEN $scheme = '' THEN $u
         ELSE $scheme || '://' || $host || $path || $qstr END)"""
  }
}
