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
  *   - scheme and host lowercased; path case AND userinfo case
  *     PRESERVED (both case-sensitive by RFC 3986);
  *   - default ports stripped (`:80` for http, `:443` for https);
  *   - a leading `www.` dropped (from the host, never the userinfo);
  *   - the fragment dropped;
  *   - tracking params (`utm_*`, `gclid`, `fbclid`) dropped, the
  *     remaining query params SORTED (binary order — identical in
  *     Spark and DuckDB for the ASCII param space);
  *   - trailing path slashes stripped, empty path normalized to `/`.
  *
  * Built as a pure expression chain (regexp over the Java/RE2-common
  * subset — no lookaround, no backrefs — plus split/filter/array_sort/
  * array_join): codegen'd, no UDF, scales with the scan, and every
  * step has an exact DuckDB twin. End-of-string anchors are `\z`
  * (absolute end — identical in Java and RE2), never `$`: Java's `$`
  * also matches BEFORE a final newline, so a CR/LF-terminated URL
  * would canonicalize differently in the two engines. With `\z` a
  * stray trailing newline instead disables the affected step (port /
  * trailing-slash strip) identically in both — conservative, never
  * divergent. An input without a `scheme://` is returned
  * trimmed-but-unchanged (not a parseable absolute URL — the caller's
  * quarantine problem, not silent mangling); NULL propagates.
  */
object UrlNormalize {

  /** Params dropped before sorting (anchored find, RE2-safe; `\z` not
    * `$` — see the class doc). */
  val TrackingParamRegex = "^(utm_[^=]*|gclid|fbclid)(=|\\z)"

  def canonical(url: Column): Column = {
    val u = trim(url)
    // greedy [\s\S]* runs to the TRUE end of string in both engines
    // (any char is in \s or \S under either engine's \s definition),
    // so no end anchor is needed and embedded newlines can't diverge
    val noFrag = regexp_replace(u, "#[\\s\\S]*", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val rest = regexp_replace(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://", "")
    // authority = [userinfo@]hostport; userinfo is case-sensitive by
    // RFC 3986 (like the path) — split on the LAST '@' and only the
    // host part is lowercased / port-stripped / www-stripped
    val auth = regexp_extract(rest, "^([^/?]*)", 1)
    val userinfo = regexp_extract(auth, "^([\\s\\S]*@)", 1)
    val hostport = lower(regexp_replace(auth, "^[\\s\\S]*@", ""))
    val noPort = when(scheme === "http", regexp_replace(hostport, ":80\\z", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443\\z", ""))
      .otherwise(hostport)
    val host = regexp_replace(noPort, "^www\\.", "")
    val pathq = regexp_replace(rest, "^[^/?]*", "")
    val rawPath = regexp_extract(pathq, "^([^?]*)", 1)
    val trimmed = regexp_replace(rawPath, "/+\\z", "")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    val query = regexp_extract(pathq, "[?]([\\s\\S]*)", 1)
    val params = array_sort(filter(split(query, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRegex)))
    val qstr = when(size(params) > 0,
      concat(lit("?"), array_join(params, "&"))).otherwise(lit(""))
    when(scheme === "", u)
      .otherwise(concat(scheme, lit("://"), userinfo, host, path, qstr))
  }

  /** DuckDB twin of [[canonical]] over `urlExpr` — same regex subset,
    * same branch order, term-for-term. */
  def sqlCanonical(urlExpr: String): String = {
    val u = s"trim($urlExpr)"
    val noFrag = s"regexp_replace($u, '#[\\s\\S]*', '')"
    val scheme = s"lower(regexp_extract($noFrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val rest = s"regexp_replace($noFrag, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    val auth = s"regexp_extract($rest, '^([^/?]*)', 1)"
    val userinfo = s"regexp_extract($auth, '^([\\s\\S]*@)', 1)"
    val hostport = s"lower(regexp_replace($auth, '^[\\s\\S]*@', ''))"
    val noPort = s"""(CASE WHEN $scheme = 'http'
         THEN regexp_replace($hostport, ':80\\z', '')
         WHEN $scheme = 'https'
         THEN regexp_replace($hostport, ':443\\z', '')
         ELSE $hostport END)"""
    val host = s"regexp_replace($noPort, '^www\\.', '')"
    val pathq = s"regexp_replace($rest, '^[^/?]*', '')"
    val rawPath = s"regexp_extract($pathq, '^([^?]*)', 1)"
    val trimmed = s"regexp_replace($rawPath, '/+\\z', '')"
    val path = s"(CASE WHEN $trimmed = '' THEN '/' ELSE $trimmed END)"
    val query = s"regexp_extract($pathq, '[?]([\\s\\S]*)', 1)"
    val params = s"""list_sort(list_filter(string_split($query, '&'),
         p -> p <> '' AND NOT regexp_matches(p, '$TrackingParamRegex')))"""
    val qstr = s"""(CASE WHEN len($params) > 0
         THEN '?' || array_to_string($params, '&') ELSE '' END)"""
    s"""(CASE WHEN $scheme = '' THEN $u
         ELSE $scheme || '://' || $userinfo || $host || $path || $qstr END)"""
  }
}
