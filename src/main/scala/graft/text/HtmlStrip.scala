package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML boilerplate stripping — the first pass over any web-crawl
  * corpus (RefinedWeb/Gopher run a DOM extractor; this is the regex
  * tier that handles the 95% case without an HTML parser dependency):
  * drop script/style/comment blocks wholesale, strip remaining tags,
  * decode the high-frequency entities, collapse whitespace.
  *
  * Pure `regexp_replace` projections — narrow, codegen'd, scales with
  * the scan; no shuffle, no UDF. Like [[Redact]], the patterns stick
  * to the regex subset with identical semantics in Java's engine
  * (Spark) and RE2 (DuckDB): `(?s)` dotall via inline flag on the
  * Spark side and the `s` flag argument on the DuckDB side, lazy
  * repetition, character classes — so the exact cleaned text sits
  * under the DuckDB oracle. Order is fixed and matters: block
  * elements (script/style/comment) BEFORE the generic tag strip — a
  * generic strip first would leave script BODIES behind as "text".
  *
  * Not a parser: pathological markup (unclosed script tags, CDATA
  * tricks) degrades to over- or under-stripping, never to an error —
  * the quality gates downstream catch the residue (a page that is
  * still mostly markup scores low).
  */
object HtmlStrip {

  /** (pattern, replacement) chain, applied in order. The generic tag
    * pattern requires a name start (`[/!]?[A-Za-z]`) so stray angle
    * brackets in prose ("1 < 2 and 3 > 2") survive as text — `<[^>]+>`
    * would eat them. Block patterns are case-INSENSITIVE (`(?is)`):
    * real crawls carry `<SCRIPT>`/`<Style>` tags, and a case-sensitive
    * miss would leak the block BODY into the cleaned text (the generic
    * strip removes only the tags). */
  val Chain: Seq[(String, String)] = Seq(
    "(?is)<script[^>]*>.*?</script>" -> " ",
    "(?is)<style[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "<[/!]?[A-Za-z][^>]*>" -> " ")

  /** Explicit whitespace class instead of `\s`: Java's `\s` includes
    * vertical tab, RE2's does not — the one place the two engines'
    * regex semantics differ in this operator's subset. */
  private[text] val WsClass = "[ \\t\\n\\r\\f\\x0B]+"

  /** Entity subset worth decoding (the rest are rare enough to leave
    * to downstream normalization). &amp; LAST — decoding it first
    * would re-create other entities (&amp;lt; → &lt; → <). */
  val Entities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&amp;" -> "&")

  /** Cleaned text: tags stripped, entities decoded, whitespace
    * collapsed and trimmed. */
  def strip(html: Column): Column = {
    val noMarkup = Chain.foldLeft(html) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }
    val decoded = Entities.foldLeft(noMarkup) { case (c, (from, to)) =>
      // literal replacement, not regex — entity names are regex-safe
      // but the REPLACEMENT side of regexp_replace treats $ specially,
      // so use the plain string replace
      replace(c, lit(from), lit(to))
    }
    trim(regexp_replace(decoded, WsClass, " "))
  }

  // ---- DuckDB twin (RE2: 'gs' flags = global + dotall) ---------------

  private def q(s: String): String = "'" + s.replace("'", "''") + "'"

  def sqlStrip(textExpr: String): String = {
    val noMarkup = Chain.foldLeft(textExpr) { case (e, (pat, repl)) =>
      // strip the Java inline flag group: RE2 takes dotall/case as
      // regexp_replace flag arguments ('s' / 'i') instead
      val p = pat.replace("(?is)", "").replace("(?s)", "")
      val flags =
        if (pat.startsWith("(?is)")) "'gis'"
        else if (pat.startsWith("(?s)")) "'gs'"
        else "'g'"
      s"regexp_replace($e, ${q(p)}, ${q(repl)}, $flags)"
    }
    val decoded = Entities.foldLeft(noMarkup) { case (e, (from, to)) =>
      s"replace($e, ${q(from)}, ${q(to)})"
    }
    s"trim(regexp_replace($decoded, '$WsClass', ' ', 'g'))"
  }
}
