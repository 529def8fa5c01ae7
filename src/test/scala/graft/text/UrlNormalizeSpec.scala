package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlNormalizeSpec extends SparkSpec {

  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlNormalize.canonical(col("u"))).collect()
      .map(_.getString(0)).toSeq

  test("scheme/host lowercase, default ports and www stripped, path case kept") {
    assert(canon("HTTP://WWW.Example.COM:80/Docs/A") ===
      Seq("http://example.com/Docs/A"))
    assert(canon("HTTPS://www.Example.com:443/x") ===
      Seq("https://example.com/x"))
    // non-default ports survive; www on https also stripped
    assert(canon("http://example.com:8080/x") ===
      Seq("http://example.com:8080/x"))
  }

  test("fragment and tracking params dropped, remaining params sorted") {
    assert(canon("http://e.com/p?b=2&utm_source=x&a=1#frag") ===
      Seq("http://e.com/p?a=1&b=2"))
    assert(canon("http://e.com/p?gclid=g&fbclid=f&utm_campaign=c") ===
      Seq("http://e.com/p"))
    // a non-tracking param that merely CONTAINS a tracking name stays
    assert(canon("http://e.com/p?xutm_source=1&myfbclid=2") ===
      Seq("http://e.com/p?myfbclid=2&xutm_source=1"))
  }

  test("trailing slashes stripped, empty path becomes /") {
    assert(canon("http://e.com/a/b/") === Seq("http://e.com/a/b"))
    assert(canon("http://e.com///") === Seq("http://e.com/"))
    assert(canon("http://e.com") === Seq("http://e.com/"))
    assert(canon("http://e.com?a=1") === Seq("http://e.com/?a=1"))
  }

  test("equivalent raw forms collide; distinct pages do not") {
    val a = canon(
      "HTTP://WWW.Site.COM:80/Page/1/?b=2&a=1&utm_source=n#top",
      "http://site.com/Page/1?a=1&b=2&gclid=x")
    assert(a.head === a.last)
    assert(canon("http://site.com/Page/1").head !==
      canon("http://site.com/Page/2").head)
    // path case is significant — these must NOT collide
    assert(canon("http://site.com/page").head !==
      canon("http://site.com/Page").head)
  }

  test("userinfo keeps its case and never collides distinct credentials") {
    assert(canon("http://Alice@E.com/x") === Seq("http://Alice@e.com/x"))
    // RFC 3986: userinfo is case-sensitive like the path
    assert(canon("http://Alice@e.com/x").head !==
      canon("http://alice@e.com/x").head)
    // port/www stripping applies to the HOST, not the userinfo
    assert(canon("http://U:p@WWW.E.com:80/x") === Seq("http://U:p@e.com/x"))
  }

  test("trailing newline disables end-anchored steps, identically, not divergently") {
    // \z (absolute end) never matches before a stray final newline, so
    // the port/slash strips are skipped — same outcome in DuckDB,
    // where $ would NOT have matched but Java's $ WOULD have
    assert(canon("http://e.com/a/\n") === Seq("http://e.com/a/\n"))
    assert(canon("http://e.com:80/x\n") === Seq("http://e.com/x\n"))
  }

  test("non-URL input passes through trimmed; null propagates") {
    assert(canon("  not a url  ") === Seq("not a url"))
    val n = Seq(Option.empty[String]).toDF("u")
      .select(UrlNormalize.canonical(col("u"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("DuckDB twin SQL emits the same regex subset (smoke: no interpolation leftovers)") {
    val sql = UrlNormalize.sqlCanonical("url")
    assert(sql.contains("regexp_extract"))
    assert(!sql.contains("$s"), "unrendered scala interpolation")
    assert(sql.contains(UrlNormalize.TrackingParamRegex))
  }
}
