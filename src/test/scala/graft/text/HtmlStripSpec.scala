package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlStripSpec extends SparkSpec {

  private def stripOne(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("h").select(HtmlStrip.strip(col("h")).as("c"))
      .collect()(0).getString(0)
  }

  test("script/style/comment bodies are removed wholesale, content kept") {
    val html = """<html><head><style>body { margin: 0 }</style></head>
      |<body><!-- nav here --><h1>Title</h1>
      |<p>Hello <b>world</b>.</p>
      |<script>var secret = "should not leak";</script>
      |</body></html>""".stripMargin
    // tags become ONE space (block-level tags need the separator;
    // the cost is a space before punctuation after inline closes —
    // the standard regex-tier tradeoff)
    assert(stripOne(html) === "Title Hello world .")
  }

  test("multi-line (dotall) blocks and attribute-bearing tags strip") {
    val html = "<script type=\"text/javascript\">\nline1();\nline2();\n" +
      "</script><p class=\"x\" id=\"y\">kept</p>"
    assert(stripOne(html) === "kept")
  }

  test("entities decode in the fixed order (&amp; last)") {
    assert(stripOne("a &lt;tag&gt; &quot;q&quot; &#39;s&#39; b&nbsp;c &amp; d")
      === "a <tag> \"q\" 's' b c & d")
    // &amp;lt; must decode to the LITERAL &lt;, not re-decode to <
    assert(stripOne("x &amp;lt; y") === "x &lt; y")
  }

  test("uppercase/mixed-case block tags strip wholesale (real crawls carry them)") {
    assert(stripOne("<SCRIPT>var secret = 1;</SCRIPT>Hello") === "Hello")
    assert(stripOne("<Style>body{}</Style><P>kept</P>") === "kept")
    assert(stripOne("<SCRIPT TYPE=\"text/javascript\">x();</script>ok") === "ok")
  }

  test("vertical tab collapses identically to the oracle's RE2 class") {
    // Java \s includes \x0B, RE2's does not — the explicit WsClass
    // makes both engines collapse it; pin the Spark side here
    assert(stripOne("a\u000Bb") === "a b")
  }

  test("whitespace collapses; plain text passes through trimmed") {
    assert(stripOne("  no   markup\there  ") === "no markup here")
    assert(stripOne("<div>\n  a\n  b\n</div>") === "a b")
  }

  test("pathological markup degrades, never throws") {
    // unclosed script: everything to EOF is treated as script body
    assert(stripOne("<p>seen</p><script>var x = 1;") === "seen var x = 1;")
    // stray angle brackets survive as text (not a tag match)
    assert(stripOne("1 < 2 and 3 > 2") === "1 < 2 and 3 > 2")
  }
}
