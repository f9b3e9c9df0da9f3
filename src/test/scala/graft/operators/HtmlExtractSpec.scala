package graft.operators

import org.apache.spark.sql.functions._

class HtmlExtractSpec extends graft.SparkTestBase {

  private def extract(html: String): String = {
    import spark.implicits._
    Seq(html).toDF("html")
      .select(TextOps.extractHtml(col("html"))).head().getString(0)
  }

  test("strips tags, script/style blocks and comments; collapses whitespace") {
    val html = """<html><head><title>T</title><style>p { color: red; }</style>
      |<script type="text/js">if (1 < 2) { alert("x"); }</script></head>
      |<body><h1>Hello</h1>  <p>world <b>again</b></p><!-- secret --></body></html>""".stripMargin
    assert(extract(html) === "T Hello world again")
  }

  test("decodes the predefined entities, ampersand last") {
    assert(extract("<p>a &lt;tag&gt; &quot;q&quot; &#39;s&#39; &amp; done</p>")
      === "a <tag> \"q\" 's' & done")
    // "&amp;lt;" means the literal text "&lt;", not "<"
    assert(extract("x &amp;lt; y") === "x &lt; y")
  }

  test("plain text passes through, modulo whitespace collapse") {
    assert(extract("no markup   here\n\nat all") === "no markup here at all")
  }
}
