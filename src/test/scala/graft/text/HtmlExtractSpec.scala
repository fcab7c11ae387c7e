package graft.text

import graft.SparkSuite
import org.apache.spark.sql.functions._

class HtmlExtractSpec extends SparkSuite {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h").select(HtmlExtract.extractText(col("h"))).head().getString(0)

  test("tags removed, text kept, whitespace collapsed") {
    assert(extract("<html><body><h1>Title</h1>\n<p class=\"x\">a  b</p></body></html>")
      === "Title a b")
    assert(extract("line<br/>break") === "line break")
  }

  test("script/style/comment bodies are dropped, not leaked") {
    assert(extract("<p>keep</p><script type=\"text/javascript\">var x = 1 < 2; \n emit('<p>fake</p>')</script><p>also</p>")
      === "keep also")
    assert(extract("<style>body { color: red; }</style>text") === "text")
    assert(extract("a <!-- hidden\nmultiline --> b") === "a b")
    // lazy close: two scripts don't swallow the text between them
    assert(extract("<script>a()</script>mid<script>b()</script>") === "mid")
  }

  test("entities decode once, after tags; &amp; last prevents double-decode") {
    assert(extract("Tom &amp; Jerry &lt;3 &quot;hi&quot; &#39;now&#39;&nbsp;ok")
      === "Tom & Jerry <3 \"hi\" 'now' ok")
    // literal "&lt;" in the page (&amp;lt;) survives as text, not markup
    assert(extract("escape: &amp;lt;b&amp;gt;") === "escape: &lt;b&gt;")
  }
}
