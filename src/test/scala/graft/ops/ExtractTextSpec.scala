package graft.ops

import graft.sql.SparkTestBase
import org.apache.spark.sql.functions._

/** html→text extraction rules (tag strip, script/style removal, entity
  * unescape order) on crafted documents — the byte-identity invariant's
  * operator, beyond the synthetic corpus's trivial wrapper. */
class ExtractTextSpec extends SparkTestBase {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(Tuple1(html.getBytes("UTF-8"))).toDF("html")
      .select(ExtractText.extract(col("html")).as("t"))
      .as[String].collect()(0)

  test("tags stripped, attributes ignored, text preserved byte-for-byte") {
    assert(extract("<html><body class=\"x\"><p>Hello <b>world</b>!</p></body></html>")
      === "Hello world!")
    assert(extract("<div>line1\nline2  spaced</div>") === "line1\nline2  spaced")
  }

  test("script and style elements removed wholesale, including content") {
    assert(extract("<html><script>var x = '<p>not text</p>';</script>keep</html>")
      === "keep")
    assert(extract("<style>p { color: red; }</style>text<script\nsrc=\"a.js\">x</script>!")
      === "text!")
  }

  test("entity unescape: &amp; last so escaped escapes survive") {
    assert(extract("a &lt;b&gt; &quot;c&quot; &#39;d&#39; e &amp; f")
      === "a <b> \"c\" 'd' e & f")
    assert(extract("&amp;lt;") === "&lt;") // NOT '<'
  }

  test("multibyte text survives the decode→strip chain") {
    assert(extract("<p>naïve café — 東京</p>") === "naïve café — 東京")
  }
}
