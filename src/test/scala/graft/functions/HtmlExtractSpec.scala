package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** HTML → visible-text extraction: tag/comment/script/style removal,
  * entity decode ORDER (tags before entities, `&amp;` last), whitespace
  * collapse, idempotence, and the link-density components. These pin
  * the exact semantics the q122 oracle mirrors in DuckDB — a drift here
  * is a cross-engine hash mismatch waiting to happen.
  */
class HtmlExtractSpec extends SparkSpec {

  import spark.implicits._

  private def strip(html: String): String =
    Seq(html).toDF("h")
      .select(TextFunctions.stripHtml(col("h")).as("v"))
      .collect().head.getString(0)

  test("tags, comments, script and style bodies are removed; text survives") {
    val html =
      """<html><head><style>p { color: red; a<b }</style>
        |<script>if (x<1 && y>2) { alert("hi"); }</script></head>
        |<body><h1 class="t">Title</h1><!-- secret <b>note</b> -->
        |<p>Hello <b>bold</b> world</p></body></html>""".stripMargin
    assert(strip(html) == "Title Hello bold world")
  }

  test("entities decode AFTER tag removal, ampersand last") {
    // a literal "&lt;b&gt;" must stay visible text, never become a tag;
    // "&amp;lt;" must decode to the literal "&lt;", not to "<"
    assert(strip("<p>&lt;b&gt;not a tag&lt;/b&gt;</p>") == "<b>not a tag</b>")
    assert(strip("a &amp;lt; b") == "a &lt; b")
    assert(strip("x&nbsp;y &quot;q&quot; &#39;s&#39; &amp; z") ==
      "x y \"q\" 's' & z")
  }

  test("whitespace runs collapse to single spaces, ends trimmed") {
    assert(strip("  <p>a</p>\n\n<p>b</p>\t c  ") == "a b c")
    assert(strip("<div><br/><hr></div>") == "")
  }

  test("idempotent: stripping already-plain text is identity (mod collapse)") {
    val plain = "plain text with numbers 123 and punctuation."
    assert(strip(plain) == plain)
    assert(strip(strip("<p>twice <i>over</i></p>")) == "twice over")
  }

  test("unclosed script body is left as tag-stripped text, not swallowed") {
    // lazy block patterns need a closing tag; without one, only the
    // individual tags are stripped — documents the boundary explicitly
    assert(strip("<script>var x = 1;") == "var x = 1;")
  }

  test("anchorChars / anchorCount / linkDensity measure the link mass") {
    val html = "<p>intro text here</p><a href=\"/a\">one</a> " +
      "<a class=\"x\">two2</a><a>three</a>"
    val r = Seq(html).toDF("h").select(
      TextFunctions.anchorChars(col("h")).as("c"),
      TextFunctions.anchorCount(col("h")).as("n"),
      TextFunctions.linkDensity(col("h")).as("d")).collect().head
    assert(r.getLong(0) == 3 + 4 + 5, "raw inner chars of the three anchors")
    assert(r.getLong(1) == 3L)
    val visible = strip(html).length
    assert(math.abs(r.getDouble(2) - 12.0 / visible) < 1e-12)
  }

  test("linkDensity degenerate cases: no anchors → 0, empty visible → 0") {
    val r = Seq(("<p>no links</p>", 1), ("<!-- only --><style>a{}</style>", 2))
      .toDF("h", "id")
      .select(col("id"), TextFunctions.linkDensity(col("h")).as("d"))
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(r(1) == 0.0)
    assert(r(2) == 0.0)
  }

  test("nav-page vs article separation (the boilerplate use of the signal)") {
    val nav = (1 to 20).map(i => s"""<a href="/$i">section $i</a>""").mkString(" ")
    val article = "<p>" + (1 to 60).map(i => s"sentence $i of prose").mkString(" ") +
      "</p><a href=\"/home\">home</a>"
    val d = Seq((1, nav), (2, article)).toDF("id", "h")
      .select(col("id"), TextFunctions.linkDensity(col("h")).as("d"))
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(d(1) > 0.9, s"nav page must read link-dominated, got ${d(1)}")
    assert(d(2) < 0.05, s"article must read prose-dominated, got ${d(2)}")
  }
}
