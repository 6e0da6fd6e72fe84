package graft

import graft.operators.Extract
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtractSpec extends AnyFunSuite {
  lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def page(body: String, title: String = "t"): String =
    s"<html><head><title>$title</title></head><body>$body</body></html>"

  private def segs(html: String): Seq[Row] =
    Extract.segments(Seq((1L, html)).toDF("id", "html"), "html")
      .orderBy("block_idx").collect().toSeq

  private def texts(html: String): Seq[String] =
    segs(html).map(_.getAs[String]("text"))

  test("block segmentation at flow-element boundaries, 1-based in order") {
    val rows = segs(page("<p>alpha beta</p><div>gamma</div><h2>delta</h2>"))
    assert(rows.map(r => (r.getAs[Int]("block_idx"), r.getAs[String]("tag"),
      r.getAs[String]("text"))) ==
      Seq((1, "p", "alpha beta"), (2, "div", "gamma"), (3, "h2", "delta")))
  }

  test("script, style, and comment subtrees vanish — including fake tags inside them") {
    val html = page(
      """<p>real</p><script>if (1 < 2) document.write("<p>fake</p>");</script>""" +
        "<style>p { color: red }</style><!-- <div>ghost</div> --><p>also real</p>")
    assert(texts(html) == Seq("real", "also real"))
  }

  test("nested inline tags strip to text; container elements emit no empty block") {
    val html = page("<ul><li>one <b>bold</b> word</li><li>two <i>ital</i> words</li></ul>")
    val rows = segs(html)
    // <ul> itself is textless → skipped; numbering counts emitted blocks
    assert(rows.map(r => (r.getAs[Int]("block_idx"), r.getAs[String]("tag"))) ==
      Seq((1, "li"), (2, "li")))
    assert(texts(html) == Seq("one bold word", "two ital words"))
  }

  test("entities decode once — double-escaped sequences stay escaped") {
    val html = page("<p>a &amp; b &lt;tag&gt; &quot;q&quot; &copy; &amp;lt;still</p>")
    assert(texts(html) == Seq("a & b <tag> \"q\" © &lt;still"))
  }

  test("whitespace-mangled markup normalizes: newlines, runs, attribute-laden tags") {
    val html = page(
      "\n  <p class=\"x\"\n   data-y=\"1\">  spread\n\tacross   lines </p>\n  ")
    assert(texts(html) == Seq("spread across lines"))
  }

  test("link density: anchor text over block text, nav-like blocks classified boilerplate") {
    val rows = segs(page(
      """<nav><a href="/">Home</a> <a href="/a">About</a></nav>""" +
        "<p>ten little words walk into a bar and sit down</p>"))
    val nav = rows.head
    assert(nav.getAs[String]("tag") == "nav")
    assert(nav.getAs[Double]("link_density") > 0.8)
    assert(nav.getAs[String]("decision") == "boilerplate")
    assert(rows(1).getAs[String]("decision") == "good")
  }

  test("length gate: under-5-word blocks are short; stopword gate splits good/neargood") {
    val rows = segs(page(
      "<h1>tiny heading here</h1>" +
        "<p>the cat sat on the mat and it was fine</p>" +
        "<p>alpha beta gamma delta epsilon zeta eta theta</p>"))
    assert(rows.map(_.getAs[String]("decision")) == Seq("short", "good", "neargood"))
  }

  test("pathological markup: unclosed tags, stray <, empty page, no body") {
    // unclosed <p>: block runs to the next boundary
    assert(texts(page("<p>first never closed<p>second")) == Seq("first never closed", "second"))
    // no body element → no blocks; empty string → no blocks
    assert(segs("<p>headless</p>").isEmpty)
    assert(segs("").isEmpty)
  }

  test("title extraction reads the head, entity-decoded") {
    val df = Seq((1L, page("<p>x</p>", title = "Tom &amp; Jerry"))).toDF("id", "html")
    assert(df.select(Extract.title(col("html"))).as[String].head() == "Tom & Jerry")
  }

  test("extractText keeps good+neargood in document order, drops chrome, counts blocks") {
    val html = page(
      """<nav><a href="/">Home</a> <a href="/b">Blog</a></nav>""" +
        "<p>the first paragraph is long enough and it has stopwords</p>" +
        "<p>alpha beta gamma delta epsilon zeta</p>" +
        "<h2>bye</h2>" +
        """<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>""",
      title = "Page One")
    val out = Extract.extractText(Seq((7L, html)).toDF("id", "html"), "html", "id")
      .collect().head
    assert(out.getAs[String]("title") == "Page One")
    assert(out.getAs[String]("clean_text") ==
      "the first paragraph is long enough and it has stopwords\nalpha beta gamma delta epsilon zeta")
    assert(out.getAs[Long]("n_blocks_kept") == 2L)
  }

  test("context-sensitive pass: short/neargood reclassify by certain neighbors") {
    val html = page(
      """<nav><a href="/">Home</a> <a href="/a">About</a></nav>""" + // boilerplate
        "<h2>early heading</h2>" + // short, between bad and good → boilerplate
        "<p>the cat sat on the mat and it was fine today</p>" + // good
        "<h2>middle heading</h2>" + // short, between good and good → good
        "<p>the dog sat on the rug and it was also fine</p>" + // good
        "<p>alpha beta gamma delta epsilon zeta</p>" + // neargood, next to good → good
        """<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>""")
    val out = Extract.refine(
        Extract.segments(Seq((1L, html)).toDF("id", "html"), "html"), "id")
      .orderBy("block_idx")
      .select("decision", "final_decision").as[(String, String)].collect().toSeq
    assert(out == Seq(
      ("boilerplate", "boilerplate"),
      ("short", "boilerplate"), // bad neighbor on one side
      ("good", "good"),
      ("short", "good"), // good on both sides
      ("good", "good"),
      ("neargood", "good"), // one good neighbor suffices
      ("boilerplate", "boilerplate")))
    // edges count as boilerplate: an isolated neargood page keeps nothing
    val lonely = Extract.refine(
        Extract.segments(Seq((2L, page("<p>alpha beta gamma delta epsilon</p>")))
          .toDF("id", "html"), "html"), "id")
      .select("final_decision").as[String].collect().toSeq
    assert(lonely == Seq("boilerplate"))
    // refined extractText keeps exactly the final-good blocks
    val t = Extract.extractText(Seq((3L, html)).toDF("id", "html"), "html", "id",
      refined = true).collect().head
    assert(t.getAs[Long]("n_blocks_kept") == 4L)
    assert(t.getAs[String]("clean_text").startsWith("the cat sat"))
  }

  test("quote-aware tag strip: '>' inside a quoted attribute value") {
    // naive <[^>]*> truncates at the > inside alt="..." and leaks `b">`
    val t = texts(page("""<p>before <img alt="a>b"> after middle words</p>"""))
    assert(t == Seq("before after middle words"))
    // single-quoted attributes too, and inside anchors (link_density path)
    val rows = segs(page(
      """<div><a href='/x' title='1>2'>click here now</a></div>"""))
    assert(rows.head.getAs[String]("text") == "click here now")
    assert(rows.head.getAs[String]("decision") == "boilerplate",
      "all text is anchor text despite the quoted '>'")
    // title attribute-laden with quoted '>'
    val tt = Seq((1L, """<html><head><title data-x="a>b">Real Title</title></head><body><p>x</p></body></html>"""))
      .toDF("id", "html").select(graft.operators.Extract.title(col("html")).as("t"))
      .as[String].head()
    assert(tt == "Real Title")
  }

  test("per-language stopword gates: lang column picks the stoplist; zh bypasses") {
    val de = "der große Hund und die kleine Katze ist nicht mit einem Vogel hier"
    val zh = "数据 系统 查询 快速 合并 窗口 流 处理 表 行 列 值"
    val en = "the quick brown fox jumps over the lazy dog in a field"
    val df = Seq(
      (1L, "de", page(s"<p>$de</p>")),
      (2L, "zh", page(s"<p>$zh</p>")),
      (3L, "en", page(s"<p>$en</p>")),
      (4L, "xx", page(s"<p>$en</p>")) // unknown lang → English fallback
    ).toDF("id", "lang", "html")
    val gated = Extract.segments(df, "html", langCol = Some("lang"))
      .select("id", "decision", "stop_density")
      .as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(gated.map(_._2) == Seq("good", "good", "good", "good"),
      s"per-lang gates classify native prose good: $gated")
    assert(gated(0)._3 > 0.3, "German stoplist scores German prose")
    assert(gated(1)._3 == 0.0, "zh: empty stoplist, gate bypassed")
    // the en-only default misclassifies the same German/zh prose
    val unGated = Extract.segments(df, "html")
      .select("id", "decision").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(unGated.map(_._2) == Seq("neargood", "neargood", "good", "good"))
    // extractText threads the lang column through to the gates
    val ext = Extract.extractText(df, "html", "id", langCol = Some("lang"))
      .orderBy("id").select("n_blocks_kept").as[Long].collect().toSeq
    assert(ext == Seq(1L, 1L, 1L, 1L))
  }

  test("plan shape: no UDFs, extraction is a single Generate over codegen'd expressions") {
    val df = Extract.segments(Seq((1L, page("<p>a b c</p>"))).toDF("id", "html"), "html")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"))
    assert(plan.contains("Generate"))
  }
}
