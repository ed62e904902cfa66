package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.llm.HtmlText
import graft.sources.Warc

class WarcSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val date = "2024-01-01T00:00:00Z"

  test("parseAll round-trips response records byte-exactly") {
    val html = "<html><body><p>hello world</p></body></html>"
    val bytes = Warc.responseRecord("http://x/1.html", date, html) ++
      Warc.responseRecord("http://x/2.html", date, "<p>two</p>")
    val recs = Warc.parseAll(bytes, "t")
    assert(recs.map(_.warcType) == Seq("response", "response"))
    assert(recs.map(_.targetUri) ==
      Seq("http://x/1.html", "http://x/2.html"))
    assert(recs.head.httpStatus.contains(200))
    assert(recs.head.contentType == "text/html")
    assert(new String(recs.head.body, "UTF-8") == html)
  }

  test("Content-Length jumps over payloads containing WARC magic " +
      "and blank lines") {
    val tricky = "a\r\n\r\nWARC/1.0\r\nWARC-Type: fake\r\n\r\nb"
    val bytes = Warc.responseRecord("http://x/t.html", date, tricky) ++
      Warc.responseRecord("http://x/u.html", date, "ok")
    val recs = Warc.parseAll(bytes, "t")
    assert(recs.size == 2)
    assert(new String(recs.head.body, "UTF-8") == tricky)
    assert(new String(recs(1).body, "UTF-8") == "ok")
  }

  test("Content-Length counts bytes, not chars (astral page)") {
    val astral = "emoji 😀 and 中文"
    val bytes = Warc.responseRecord("http://x/a.html", date, astral) ++
      Warc.auxRecord("warcinfo", "http://x/i", date, "k: v\r\n")
    val recs = Warc.parseAll(bytes, "t")
    assert(recs.size == 2)
    assert(new String(recs.head.body, "UTF-8") == astral)
    assert(recs(1).warcType == "warcinfo")
    assert(recs(1).httpStatus.isEmpty)
  }

  test("gzip: concatenated per-record members (the Common Crawl " +
      "layout) inflate to the same records as plain") {
    val plain = Warc.responseRecord("http://x/1.html", date, "one") ++
      Warc.responseRecord("http://x/2.html", date, "two")
    val members =
      Warc.gzipMember(Warc.responseRecord("http://x/1.html", date,
        "one")) ++
      Warc.gzipMember(Warc.responseRecord("http://x/2.html", date,
        "two"))
    val a = Warc.parseAll(plain, "p").map(r => new String(r.body, "UTF-8"))
    val b = Warc.parseAll(members, "g").map(r =>
      new String(r.body, "UTF-8"))
    assert(a == Seq("one", "two") && b == a)
  }

  test("malformed input fails loudly: bad magic, missing length, " +
      "truncated payload") {
    val e1 = intercept[IllegalArgumentException] {
      Warc.parseAll("NOTWARC/9 x\r\n\r\n".getBytes("UTF-8"), "f") }
    assert(e1.getMessage.contains("magic"))
    val noLen = "WARC/1.0\r\nWARC-Type: response\r\n\r\n"
    intercept[RuntimeException] {
      Warc.parseAll(noLen.getBytes("UTF-8"), "f") }
    val trunc = "WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 999\r\n\r\nab"
    val e3 = intercept[IllegalArgumentException] {
      Warc.parseAll(trunc.getBytes("UTF-8"), "f") }
    assert(e3.getMessage.contains("truncated"))
  }

  test("records(): binaryFile scan over a mixed gzip/plain fixture " +
      "dir, aux records filtered by responses()") {
    val pages = (0L until 10L).map(i =>
      i -> s"<html><body><p>doc $i</p></body></html>")
    val dir = Warc.writeWarcDir(spark, pages, 4)
    // 3 segments (4+4+2 responses), each +2 aux records
    val all = Warc.records(spark, dir)
    assert(all.count() == 10 + 3 * 2)
    assert(all.filter(col("warc_type") === "warcinfo").count() == 3)
    val resp = Warc.responses(spark, dir)
      .select(regexp_extract(col("target_uri"), "/(\\d+)\\.html$", 1)
        .cast("long").as("id"), col("html"))
      .as[(Long, String)].collect().sortBy(_._1)
    assert(resp.map(_._1).toSeq == (0L until 10L))
    assert(resp.head._2 == "<html><body><p>doc 0</p></body></html>")
    graft.core.Tables.clearStaged()
  }

  test("htmlToText: script/style/comments dropped, tags flattened, " +
      "entities decoded last, whitespace collapsed") {
    val html = "<html><head><style>b { x: 1; }</style>" +
      "<script>if (1 < 2) { var s = \"</i>\"; }</script></head>" +
      "<body><!-- c1 > c2 --><h1>Title</h1>\n\n" +
      "<p>a &amp;&nbsp;b &lt;tag&gt; c\t d</p></body></html>"
    val out = Seq(html).toDF("h")
      .select(HtmlText.htmlToText(col("h")).as("t"))
      .as[String].head()
    assert(out == "Title a & b <tag> c d")
  }

  test("native htmlToText kernel is bit-identical to the staged " +
      "regex pipeline on structured trap cases") {
    val traps = Seq(
      "",                                      // empty
      "plain text only",
      "<script>no close tag eats nothing",     // unterminated block
      "<ScRiPt x=1>a</sCrIpT  >b",             // case + \s* close
      "<script>a</scriptx>b</script>c",        // bogus close first
      "<style>s</style><style>t</style>u",     // repeated blocks
      "<!-- unterminated comment <p>x</p>",    // comment never closes
      "<!-- a > b --><p>kept</p>",             // '>' inside comment
      "<p att\n='x'>multi\nline tag</p>",      // newline inside tag
      "a < b and c > d",                       // bare angle brackets
      "<unclosed at eof",                      // '<' with no '>'
      "&amp;lt; &amp;amp; &lt;i&gt; &#39;q&#39; &quot;w&quot;&nbsp;!",
      "\t\n mixed \f ws \r\n runs ",
      "<scrip>not script</scrip><script >x</script>",
      "İstanbul <ŞCRIPT>not a script</ŞCRIPT>", // non-ASCII no fold
      "中文 😀 <b>bold</b> &nbsp;&nbsp;done")
    val df = traps.toDF("h")
    val out = df.select(HtmlText.htmlToText(col("h")).as("k"),
        HtmlText.htmlToTextHof(col("h")).as("r"))
      .as[(String, String)].collect()
    out.zip(traps).foreach { case ((k, r), in) =>
      assert(k == r, s"kernel/regex divergence on: '$in'") }
  }

  test("native htmlToText kernel matches the regex pipeline on " +
      "fuzzed tag soup") {
    val rng = new scala.util.Random(20260815)
    val frags = Array("<", ">", "</", "script", "style", "SCRIPT",
      "<script>", "</script>", "</script >", "<style a=b>",
      "</style>", "<!--", "-->", "<p>", "</p>", "&", ";", "&lt;",
      "&gt;", "&amp;", "&quot;", "&#39;", "&nbsp;", "&bogus;", " ",
      "\t", "\n", "\r\n", "", "\f", "word", "x1", "中", "😀",
      "\"", "'", "=", "!", "-")
    val soups = (1 to 300).map { _ =>
      val n = rng.nextInt(40)
      (0 until n).map(_ => frags(rng.nextInt(frags.length))).mkString
    }
    val out = soups.toDF("h")
      .select(HtmlText.htmlToText(col("h")).as("k"),
        HtmlText.htmlToTextHof(col("h")).as("r"))
      .as[(String, String)].collect()
    out.zip(soups).foreach { case ((k, r), in) =>
      assert(k == r, s"kernel/regex divergence on: '$in'") }
  }

  test("escapeHtml/htmlToText round-trip recovers collapsed text, " +
      "including pre-escaped sequences") {
    val texts = Seq("a < b & c > d", "already &lt;here&gt; &amp; fine",
      "line\nbreaks\t and  runs", "中文 😀")
    val out = texts.toDF("t").select(HtmlText.htmlToText(
        HtmlText.wrapPage(lit("7"), HtmlText.escapeHtml(col("t"))))
        .as("x")).as[String].collect()
    val want = texts.map(_.replaceAll("[ \\t\\r\\n\\f\\x0B]+", " ").trim)
    assert(out.toSeq == want)
  }
}
