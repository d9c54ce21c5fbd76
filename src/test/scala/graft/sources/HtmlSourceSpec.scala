package graft.sources

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.HtmlSource.{parseBlocks, HtmlBlock}

/** Pins [[HtmlSource]]'s tolerant tokenizer, block segmentation, and
  * boilerplate heuristic — every malformed-markup healing rule is a
  * hand-traced case, not an implementation accident.
  */
class HtmlSourceSpec extends SparkSpec {

  private def texts(html: String): Seq[String] = parseBlocks(html).map(_.text)

  test("block tags segment; inline tags and <br> do not; <hr> does") {
    val b = texts("<div>one two</div><p>three</p>four <b>five</b> six<hr>seven")
    assert(b === Seq("one two", "three", "four five six", "seven"))
  }

  test("unclosed <p>s segment on the next block open (tolerance heal)") {
    assert(texts("<p>alpha beta<p>gamma<p>delta") ===
      Seq("alpha beta", "gamma", "delta"))
  }

  test("script/style raw text is skipped whole — inner tags do not segment") {
    val html = "<p>before</p><script>if (a<b && c>d) { x = \"</div>\"; }" +
      "</script><style>p>a { color: red }</style><p>after</p>"
    assert(texts(html) === Seq("before", "after"))
  }

  test("head content is dropped; missing </head> healed by <body>") {
    assert(texts("<head><title>T</title><meta charset=utf-8><body><p>kept") ===
      Seq("kept"))
  }

  test("entities: named, decimal, hex, unknown and unterminated stay literal") {
    assert(texts("<p>a &amp; b &lt;c&gt; &#65;&#x42; &copy; &amp tail") ===
      Seq("a & b <c> AB &copy; &amp tail"))
  }

  test("nbsp decodes to a normal space and normalizes") {
    assert(texts("<p>one&nbsp;&nbsp;two") === Seq("one two"))
  }

  test("stray '<' and unterminated tag at EOF degrade locally") {
    assert(texts("<p>3 < 4 and x <5 ok</p><p>tail<div attr=\"unclosed") ===
      Seq("3 < 4 and x <5 ok", "tail"))
  }

  test("unterminated comment swallows the tail; closed comment is invisible") {
    assert(texts("<p>a<!-- hidden --> b</p><p>c<!-- runs off") ===
      Seq("a b", "c"))
  }

  test("'>' inside a quoted attribute does not end the tag") {
    assert(texts("<p title=\"a > b\">quoted attr survives here fine") ===
      Seq("quoted attr survives here fine"))
  }

  test("whitespace normalization: runs collapse, ends trim") {
    assert(texts("<p>  a \t\n  b  ") === Seq("a b"))
  }

  test("nav/header/footer/aside blocks are pruned structurally") {
    val bs = parseBlocks(
      "<nav>some menu words here now</nav><p>real body content words here" +
        "</p><footer>long footer sentence with many words</footer>")
    assert(bs.map(b => (b.text.split(" ").head, b.pruned, b.content)) ===
      Seq(("some", true, false), ("real", false, true), ("long", true, false)))
    // unbalanced extra close clamps at zero — later blocks unaffected
    val cl = parseBlocks("</nav></footer><p>still plain content words here")
    assert(cl.map(b => (b.pruned, b.content)) === Seq((false, true)))
  }

  test("word-count rule: a short non-pruned block is not content") {
    val bs = parseBlocks("<h1>Doc 7</h1><p>five words make the cut")
    assert(bs.map(b => (b.n_words, b.content)) ===
      Seq((2, false), ((5, true))))
  }

  test("link density: hand-traced mixed block and an all-link block") {
    // "intro <a>link text</a> tail words here": non-ws chars total =
    // 5+4+4+4+5+4 = 26, link = 8 → 3*8=24 <= 26 → content
    val mixed = parseBlocks("<p>intro <a href=x>link text</a> tail words here")
    assert(mixed === Vector(HtmlBlock(0, "intro link text tail words here",
      6, 26, 8, pruned = false, content = true)))
    // all-link block: 3*link > chars → boilerplate despite 5+ words
    val all = parseBlocks("<div><a href=a>one</a> <a href=b>two</a> " +
      "<a href=c>three</a> <a href=d>four</a> <a href=e>five</a></div>")
    assert(all.map(b => (b.n_words, b.link_chars === b.n_chars, b.content)) ===
      Seq((5, true, false)))
  }

  test("<a> spans block boundaries (HTML5 card pattern); unclosed <a> persists") {
    val bs = parseBlocks("<a href=x><div>card title words here now</div>" +
      "<div>card body words here now</div></a>")
    assert(bs.forall(b => b.link_chars === b.n_chars && !b.content))
  }

  test("self-closing and void tags: br separates words, img is invisible") {
    val bs = parseBlocks("<p>a<br>b<img src=x/>c &amp; d words enough here")
    // <br> contributes a space (line break); <img/> joins b and c (an
    // inline image does not break a word)
    assert(bs.map(_.text) === Seq("a bc & d words enough here"))
    assert(bs.head.link_chars === 0)
  }

  test("DOCTYPE and processing instructions are invisible") {
    assert(texts("<!DOCTYPE html><?xml version=\"1.0\"?><p>body text") ===
      Seq("body text"))
  }

  test("empty and null-safe inputs") {
    assert(parseBlocks("") === Vector.empty)
    assert(parseBlocks("   \n\t  ") === Vector.empty)
    assert(parseBlocks("<div></div><p></p>") === Vector.empty)
  }

  test("extractBlocks + mainStats over a string column (distributed face)") {
    import spark.implicits._
    val df = Seq(
      (1L, "<nav>menu of links</nav><p>first real paragraph has words" +
        "</p><p>second real paragraph has words</p><footer>footer row</footer>"),
      (2L, "<p>tiny</p>")).toDF("id", "html")
    val stats = HtmlSource.mainStats(df, "id", "html")
      .orderBy(col("id")).collect()
    assert(stats(0).getLong(1) === 4L) // n_blocks
    assert(stats(0).getLong(2) === 2L) // n_content
    assert(stats(0).getLong(3) === 10L) // content_words
    assert(stats(0).getString(4) ===
      "first real paragraph has words second real paragraph has words")
    assert(stats(1).getLong(2) === 0L)
    assert(stats(1).getString(4) === "")
  }

  test("links: three quote styles, case-insensitive HREF, document order") {
    val html = "<a href=\"/dq\">a</a><a href='/sq'>b</a>" +
      "<a href=/bare>c</a><A HREF=\"/up\">d</A>" +
      "<a class=x href = \"/spaced\" rel=nofollow>e</a>"
    assert(HtmlSource.parseLinks(html) ===
      Vector("/dq", "/sq", "/bare", "/up", "/spaced"))
  }

  test("links: script bodies, comments, and href-less anchors contribute " +
    "nothing; entities decode in href values") {
    val html = "<script>var a='<a href=\"/no1\">';</script>" +
      "<!-- <a href=\"/no2\">x</a> --><a name=anchor>plain</a>" +
      "<a href=\"/q?a=1&amp;b=2\">yes</a>"
    assert(HtmlSource.parseLinks(html) === Vector("/q?a=1&b=2"))
  }

  test("links: first href wins within a tag; an unterminated trailing " +
    "anchor still yields its href (fail-soft)") {
    assert(HtmlSource.parseLinks(
      "<a href=\"/first\" href=\"/second\">x</a>") === Vector("/first"))
    assert(HtmlSource.parseLinks("<p>text<a href=\"/x\"") === Vector("/x"))
  }

  test("extractLinks face: one row per href, html column consumed") {
    import spark.implicits._
    val df = Seq((1L, "s1", "<a href=\"/a\">x</a><a href=\"/b\">y</a>"),
      (2L, "s2", "<p>no links</p>")).toDF("id", "src", "html")
    val got = HtmlSource.extractLinks(df, "html")
      .orderBy(col("id"), col("href")).collect()
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq === Seq((1L, "s1", "/a"), (1L, "s1", "/b")))
  }

  test("file face: one row per block with the source path") {
    val dir = SyntheticFixtures.dir("html")
    SyntheticFixtures.writeText(new File(dir, "a.html"),
      "<body><p>file face body words here</p><nav>menu</nav>")
    SyntheticFixtures.writeText(new File(dir, "b.html"),
      "<p>second file body words here</p>")
    val got = HtmlSource.read(spark, new File(dir, "*.html").getPath)
      .orderBy(col("path"), col("block_idx"))
      .select(col("text"), col("content")).collect()
    assert(got.map(r => (r.getString(0), r.getBoolean(1))).toSeq === Seq(
      ("file face body words here", true), ("menu", false),
      ("second file body words here", true)))
  }
}
