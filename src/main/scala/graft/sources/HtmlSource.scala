package graft.sources

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** HTML ingestion + boilerplate extraction — the one high-traffic
  * training-data surface the format family lacked (reference scope:
  * the XML/CSV/JSON scan layer, `DbXmlImportWorker.java`; HTML itself
  * is beyond the reference and pinned against the oracle replay
  * instead).
  *
  * Real-world HTML is not XML: tags go unclosed, attributes drop their
  * quotes, `<script>` bodies contain unescaped `<` and `&`. So this is
  * NOT the StAX path ([[XmlSource]]) — it is a single-pass tolerant
  * tokenizer that never builds a DOM and never throws on malformed
  * markup: block-level tags segment the text stream into blocks, and a
  * boilerpipe-style heuristic (Kohlschütter et al., WSDM 2010:
  * word-count + link-density features; trafilatura's structural
  * nav/footer prior) classifies each block as content or boilerplate.
  *
  * The block model:
  *  - `<script>/<style>/<noscript>/<textarea>/<title>` bodies are raw
  *    text — skipped to their case-insensitive close tag, never
  *    tokenized (a `</div>` inside a script must not split a block).
  *  - everything inside `<head>` is dropped (a missing `</head>` is
  *    healed by `<body>`).
  *  - opening or closing a BLOCK tag (p/div/li/h1–h6/td/section/…,
  *    plus `<hr>`) flushes the current text run as one block; inline
  *    tags (a/b/span/em/…, plus `<br>`) do not.
  *  - `<nav>/<header>/<footer>/<aside>` are STRUCTURAL boilerplate
  *    containers: every block flushed while one is open is boilerplate
  *    regardless of its text (depth-counted, unbalanced closes clamp
  *    at 0).
  *  - entities decode in text (named amp/lt/gt/quot/apos/nbsp +
  *    numeric dec/hex); unknown or unterminated ones stay literal.
  *  - `<a>` may legally wrap block elements in HTML5, so link depth
  *    persists across block boundaries — an anchor left unclosed
  *    marks the remainder of the document as link text (tolerance
  *    trade documented, not hidden).
  *
  * Per block: whitespace-normalized text, word count, non-whitespace
  * char count, non-whitespace chars inside `<a>` spans, the structural
  * flag, and the verdict `content` =
  * NOT pruned AND words ≥ [[MinContentWords]] AND 3·link_chars ≤ chars
  * (the boilerpipe link-density cut at 1/3).
  *
  * Scale model: parsing is a per-row flatMap (one UDF call per
  * document, no shuffle, no driver work) — the 100 TB shape where HTML
  * arrives as a string column in WARC-derived parquet. The imperative
  * parser is the honest UDF case: no Catalyst expression composes a
  * tolerant tokenizer. The file face ([[read]]) loads one document per
  * task via `binaryFile`, like the workbook sources.
  */
object HtmlSource {

  /** Minimum words for a non-structural block to count as content. */
  val MinContentWords = 5

  /** One segmented text block. `n_chars`/`link_chars` count
    * NON-WHITESPACE decoded chars (the link-density denominator and
    * numerator); `text` is whitespace-normalized (runs of `\s` → one
    * space, ends trimmed).
    */
  case class HtmlBlock(block_idx: Int, text: String, n_words: Int,
                       n_chars: Int, link_chars: Int, pruned: Boolean,
                       content: Boolean)

  private val BlockTags = Set(
    "p", "div", "li", "ul", "ol", "h1", "h2", "h3", "h4", "h5", "h6",
    "td", "th", "tr", "table", "thead", "tbody", "tfoot", "caption",
    "section", "article", "main", "blockquote", "pre", "dl", "dt", "dd",
    "figure", "figcaption", "form", "fieldset", "address", "hr",
    "nav", "header", "footer", "aside", "body", "html", "details",
    "summary")
  private val PrunedTags = Set("nav", "header", "footer", "aside")
  private val RawTextTags = Set("script", "style", "noscript",
    "textarea", "title")
  private val NamedEntities = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  private def normalize(s: String): String =
    s.split("\\s+").iterator.filter(_.nonEmpty).mkString(" ")

  /** Tokenize + segment one HTML document into blocks. Never throws on
    * malformed markup: stray `<`, unterminated tags/comments/entities,
    * unclosed elements, and unbalanced closes all degrade locally.
    */
  def parseBlocks(html: String): Vector[HtmlBlock] = {
    val n = html.length
    val lower = html.toLowerCase(Locale.ROOT) // for raw-text close scans
    val out = Vector.newBuilder[HtmlBlock]
    val buf = new java.lang.StringBuilder
    var linkNonWs = 0
    var linkDepth = 0
    var pruneDepth = 0
    var inHead = false
    var blockIdx = 0
    var i = 0

    def appendChar(c: Char): Unit = if (!inHead) {
      buf.append(c)
      if (!Character.isWhitespace(c) && linkDepth > 0) linkNonWs += 1
    }

    def flush(): Unit = {
      val parts = buf.toString.split("\\s+").filter(_.nonEmpty)
      if (parts.nonEmpty) {
        val text = parts.mkString(" ")
        val words = parts.length
        val chars = text.length - (words - 1)
        val link = math.min(linkNonWs, chars) // clamp vs ws-only link runs
        val isContent = pruneDepth == 0 && words >= MinContentWords &&
          3L * link <= chars
        out += HtmlBlock(blockIdx, text, words, chars, link,
          pruneDepth > 0, isContent)
        blockIdx += 1
      }
      buf.setLength(0)
      linkNonWs = 0
    }

    // returns (lower-cased name, pos after name); empty name = not a tag
    def tagName(start: Int): (String, Int) = {
      var j = start
      if (j < n && (html.charAt(j).isLetter)) {
        j += 1
        while (j < n && (html.charAt(j).isLetterOrDigit ||
          html.charAt(j) == '-' || html.charAt(j) == ':')) j += 1
        (lower.substring(start, j), j)
      } else ("", start)
    }

    // scan attributes quote-aware; returns (pos after '>', self-closed)
    def scanAttrs(start: Int): (Int, Boolean) = {
      var j = start
      var quote: Char = 0
      var lastNonWs: Char = 0
      while (j < n) {
        val c = html.charAt(j)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return (j + 1, lastNonWs == '/')
        if (!Character.isWhitespace(c)) lastNonWs = c
        j += 1
      }
      (n, false) // unterminated tag at EOF: swallow the tail
    }

    def skipRawText(tag: String): Int = {
      val close = "</" + tag
      val at = lower.indexOf(close, i)
      if (at < 0) n
      else {
        val gt = html.indexOf('>', at)
        if (gt < 0) n else gt + 1
      }
    }

    def handleOpen(name: String, selfClosed: Boolean): Unit = name match {
      case "head" => flush(); inHead = true
      case "body" => flush(); inHead = false
      case "br" => appendChar(' ') // line break separates words, not blocks
      case t if RawTextTags(t) => if (!selfClosed) i = skipRawText(t)
      case t =>
        if (BlockTags(t)) flush()
        if (!selfClosed) {
          if (PrunedTags(t)) pruneDepth += 1
          else if (t == "a") linkDepth += 1
        }
    }

    def handleClose(name: String): Unit = {
      if (name == "head") { inHead = false; return }
      if (BlockTags(name)) flush()
      if (PrunedTags(name)) pruneDepth = math.max(0, pruneDepth - 1)
      else if (name == "a") linkDepth = math.max(0, linkDepth - 1)
    }

    // decode one entity at '&'; returns (decoded text, next pos)
    def entity(start: Int): (String, Int) = {
      if (start + 1 < n && html.charAt(start + 1) == '#') {
        val hex = start + 2 < n &&
          (html.charAt(start + 2) == 'x' || html.charAt(start + 2) == 'X')
        var j = start + (if (hex) 3 else 2)
        val d0 = j
        while (j < n && j - d0 < 8 && (if (hex)
          Character.digit(html.charAt(j), 16) >= 0
        else html.charAt(j).isDigit)) j += 1
        if (j > d0 && j < n && html.charAt(j) == ';') {
          try {
            val cp = Integer.parseInt(html.substring(d0, j), if (hex) 16 else 10)
            if (cp > 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF))
              return (new String(Character.toChars(cp)), j + 1)
          } catch { case _: NumberFormatException => }
        }
        ("&", start + 1)
      } else {
        var j = start + 1
        while (j < n && j - start <= 8 && html.charAt(j).isLetter) j += 1
        if (j < n && html.charAt(j) == ';')
          NamedEntities.get(lower.substring(start + 1, j)) match {
            case Some(v) => return (v, j + 1)
            case None =>
          }
        ("&", start + 1)
      }
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n &&
          (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val e = html.indexOf('>', i) // DOCTYPE / processing instruction
          i = if (e < 0) n else e + 1
        } else if (i + 1 < n && html.charAt(i + 1) == '/') {
          val (name, after) = tagName(i + 2)
          if (name.isEmpty) { appendChar('<'); i += 1 }
          else {
            val e = html.indexOf('>', after)
            i = if (e < 0) n else e + 1
            handleClose(name)
          }
        } else {
          val (name, after) = tagName(i + 1)
          if (name.isEmpty) { appendChar('<'); i += 1 }
          else {
            val (end, selfClosed) = scanAttrs(after)
            i = end
            handleOpen(name, selfClosed) // may advance i past raw text
          }
        }
      } else if (c == '&') {
        val (decoded, next) = entity(i)
        var k = 0
        while (k < decoded.length) { appendChar(decoded.charAt(k)); k += 1 }
        i = next
      } else { appendChar(c); i += 1 }
    }
    flush()
    out.result()
  }

  /** Decode entities in an attribute value (same rules as text:
    * named + numeric; unknown/unterminated stay literal).
    */
  private[sources] def decodeEntities(s: String): String = {
    val n = s.length
    val lower = s.toLowerCase(Locale.ROOT)
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '&') {
        if (i + 1 < n && s.charAt(i + 1) == '#') {
          val hex = i + 2 < n &&
            (s.charAt(i + 2) == 'x' || s.charAt(i + 2) == 'X')
          var j = i + (if (hex) 3 else 2)
          val d0 = j
          while (j < n && j - d0 < 8 && (if (hex)
            Character.digit(s.charAt(j), 16) >= 0 else s.charAt(j).isDigit))
            j += 1
          var done = false
          if (j > d0 && j < n && s.charAt(j) == ';') {
            try {
              val cp = Integer.parseInt(s.substring(d0, j), if (hex) 16 else 10)
              if (cp > 0 && cp <= 0x10FFFF && !(cp >= 0xD800 && cp <= 0xDFFF)) {
                sb.append(Character.toChars(cp)); i = j + 1; done = true
              }
            } catch { case _: NumberFormatException => }
          }
          if (!done) { sb.append('&'); i += 1 }
        } else {
          var j = i + 1
          while (j < n && j - i <= 8 && s.charAt(j).isLetter) j += 1
          val named = if (j < n && s.charAt(j) == ';')
            NamedEntities.get(lower.substring(i + 1, j)) else None
          named match {
            case Some(v) => sb.append(v); i = j + 1
            case None => sb.append('&'); i += 1
          }
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Every `<a href=…>` target in document order — the outlink face
    * for link-graph construction. The same tolerance as
    * [[parseBlocks]]: raw-text elements (`<script>` bodies that
    * mention anchors) and comments are skipped, attribute names are
    * case-insensitive, values may be double-quoted, single-quoted, or
    * bare, and entity references in the value decode (`&amp;` is how
    * `&` legally appears in an href). Anchors without an href are not
    * links.
    */
  def parseLinks(html: String): Vector[String] = {
    val n = html.length
    val lower = html.toLowerCase(Locale.ROOT)
    val out = Vector.newBuilder[String]
    var i = 0

    def skipRaw(tag: String, from: Int): Int = {
      val at = lower.indexOf("</" + tag, from)
      if (at < 0) n else { val gt = html.indexOf('>', at); if (gt < 0) n else gt + 1 }
    }

    // scan one tag's attributes from `start` (after the name) to '>',
    // returning (href value or null, pos after '>')
    def hrefOf(start: Int): (String, Int) = {
      var j = start
      var href: String = null
      while (j < n && html.charAt(j) != '>') {
        // skip whitespace and stray slashes
        while (j < n && (Character.isWhitespace(html.charAt(j)) ||
          html.charAt(j) == '/')) j += 1
        if (j < n && html.charAt(j) != '>') {
          val a0 = j
          while (j < n && !Character.isWhitespace(html.charAt(j)) &&
            html.charAt(j) != '=' && html.charAt(j) != '>' &&
            html.charAt(j) != '/') j += 1
          val name = lower.substring(a0, j)
          while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
          var value: String = null
          if (j < n && html.charAt(j) == '=') {
            j += 1
            while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
            if (j < n && (html.charAt(j) == '"' || html.charAt(j) == '\'')) {
              val q = html.charAt(j)
              val v0 = j + 1
              var k = v0
              while (k < n && html.charAt(k) != q) k += 1
              value = html.substring(v0, k)
              j = if (k < n) k + 1 else n
            } else {
              val v0 = j
              while (j < n && !Character.isWhitespace(html.charAt(j)) &&
                html.charAt(j) != '>') j += 1
              value = html.substring(v0, j)
            }
          }
          if (name == "href" && href == null && value != null)
            href = decodeEntities(value)
        }
      }
      (href, if (j < n) j + 1 else n)
    }

    while (i < n) {
      if (html.charAt(i) == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n &&
          (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val e = html.indexOf('>', i)
          i = if (e < 0) n else e + 1
        } else if (i + 1 < n && html.charAt(i + 1) == '/') {
          val e = html.indexOf('>', i)
          i = if (e < 0) n else e + 1
        } else {
          var j = i + 1
          if (j < n && html.charAt(j).isLetter) {
            val t0 = j
            j += 1
            while (j < n && (html.charAt(j).isLetterOrDigit ||
              html.charAt(j) == '-' || html.charAt(j) == ':')) j += 1
            val name = lower.substring(t0, j)
            if (name == "a") {
              val (href, after) = hrefOf(j)
              if (href != null) out += href
              i = after
            } else if (RawTextTags(name)) {
              val gt = html.indexOf('>', j)
              i = skipRaw(name, if (gt < 0) n else gt + 1)
            } else {
              val gt = html.indexOf('>', j)
              i = if (gt < 0) n else gt + 1
            }
          } else { i += 1 }
        }
      } else i += 1
    }
    out.result()
  }

  private val linksUdf = udf { html: String =>
    if (html == null) Vector.empty[String] else parseLinks(html)
  }

  /** One row per outlink, in document order: every column of `df`
    * except the consumed html column, plus `href`. Documents with no
    * links produce no rows.
    */
  def extractLinks(df: DataFrame, htmlCol: String): DataFrame =
    df.withColumn("__href", explode(linksUdf(col(htmlCol))))
      .drop(htmlCol).withColumnRenamed("__href", "href")

  private val blocksUdf = udf { html: String =>
    if (html == null) Vector.empty[HtmlBlock] else parseBlocks(html)
  }

  /** One row per block: (idCol, block_idx, text, n_words, n_chars,
    * link_chars, pruned, content). Documents whose markup yields zero
    * blocks produce zero rows (explode of an empty array) — left-join
    * back if presence matters.
    */
  def extractBlocks(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.withColumn("__b", explode(blocksUdf(col(htmlCol))))
      .select(col(idCol), col("__b.block_idx").as("block_idx"),
        col("__b.text").as("text"), col("__b.n_words").as("n_words"),
        col("__b.n_chars").as("n_chars"),
        col("__b.link_chars").as("link_chars"),
        col("__b.pruned").as("pruned"), col("__b.content").as("content"))

  /** Per-document extraction summary: block census + the main text
    * (content blocks joined in block order with single spaces).
    */
  def mainStats(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    extractBlocks(df, idCol, htmlCol)
      .groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_blocks"),
        sum(when(col("content"), 1L).otherwise(0L)).as("n_content"),
        sum(when(col("content"), col("n_words")).otherwise(0L))
          .as("content_words"),
        array_join(
          transform(
            array_sort(collect_list(
              when(col("content"), struct(col("block_idx"), col("text"))))),
            b => b.getField("text")),
          " ").as("content_text"))

  /** File face: every matched file parsed as one UTF-8 HTML document
    * (one file per task via `binaryFile`), one row per block plus the
    * source path.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val files = BinaryFiles.read(spark, path)
      .select(col("path"), decode(col("content"), "UTF-8").as("__html"))
    extractBlocks(files, "path", "__html")
  }
}
