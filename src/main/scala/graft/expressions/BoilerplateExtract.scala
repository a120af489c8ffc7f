package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Densitometric boilerplate removal over one HTML page — the
  * block-classification core of the published boilerpipe family
  * (Kohlschütter, Fankhauser & Nejdl, WSDM'10 "Boilerplate Detection
  * using Shallow Text Features"): split the page into BLOCKS at
  * block-level tag boundaries, score each block by word count and link
  * density, keep the dense low-link blocks as content, drop the rest
  * (nav, chrome, footers, related-links rails). This is the extraction
  * stage every crawl→training pipeline runs between fetch and text
  * processing; q169's `<main>`-scoped extractor is the structured
  * shortcut, this is the general page.
  *
  * Classification rule (the paper's shallow-feature simplification,
  * exact-rational, no floats): a block is CONTENT iff
  *   words ≥ MinContentWords  ∧  LinkDenDen·linkWords ≤ LinkDenNum·words
  * (link density ≤ 1/3). Words inside `<a>` count as link words.
  *
  * Parse behavior (documented contract, pinned in specs):
  *  - `<head>…</head>`, `<script>…</script>`, `<style>…</style>`, and
  *    `<!-- comments -->` contribute NO text (head/script/style are
  *    not rendered; an unclosed one is refused loudly — silently eating
  *    the page tail is exactly the corruption to surface);
  *  - block-LEVEL tags (p, div, h1-h6, li, ul, ol, table, tr, td, nav,
  *    main, header, footer, aside, section, article, blockquote, br,
  *    body, html, title) open OR close a block; inline tags (a, b, i,
  *    em, strong, span, code, small, u) do not;
  *  - entities &amp; &lt; &gt; &quot; &#39; unescape into text;
  *  - a block's text is its whitespace-split words re-joined by single
  *    spaces; content = content blocks joined by '\n' (normalized —
  *    byte-offset fidelity belongs to the WARC layer, not extraction);
  *  - tag names are case-insensitive; attributes are skipped.
  *
  * Returns struct(n_blocks, n_content, content_words: bigint,
  * content: string) — n_blocks counts blocks with ≥ 1 word.
  *
  * Scale: pure per-row expression work (one linear scan per page, no
  * model state) — the corpus pass stays map-only and codegen-fused.
  */
case class BoilerplateExtract(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_blocks", LongType, nullable = false),
    StructField("n_content", LongType, nullable = false),
    StructField("content_words", LongType, nullable = false),
    StructField("content", StringType, nullable = false)))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"boilerplate_extract needs string, got ${dt.sql}")
    }

  override protected def nullSafeEval(input: Any): Any =
    BoilerplateExtract.extract(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.BoilerplateExtract.extract($c);")

  override protected def withNewChildInternal(c: Expression): BoilerplateExtract =
    copy(child = c)

  override def prettyName: String = "boilerplate_extract"
}

object BoilerplateExtract {

  /** Content bar: blocks below this word count are chrome/noise. */
  val MinContentWords = 10

  /** Link-density bar as an exact rational: linkWords/words ≤ 1/3. */
  val LinkDenNum = 1
  val LinkDenDen = 3

  private val BlockTags: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
      "table", "tr", "td", "th", "nav", "main", "header", "footer",
      "aside", "section", "article", "blockquote", "br", "hr", "body",
      "html", "title").foreach(s.add)
    s
  }

  /** Tags whose whole element contributes no rendered text. */
  private val SkipTags = Set("head", "script", "style")

  /** ASCII-case-insensitive scan for `</name` FOLLOWED BY '>' or
    * whitespace — a bare prefix match would let "</head" swallow
    * "</header>", silently eating a banner as head content instead of
    * refusing loudly on the truly-unclosed page. ASCII-only folding keeps
    * indices aligned with the original string (full toLowerCase can change
    * length for some Unicode and would also allocate a page-sized copy per
    * skip-tag occurrence). */
  private def indexOfCloseTag(html: String, name: String, from: Int): Int = {
    val pat = "</" + name
    val m = pat.length
    var i = from
    val limit = html.length - m
    while (i <= limit) {
      var j = 0
      var ok = true
      while (ok && j < m) {
        val a = html.charAt(i + j)
        val af = if (a >= 'A' && a <= 'Z') (a + 32).toChar else a
        if (af != pat.charAt(j)) ok = false
        j += 1
      }
      if (ok) {
        val nxt = i + m
        if (nxt >= html.length) return i // truncated tail: caller's '>' require fires
        val t = html.charAt(nxt)
        if (t == '>' || t == ' ' || t == '\t' || t == '\n' || t == '\r' || t == '/')
          return i
      }
      i += 1
    }
    -1
  }

  def extract(html8: UTF8String): GenericInternalRow = {
    val html = html8.toString
    val n = html.length
    var i = 0
    var anchorDepth = 0
    val sb = new java.lang.StringBuilder // current block's raw text
    var nBlocks = 0L
    var nContent = 0L
    var contentWords = 0L
    val content = new java.lang.StringBuilder

    def unescape(s: String): String =
      s.replace("&lt;", "<").replace("&gt;", ">").replace("&quot;", "\"")
        .replace("&#39;", "'").replace("&amp;", "&")

    // close the current block: count words (anchor attribution was done
    // word-by-word as text accrued via the marker prefix trick below)
    var blockLinkWords = 0L
    def flushBlock(): Unit = {
      val words = unescape(sb.toString).split("\\s+").filter(_.nonEmpty)
      if (words.nonEmpty) {
        nBlocks += 1L
        val w = words.length.toLong
        if (w >= MinContentWords && LinkDenDen * blockLinkWords <= LinkDenNum * w) {
          nContent += 1L
          contentWords += w
          if (content.length > 0) content.append('\n')
          content.append(words.mkString(" "))
        }
      }
      sb.setLength(0)
      blockLinkWords = 0L
    }

    // words are attributed to the anchor side at the SPACE boundaries;
    // simplest exact rule: a word is a link word iff it STARTS inside
    // an <a> element. Track a pending flag per in-progress word.
    var wordOpen = false
    var wordIsLink = false
    def textChar(c: Char): Unit = {
      if (Character.isWhitespace(c)) {
        if (wordOpen && wordIsLink) blockLinkWords += 1L
        wordOpen = false
        wordIsLink = false
        sb.append(' ')
      } else {
        if (!wordOpen) { wordOpen = true; wordIsLink = anchorDepth > 0 }
        sb.append(c)
      }
    }
    def wordBreak(): Unit = {
      if (wordOpen && wordIsLink) blockLinkWords += 1L
      wordOpen = false
      wordIsLink = false
      sb.append(' ')
    }

    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          require(e >= 0, "boilerplate_extract: unclosed HTML comment")
          i = e + 3
        } else {
          val e = html.indexOf('>', i + 1)
          require(e >= 0, "boilerplate_extract: unclosed tag at the page tail")
          val inner = html.substring(i + 1, e)
          val isClose = inner.startsWith("/")
          val body = if (isClose) inner.substring(1) else inner
          val nameEnd0 = body.indexWhere(ch => ch == ' ' || ch == '\t' ||
            ch == '\n' || ch == '\r' || ch == '/')
          val nameEnd = if (nameEnd0 < 0) body.length else nameEnd0
          val name = body.substring(0, nameEnd).toLowerCase
          if (!isClose && SkipTags.contains(name)) {
            val ce = indexOfCloseTag(html, name, e + 1)
            require(ce >= 0,
              s"boilerplate_extract: unclosed <$name> — refusing to eat the page tail")
            val cee = html.indexOf('>', ce)
            require(cee >= 0, s"boilerplate_extract: malformed </$name>")
            i = cee + 1
          } else {
            if (name == "a") {
              wordBreak() // an <a> boundary always ends the current word
              if (isClose) anchorDepth = math.max(0, anchorDepth - 1)
              else anchorDepth += 1
            } else if (BlockTags.contains(name)) {
              wordBreak()
              flushBlock()
            } else {
              // unknown/inline tag: transparent, but still a word break
              // (markup between letters is not intra-word)
              wordBreak()
            }
            i = e + 1
          }
        }
      } else {
        textChar(c)
        i += 1
      }
    }
    wordBreak()
    flushBlock()
    new GenericInternalRow(Array[Any](nBlocks, nContent, contentWords,
      UTF8String.fromString(content.toString)))
  }
}
