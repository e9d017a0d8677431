package graft.text

import scala.collection.mutable.ArrayBuffer

import graft.kg.Model.Segment

/** HTML → segment-tree extraction (SURVEY.md S4; reference
  * poligrapher/document.py:384-580 works from an accessibility tree — we
  * segment the HTML directly with the same role triage).
  *
  * Produces HEADING / LISTITEM / TEXT segments with heading-stack parenting:
  *   - <h1>-<h6> push/pop a heading stack by level;
  *   - block containers (<p>, <div>, <td>, ...) emit TEXT segments;
  *   - <li> emits a LISTITEM node (no text) whose single TEXT child holds the
  *     item content, parented to the immediately preceding TEXT/HEADING
  *     segment (the list's introduction) — mirroring the reference's segment
  *     shape that the list annotator consumes (list_annotator.py:12-18);
  *   - <script>/<style>/<nav>/<header>/<footer>/... subtrees are dropped
  *     (reference IGNORED_ELEMENTS, document.py:283-381).
  *
  * Pure function per page: called from `mapPartitions`, never a driver loop.
  */
object HtmlSegmenter {

  private val Ignored = Set("script", "style", "nav", "header", "footer",
    "aside", "noscript", "button", "select", "option", "iframe", "svg",
    "form", "input", "img")
  private val HeadingRe = "h([1-6])".r
  private val Block = Set("p", "div", "td", "section", "article", "main",
    "blockquote", "dd", "dt", "figcaption", "caption", "pre")

  private sealed trait Tag
  private final case class Open(name: String) extends Tag
  private final case class Close(name: String) extends Tag
  private final case class Text(s: String) extends Tag

  /** Minimal HTML tokenizer: tags vs text, entity decoding for the common
    * five entities, comments skipped. Tolerates unclosed tags. */
  private def lex(html: String): Vector[Tag] = {
    val out = Vector.newBuilder[Tag]
    var i = 0
    val n = html.length
    val text = new StringBuilder
    def flush(): Unit = if (text.nonEmpty) { out += Text(text.toString); text.clear() }
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i); i = if (e < 0) n else e + 3
        } else {
          val e = html.indexOf('>', i)
          if (e < 0) { i = n }
          else {
            flush()
            val inner = html.substring(i + 1, e).trim
            if (inner.nonEmpty && inner.charAt(0) != '!') {
              val closing = inner.charAt(0) == '/'
              val body = if (closing) inner.substring(1) else inner
              val name = body.takeWhile(ch => ch.isLetterOrDigit).toLowerCase
              if (name.nonEmpty) out += (if (closing) Close(name) else Open(name))
            }
            i = e + 1
          }
        }
      } else {
        text.append(c); i += 1
      }
    }
    flush()
    out.result()
  }

  private def decodeEntities(s: String): String =
    s.replace("&amp;", "&").replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")

  def segment(url: String, html: String): Vector[Segment] = {
    val tags = lex(html)
    val segs = new ArrayBuffer[Segment]

    // heading stack: (level, segId); root context = -1
    var headingStack = List.empty[(Int, Int)]
    var lastBlockSeg = -1 // id of last emitted TEXT/HEADING segment (list intro)
    var ignoreDepth = 0
    var liDepth = 0
    var currentLi = -1 // segId of the open LISTITEM
    val buf = new StringBuilder

    def headingParent: Int = headingStack.headOption.map(_._2).getOrElse(-1)

    def emit(segType: String, parentId: Int, text: String): Int = {
      val id = segs.length
      segs += Segment(url, id, segType, parentId, text)
      id
    }

    def flushText(): Unit = {
      val cleaned = TextClean.clean(decodeEntities(buf.toString))
      buf.clear()
      if (cleaned.nonEmpty) {
        if (currentLi >= 0) {
          emit("TEXT", currentLi, cleaned)
        } else {
          lastBlockSeg = emit("TEXT", headingParent, cleaned)
        }
      }
    }

    tags.foreach {
      case Open(name) if Ignored(name) => ignoreDepth += 1
      case Close(name) if Ignored(name) => if (ignoreDepth > 0) ignoreDepth -= 1
      case _ if ignoreDepth > 0 => // swallow everything inside ignored subtrees
      case Open(HeadingRe(lvl)) =>
        flushText(); buf.clear()
      case Close(HeadingRe(lvl)) =>
        val level = lvl.toInt
        val cleaned = TextClean.clean(decodeEntities(buf.toString))
        buf.clear()
        if (cleaned.nonEmpty) {
          headingStack = headingStack.dropWhile(_._1 >= level)
          val id = emit("HEADING", headingParent, cleaned)
          headingStack = (level, id) :: headingStack
          lastBlockSeg = id
        }
      case Open("li") =>
        flushText()
        val parent = if (lastBlockSeg >= 0) lastBlockSeg else headingParent
        currentLi = emit("LISTITEM", parent, "")
        liDepth += 1
      case Close("li") =>
        flushText()
        currentLi = -1
        if (liDepth > 0) liDepth -= 1
      case Open(b) if Block(b) => flushText()
      case Close(b) if Block(b) => flushText()
      case Open("br") => buf.append(' ')
      case Open(_) | Close(_) => // inline tags: keep accumulating
      case Text(s) => buf.append(s)
    }
    flushText()
    segs.toVector
  }
}
