package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.sql.Timestamp

import org.apache.spark.sql.Dataset

import graft.kg.Model.WebPage

/** PDF policy source (SURVEY.md S3; reference scripts/pdf_parser.py:199-216:
  * pdf → `pymupdf4llm.to_markdown` → `markdown.markdown` → HTML → the normal
  * pipeline).
  *
  * The binary→markdown step needs a native PDF library that is not present
  * in this container, so it sits behind [[PdfTextExtractor]] with a
  * deterministic fake (the same honesty pattern as Multimodal's stubbed
  * decoder). Everything around it is real and tested: the markdown→HTML
  * renderer, the batched `mapPartitions` extraction, and the WebPage row
  * shape that fuses into the shuffle-free kernel downstream.
  */
object PdfSource {

  /** One PDF document row (the Iceberg-scan stand-in for PDF corpora). */
  final case class PdfDoc(url: String, warc_ts: Timestamp, pdf: Array[Byte], lang: String)

  /** Production slot: a PDFBox / MuPDF binding goes here, constructed once
    * per executor and fed batches inside mapPartitions. */
  trait PdfTextExtractor extends Serializable {
    def toMarkdown(pdf: Array[Byte]): String
  }

  /** Deterministic fake: reads our own container format
    * `"%PDF-GRAFT\n" + markdown`. Clearly a stub — it exists so the Spark
    * plumbing and the renderer below stay real and testable. */
  object FakeExtractor extends PdfTextExtractor {
    val Magic = "%PDF-GRAFT\n"
    def wrap(markdown: String): Array[Byte] = (Magic + markdown).getBytes(UTF_8)
    override def toMarkdown(pdf: Array[Byte]): String = {
      val s = new String(pdf, UTF_8)
      require(s.startsWith(Magic), "not a graft fake PDF")
      s.substring(Magic.length)
    }
  }

  /** Minimal CommonMark-subset renderer (ATX headings, dash/star bullet
    * lists, blank-line paragraphs) covering the surface `markdown.markdown`
    * produces from pymupdf4llm output. */
  def markdownToHtml(md: String): String = {
    val out = new StringBuilder
    var inList = false
    def closeList(): Unit = if (inList) { out ++= "</ul>"; inList = false }
    val para = new StringBuilder
    def flushPara(): Unit = if (para.nonEmpty) {
      closeList()
      out ++= s"<p>${para.toString.trim}</p>"
      para.clear()
    }
    md.linesIterator.foreach { raw =>
      val line = raw.trim
      if (line.isEmpty) flushPara()
      else if (line.startsWith("#")) {
        flushPara(); closeList()
        val level = math.min(6, line.takeWhile(_ == '#').length)
        out ++= s"<h$level>${line.dropWhile(_ == '#').trim}</h$level>"
      } else if (line.startsWith("- ") || line.startsWith("* ")) {
        flushPara()
        if (!inList) { out ++= "<ul>"; inList = true }
        out ++= s"<li>${line.substring(2).trim}</li>"
      } else {
        if (para.nonEmpty) para += ' '
        para ++= line
      }
    }
    flushPara(); closeList()
    out.toString
  }

  /** PDF rows → WebPage rows: one batched narrow map (the extractor is a
    * per-executor singleton; at scale this is the exact plumbing an ONNX or
    * MuPDF session needs). Output fuses with `KgPipeline.triplesFromPages`. */
  def pages(pdfs: Dataset[PdfDoc],
      extractor: PdfTextExtractor = FakeExtractor): Dataset[WebPage] = {
    import pdfs.sparkSession.implicits._
    pdfs.mapPartitions { it =>
      it.map { p =>
        val html = markdownToHtml(extractor.toMarkdown(p.pdf))
        val text = html.replaceAll("<[^>]*>", " ").replaceAll("\\s+", " ").trim
        WebPage(p.url, p.warc_ts, html.getBytes(UTF_8), text, p.lang)
      }
    }
  }
}
