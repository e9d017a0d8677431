package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.PdfSource
import graft.kg.KgPipeline

/** S3 PDF source: markdown rendering + Spark plumbing are real; the
  * binary→markdown extractor is the documented stub slot. */
class PdfSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  val md =
    """# Privacy Policy
      |
      |We collect your email address.
      |We may share usage data with advertisers.
      |
      |## Information We Collect
      |
      |We collect the following information:
      |
      |- Phone number
      |- Precise location
      |""".stripMargin

  test("markdown renders to the segmenter's HTML surface") {
    val html = PdfSource.markdownToHtml(md)
    assert(html.contains("<h1>Privacy Policy</h1>"))
    assert(html.contains("<h2>Information We Collect</h2>"))
    assert(html.contains("<ul><li>Phone number</li><li>Precise location</li></ul>"))
    assert(html.contains("<p>We collect your email address. We may share usage data with advertisers.</p>"))
  }

  /** Builds a structurally real PDF: header, catalog/pages/page objects, a
    * FlateDecode content stream with BT/Td/Tj/ET text operators, trailer.
    * Deterministic, so the fixture is reviewable instead of opaque bytes. */
  def buildPdf(paragraphs: Seq[String], compress: Boolean): Array[Byte] = {
    def esc(t: String) = t.replace("\\", "\\\\").replace("(", "\\(").replace(")", "\\)")
    val content = paragraphs.map { p =>
      s"BT /F1 12 Tf 72 720 Td (${esc(p)}) Tj ET"
    }.mkString("\n")
    val raw = content.getBytes("ISO-8859-1")
    val data = if (!compress) raw else {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      while (!d.finished()) buf.write(chunk, 0, d.deflate(chunk))
      d.end()
      buf.toByteArray
    }
    val filter = if (compress) " /Filter /FlateDecode" else ""
    val head =
      s"""%PDF-1.4
         |1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj
         |2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj
         |3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj
         |4 0 obj << /Length ${data.length}$filter >> stream
         |""".stripMargin.getBytes("ISO-8859-1")
    val tail = "\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF\n".getBytes("ISO-8859-1")
    head ++ data ++ tail
  }

  test("real PDF extraction: FlateDecode content streams decode to the same triples as HTML") {
    import spark.implicits._
    val ts = new Timestamp(1700000000000L)
    val paras = Seq(
      "We collect your email address.",
      "We may share usage data with advertisers.")
    for (compress <- Seq(true, false)) {
      val pdfBytes = buildPdf(paras, compress)
      val pdfs = Seq(PdfSource.PdfDoc("https://pdf.example/real", ts, pdfBytes, "en")).toDS()
      val viaPdf = KgPipeline.triplesFromPages(
          PdfSource.pages(pdfs, PdfSource.PdfTextParser))
        .collect().map(t => (t.subj, t.pred, t.obj)).toSet
      val html = "<p>We collect your email address.</p>" +
        "<p>We may share usage data with advertisers.</p>"
      val viaHtml = graft.kg.DocKernel.process("t",
        graft.text.HtmlSegmenter.segment("t", html))
        .map(t => (t.subj, t.pred, t.obj)).toSet
      assert(viaPdf.nonEmpty)
      assert(viaPdf == viaHtml, s"compress=$compress")
    }
  }

  /** Two pages = two /Length content streams. Guards the `stream`-keyword
    * scan against matching the substring inside `endstream` (which made the
    * parser inherit page 1's /Length and silently drop every later page). */
  def buildTwoPagePdf(page1: String, page2: String, compress: Boolean): Array[Byte] = {
    def enc(t: String): Array[Byte] = {
      val raw = s"BT /F1 12 Tf 72 720 Td ($t) Tj ET".getBytes("ISO-8859-1")
      if (!compress) raw else {
        val d = new java.util.zip.Deflater()
        d.setInput(raw); d.finish()
        val buf = new java.io.ByteArrayOutputStream()
        val chunk = new Array[Byte](8192)
        while (!d.finished()) buf.write(chunk, 0, d.deflate(chunk))
        d.end()
        buf.toByteArray
      }
    }
    val (d1, d2) = (enc(page1), enc(page2))
    val filter = if (compress) " /Filter /FlateDecode" else ""
    val b = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = b.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w(s"4 0 obj << /Length ${d1.length}$filter >> stream\n")
    b.write(d1)
    w("\nendstream endobj\n")
    w("5 0 obj << /Type /Page /Parent 2 0 R /Contents 6 0 R >> endobj\n")
    w(s"6 0 obj << /Length ${d2.length}$filter >> stream\n")
    b.write(d2)
    w("\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF\n")
    b.toByteArray
  }

  test("multi-stream PDFs: every page's content stream extracts, not just the first") {
    for (compress <- Seq(true, false)) {
      val pdf = buildTwoPagePdf(
        "We collect your email address.",
        "We may share usage data with advertisers.", compress)
      val md2 = PdfSource.PdfTextParser.toMarkdown(pdf)
      assert(md2.contains("We collect your email address."), s"compress=$compress")
      assert(md2.contains("We may share usage data with advertisers."),
        s"page 2 dropped (compress=$compress):\n$md2")
    }
  }

  /** CID-keyed (Identity-H-style) PDF: text shown as 2-byte-CID hex strings,
    * decoded through a /ToUnicode CMap with bfchar + bfrange sections. */
  def buildCidPdf(paragraphs: Seq[String]): Array[Byte] = {
    val chars = paragraphs.flatMap(_.toSeq).distinct
    // exercise BOTH CMap section kinds: the first 5 chars go through a
    // contiguous bfrange, the rest through bfchar entries
    val (rangeChars, charChars) = chars.splitAt(5)
    val cidOf = (rangeChars ++ charChars).zipWithIndex.map { case (c, k) => c -> (k + 1) }.toMap
    def hexStr(t: String) = "<" + t.map(c => f"${cidOf(c)}%04X").mkString + ">"
    val content = paragraphs.map(p => s"BT /F1 12 Tf 72 720 Td ${hexStr(p)} Tj ET")
      .mkString("\n")
    // bfrange maps CIDs 1..5 to an arbitrary-per-CID list form
    val rangeDsts = rangeChars.map(c => f"<${c.toInt}%04X>").mkString(" ")
    val bfchars = charChars.map(c => f"<${cidOf(c)}%04X> <${c.toInt}%04X>").mkString("\n")
    val cmap =
      s"""/CIDInit /ProcSet findresource begin
         |begincmap
         |1 beginbfrange
         |<0001> <0005> [ $rangeDsts ]
         |endbfrange
         |${charChars.size} beginbfchar
         |$bfchars
         |endbfchar
         |endcmap""".stripMargin
    val b = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = b.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w(s"5 0 obj << /Length ${cmap.length} >> stream\n")
    w(cmap)
    w("\nendstream endobj\n")
    w(s"4 0 obj << /Length ${content.length} >> stream\n")
    w(content)
    w("\nendstream endobj\ntrailer << /Root 1 0 R >>\n%%EOF\n")
    b.toByteArray
  }

  test("CID-keyed PDFs decode through the ToUnicode CMap to the same triples") {
    val paras = Seq(
      "We collect your email address.",
      "We may share usage data with advertisers.")
    val md2 = PdfSource.PdfTextParser.toMarkdown(buildCidPdf(paras))
    assert(md2.contains("We collect your email address."), md2)
    assert(md2.contains("We may share usage data with advertisers."), md2)
    import spark.implicits._
    val ts = new Timestamp(1700000000000L)
    val pdfs = Seq(PdfSource.PdfDoc("https://pdf.example/cid", ts,
      buildCidPdf(paras), "en")).toDS()
    val viaPdf = KgPipeline.triplesFromPages(
        PdfSource.pages(pdfs, PdfSource.PdfTextParser))
      .collect().map(t => (t.subj, t.pred, t.obj)).toSet
    val html = "<p>We collect your email address.</p>" +
      "<p>We may share usage data with advertisers.</p>"
    val viaHtml = graft.kg.DocKernel.process("t",
      graft.text.HtmlSegmenter.segment("t", html))
      .map(t => (t.subj, t.pred, t.obj)).toSet
    assert(viaPdf == viaHtml)
  }

  test("PDF text operators: escapes, TJ arrays, octal, line moves") {
    val content = "BT (Your \\(personal\\) data) Tj 0 -14 Td " +
      "[(We store) ( your ) (\\160urchase history.)] TJ ET"
    val pdf = ("%PDF-1.4\n1 0 obj << /Length " + content.length +
      " >> stream\n" + content + "\nendstream endobj\n%%EOF").getBytes("ISO-8859-1")
    val md2 = PdfSource.PdfTextParser.toMarkdown(pdf)
    assert(md2.contains("Your (personal) data"))
    assert(md2.contains("We store your purchase history."))
  }

  test("multi-font CMaps stay per-font; unmapped hex strings fall back to single-byte") {
    // round-4 ADVICE low: CMaps used to merge into one document-global
    // table (later fonts overwrote colliding CIDs) and ANY CMap forced
    // 2-byte decoding of EVERY hex string. Two fonts with disjoint CID
    // ranges plus one plain latin-1 hex string must all decode.
    def cmapFor(pairs: Seq[(Int, Char)]): String =
      s"""/CIDInit /ProcSet findresource begin
         |begincmap
         |${pairs.size} beginbfchar
         |${pairs.map { case (cid, c) => f"<$cid%04X> <${c.toInt}%04X>" }.mkString("\n")}
         |endbfchar
         |endcmap""".stripMargin
    val textA = "We collect your email address."
    val textB = "Advertisers receive usage data."
    val cidA = textA.toSeq.distinct.zipWithIndex.map { case (c, k) => c -> (k + 1) }.toMap
    val cidB = textB.toSeq.distinct.zipWithIndex.map { case (c, k) => c -> (k + 101) }.toMap
    val cmapA = cmapFor(cidA.toSeq.map(_.swap).sortBy(_._1))
    val cmapB = cmapFor(cidB.toSeq.map(_.swap).sortBy(_._1))
    def hexA(t: String) = "<" + t.map(c => f"${cidA(c)}%04X").mkString + ">"
    def hexB(t: String) = "<" + t.map(c => f"${cidB(c)}%04X").mkString + ">"
    val plain = "Plain hex line."
    val hexPlain = "<" + plain.map(c => f"${c.toInt}%02X").mkString + ">"
    val content =
      s"BT /F1 12 Tf 72 720 Td ${hexA(textA)} Tj ET\n" +
        s"BT /F2 12 Tf 72 700 Td ${hexB(textB)} Tj ET\n" +
        s"BT /F3 12 Tf 72 680 Td $hexPlain Tj ET"
    val b = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = b.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.4\n1 0 obj << /Type /Catalog >> endobj\n")
    w(s"5 0 obj << /Length ${cmapA.length} >> stream\n"); w(cmapA); w("\nendstream endobj\n")
    w(s"6 0 obj << /Length ${cmapB.length} >> stream\n"); w(cmapB); w("\nendstream endobj\n")
    w(s"4 0 obj << /Length ${content.length} >> stream\n"); w(content)
    w("\nendstream endobj\n%%EOF\n")
    val md = PdfSource.PdfTextParser.toMarkdown(b.toByteArray)
    assert(md.contains(textA), md)
    assert(md.contains(textB), md)
    assert(md.contains(plain), md)
  }

  test("PDF rows flow through the normal pipeline and match the HTML path") {
    import spark.implicits._
    val ts = new Timestamp(1700000000000L)
    val pdfs = Seq(PdfSource.PdfDoc("https://pdf.example/privacy", ts,
      PdfSource.FakeExtractor.wrap(md), "en")).toDS()
    val viaPdf = KgPipeline.triplesFromPages(PdfSource.pages(pdfs))
      .collect().map(t => (t.subj, t.pred, t.obj)).toSet
    assert(viaPdf == Set(
      ("we", "COLLECT", "email address"),
      ("we", "COLLECT", "usage information"),
      ("advertiser", "BE_SHARED", "usage information"),
      ("we", "COLLECT", "phone number"),
      ("we", "COLLECT", "precise geolocation")))
    // plan: extraction stays a narrow map (fuses with the kernel)
    val plan = KgPipeline.triplesFromPages(PdfSource.pages(pdfs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"PDF path shuffles:\n$plan")
  }
}
