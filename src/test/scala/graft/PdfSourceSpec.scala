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
