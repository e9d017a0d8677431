package graft.kg

import graft.text.HtmlSegmenter
import graft.nlp.RuleNlp

/** Dev tool: show segmentation / parses / edges / triples for sample pages.
  * `sbt "runMain graft.kg.Debug"` (optionally pass raw text as args). */
object Debug {
  def show(url: String, html: String): Unit = {
    println(s"===== $url")
    val segs = HtmlSegmenter.segment(url, html)
    segs.foreach(s => println(f"  seg ${s.segId}%2d ${s.segType}%-8s parent=${s.parentId}%2d ${s.text}"))
    val docs = DocKernel.buildDocs(segs.sortBy(_.segId))
    val st = DocKernel.DocState(url, segs.sortBy(_.segId), docs)
    docs.foreach { d =>
      println(s"  -- doc seg=${d.segId}")
      d.parses.foreach { p =>
        println(s"     sent: '${p.text}'")
        (p.start until p.end).foreach { i =>
          val t = p.tokens(i)
          if (t.pos != "SPACE") println(f"       $i%3d ${t.text}%-16s ${t.lemma}%-14s ${t.pos}%-6s ${t.ner}")
        }
        p.chunks.foreach(c => println(s"       chunk [${c.start},${c.end}) head=${c.head} ner=${c.ner}"))
        p.deps.sortBy(d => (d.from, d.to)).foreach(dp => println(s"       dep ${dp.from} -${dp.dep}-> ${dp.to}"))
        if (p.neg.nonEmpty) println(s"       neg: ${p.neg.toVector.sorted}")
      }
    }
    // run the REAL annotator chain (DocKernel.annotate) so this tool can
    // never drift from production ordering; re-parse from segments
    val ann = DocKernel.annotate(url, segs)
    println("  edges:")
    ann.edges.foreach { case (a, b, r) => println(s"    $a -$r-> $b") }
    val triples = GraphBuilder.build(ann, "extended")
    println("  TRIPLES:")
    triples.foreach(t => println(s"    (${t.subj} [${t.subjType}]) -${t.pred}-> (${t.obj} [${t.objType}]) purposes=${t.purposes} text=${t.text.take(1)}"))
  }

  def main(args: Array[String]): Unit = {
    if (args.nonEmpty) {
      // raw text/HTML passed on the command line: show just that.
      // @/path/to/file reads the HTML from a file (sbt eats ';' in args)
      val raw = args.mkString(" ")
      val html =
        if (raw.startsWith("@")) scala.io.Source.fromFile(raw.drop(1), "UTF-8").mkString
        else raw
      show("arg", html)
      return
    }
    show("smoke", """<h1>Privacy Policy</h1>
      <p>We collect email addresses.</p>
      <p>We use the data for analytics purposes.</p>""")
    show("share", """<h1>Privacy Policy</h1>
      <p>We may share your location with advertisers.</p>
      <p>We do not sell personal information to third parties.</p>""")
    show("subsum", """<p>We collect personal information, such as your email address and IP address.</p>""")
    show("list", """<h2>Information We Collect</h2>
      <p>We collect the following information:</p>
      <ul><li>Email address</li><li>Phone number</li><li>Precise location</li></ul>""")
    show("purpose", """<p>We use your email address to send marketing communications.</p>
      <p>Our partners provide us with device identifiers.</p>""")
    show("passive", """<p>Your browsing history may be shared with analytics providers.</p>""")
  }
}
