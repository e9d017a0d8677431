package graft.kg

import java.nio.file.{Files, Paths}

import graft.gen.CorpusGen
import graft.text.HtmlSegmenter

/** Dev tool: (re)generate the golden extracted-text fixture (t1 —
  * byte-identical per-url invariant). One TSV line per segment:
  * url <TAB> segId <TAB> segType <TAB> text. Any change to the extraction
  * rules that alters a byte fails GoldenTextSpec until the golden is
  * consciously regenerated and the diff reviewed. */
object GoldenGen {
  val Path = "src/test/resources/golden_texts.tsv"

  def render(nDocs: Int): String = {
    val sb = new StringBuilder
    CorpusGen.corpus(nDocs).foreach { gp =>
      HtmlSegmenter.segment(gp.page.url, new String(gp.page.html, "UTF-8")).foreach { s =>
        sb.append(s.url).append('\t').append(s.segId).append('\t')
          .append(s.segType).append('\t').append(s.text).append('\n')
      }
    }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    Files.createDirectories(Paths.get("src/test/resources"))
    Files.writeString(Paths.get(Path), render(50))
    println(s"wrote $Path")
  }
}
